"""Fused-block kernel A/B on the real chip (VERDICT r2 item 2; BASELINE
north star). Measures, at the production geometries, per-call ms and TF/s of

- XLA `conv_general_dilated` pair (the fallback path, NDHWC),
- v1 fused kernel: (D, H, C, W) im2col + per-h-block col copies,
- v2 fused kernel: (D, C, H, W) zero-copy tap GEMMs,

each as the bare conv+stats primitive (one conv of a block). Writes
KERNEL_BENCH.json at the repo root. Run on the TPU host:

    python scripts/kernel_bench.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from runet_tpu.kernels.fused_block import (  # noqa: E402
    _conv3x3_dchw_impl,
    _conv3x3_dhcw_impl,
)
from runet_tpu.utils.latency import chained_ms  # noqa: E402


def conv_flops(D, H, W, C, Cout):
    return 2 * 27 * C * Cout * D * H * W


@jax.jit
def xla_conv_stats(x, w):
    """XLA oracle in NDHWC at the same math: conv + Σy + Σy²."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2, 3)), jnp.sum(yf * yf, axis=(0, 1, 2, 3))


def bench_geometry(name, D, H, W, C, Cout, dtype=jnp.bfloat16, n=20):
    rng = np.random.default_rng(0)
    fl = conv_flops(D, H, W, C, Cout)
    row = {"name": name, "D": D, "H": H, "W": W, "C": C, "Cout": Cout,
           "gflop": round(fl / 1e9, 1)}

    x_ndhwc = jnp.asarray(rng.normal(size=(1, D, H, W, C)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Cout)) * 0.1, dtype)
    ms = chained_ms(xla_conv_stats, (x_ndhwc, w), n=n)
    row["xla_ms"] = round(ms, 2)
    row["xla_tflops"] = round(fl / (ms / 1e3) / 1e12, 1)

    if W % 128 == 0 and C % 16 == 0 and Cout % 16 == 0:
        xp1 = jnp.asarray(rng.normal(size=(D + 2, H + 2, C, W)), dtype)
        try:
            ms = chained_ms(lambda a, b: _conv3x3_dhcw_impl(a, b), (xp1, w), n=n)
            row["v1_ms"] = round(ms, 2)
            row["v1_tflops"] = round(fl / (ms / 1e3) / 1e12, 1)
        except Exception as e:  # infeasible tiling etc.
            row["v1_error"] = str(e)[:120]
        xp2 = jnp.asarray(rng.normal(size=(D + 2, C, H + 2, W)), dtype)
        try:
            ms = chained_ms(lambda a, b: _conv3x3_dchw_impl(a, b), (xp2, w), n=n)
            row["v2_ms"] = round(ms, 2)
            row["v2_tflops"] = round(fl / (ms / 1e3) / 1e12, 1)
        except Exception as e:
            row["v2_error"] = str(e)[:120]
    print(row, flush=True)
    return row


def main():
    dev = jax.devices()[0]
    rows = [
        # level-0 second conv at the fine 128³ patch (the hot shape)
        bench_geometry("fine_l0", 128, 128, 128, 32, 32),
        # coarse level-0 at the canonical grid (24-feature coarse net → C=24)
        bench_geometry("coarse_l0", 128, 128, 128, 32, 32, n=10),
        # level-1 at the 128³ patch: W=64 — covered by v2 since the W%64
        # half-vreg gate (2.29 vs 3.05 ms XLA, KERNEL_BENCH.json).
        bench_geometry("fine_l1", 64, 64, 64, 64, 64),
        # level-0 decoder at a big ROI bucket shape
        bench_geometry("roi_l0", 160, 192, 256, 32, 32, n=10),
    ]
    out = {"device": str(dev), "rows": rows,
           "protocol": "chained_ms n=10-20 (one sync per chain), bf16"}
    Path(__file__).resolve().parent.parent.joinpath("KERNEL_BENCH.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print("wrote KERNEL_BENCH.json")


if __name__ == "__main__":
    main()
