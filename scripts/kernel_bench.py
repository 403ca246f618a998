"""Fused-block kernel A/B on the real chip (VERDICT r2 item 2; BASELINE
north star). Measures, at the production geometries, per-call DEVICE ms and
TF/s of

- XLA `conv_general_dilated` pair (the fallback path, NDHWC),
- v1 fused kernel: (D, H, C, W) im2col + per-h-block col copies (attic'd
  comparison, level-0 shapes only),
- v2 fused kernel: (D, C, H, W) zero-copy tap GEMMs (the production path),
- v3 deep-level experiment: channels-on-lanes NDHWC (attic; measured
  non-win at levels >=2 — see kernels/attic/conv_v3_deep.py),

each as the bare conv+stats primitive (one conv of a block). Protocol:
``utils/latency.py::scanned_ms`` — a device-resident lax.scan chain, because
chained host dispatch floors at ~1 ms/call through the tunnel and inflated
sub-ms kernels 3-4x in the round-2 artifact (the v1/v2 step->step pad making
the chain shape-preserving adds a small constant, so fused rows are slight
UNDERestimates of the win). Writes KERNEL_BENCH.json at the repo root. Run
on the TPU host:

    python scripts/kernel_bench.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from runet_tpu.utils.health import probe_backend  # noqa: E402

_ok, _detail = probe_backend(tries=2)
if not _ok:
    sys.exit(f"TPU backend unreachable ({_detail}); not starting")

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from runet_tpu.kernels.fused_block import (  # noqa: E402
    _conv3x3_dchw_impl,
    _conv3x3_dchw_m_impl,
    _conv3x3_dhcw_impl,
    conv3x3_dchw_dw,
)
from runet_tpu.utils.latency import scanned_ms  # noqa: E402


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


def _time(step, x0, fl, iters=30):
    ms = scanned_ms(step, x0, iters=iters)
    return round(ms, 3), round(fl / (ms / 1e3) / 1e12, 1)


def bench_geometry(name, D, H, W, C, Cout, dtype=jnp.bfloat16, iters=30,
                   v3=False):
    assert C == Cout, "scan protocol feeds y back as x"
    rng = np.random.default_rng(0)
    fl = conv_flops(D, H, W, C, Cout)
    row = {"name": name, "D": D, "H": H, "W": W, "C": C, "Cout": Cout,
           "gflop": round(fl / 1e9, 1)}
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Cout)) * 0.05, dtype)

    x = jnp.asarray(rng.normal(size=(D, H, W, C)), dtype)

    def xla_step(xx):
        y, s, q = xla_conv_stats(xx[None], w)
        return y[0] + (s * 0 + q * 0).astype(y.dtype)[None, None, :]

    row["xla_ms"], row["xla_tflops"] = _time(xla_step, x, fl, iters)

    if W % 128 == 0 and C % 16 == 0:
        xp1 = jnp.asarray(rng.normal(size=(D + 2, H + 2, C, W)), dtype)

        def v1_step(xx):
            y, s, q = _conv3x3_dhcw_impl(xx, w)
            y = y + (s * 0 + q * 0).astype(y.dtype)[None, None, :, None]
            return jnp.pad(y, ((1, 1), (1, 1), (0, 0), (0, 0)))

        try:
            row["v1_ms"], row["v1_tflops"] = _time(v1_step, xp1, fl, iters)
        except Exception as e:  # infeasible tiling etc.
            row["v1_error"] = str(e)[:120]
    if W % 64 == 0 and C % 16 == 0:
        xp2 = jnp.asarray(rng.normal(size=(D + 2, C, H + 2, W)), dtype)

        def v2_step(xx):
            y, s, q = _conv3x3_dchw_impl(xx, w)
            y = y + (s * 0 + q * 0).astype(y.dtype)[None, :, None, None]
            return jnp.pad(y, ((1, 1), (0, 0), (1, 1), (0, 0)))

        try:
            row["v2_ms"], row["v2_tflops"] = _time(v2_step, xp2, fl, iters)
        except Exception as e:
            row["v2_error"] = str(e)[:120]

        # v2m: M-packed tap GEMMs (kw taps stacked into M; 3x the PE
        # occupancy at level 0 — kernels/fused_block.py v2m section).
        def v2m_step(xx):
            y, s, q = _conv3x3_dchw_m_impl(xx, w)
            y = y + (s * 0 + q * 0).astype(y.dtype)[None, :, None, None]
            return jnp.pad(y, ((1, 1), (0, 0), (1, 1), (0, 0)))

        try:
            row["v2m_ms"], row["v2m_tflops"] = _time(v2m_step, xp2, fl, iters)
        except Exception as e:
            row["v2m_error"] = str(e)[:120]
    if v3:
        from runet_tpu.kernels.attic.conv_v3_deep import conv3x3_v3

        def v3_step(xx):
            y, s, q = conv3x3_v3(xx, w)
            return y + (s * 0 + q * 0).astype(y.dtype)[None, None, :]

        try:
            row["v3_ms"], row["v3_tflops"] = _time(v3_step, x, fl, iters)
        except Exception as e:
            row["v3_error"] = str(e)[:120]
    print(row, flush=True)
    return row


def bench_dw(name, D, H, W, C, Cout, dtype=jnp.bfloat16, iters=30):
    """conv-bwd-weights: XLA's correlation vs the Pallas tap-contraction."""
    rng = np.random.default_rng(1)
    fl = conv_flops(D, H, W, C, Cout)
    row = {"name": name, "D": D, "H": H, "W": W, "C": C, "Cout": Cout,
           "gflop": round(fl / 1e9, 1), "kind": "dw"}
    xp = jnp.asarray(rng.normal(size=(D + 2, C, H + 2, W)), dtype)

    def pallas_dw_step(xx):
        g = xx[1:-1, :Cout, 1:-1, :]
        dw = conv3x3_dchw_dw(xx, g)
        return xx + jnp.sum(dw).astype(xx.dtype) * 0

    row["pallas_ms"], row["pallas_tflops"] = _time(pallas_dw_step, xp, fl, iters)

    x_n = jnp.asarray(rng.normal(size=(1, D, H, W, C)), dtype)

    def xla_dw_step(xx):
        g = xx[:, :, :, :, :Cout]
        _, vjp_fn = jax.vjp(
            lambda wv: jax.lax.conv_general_dilated(
                xx, wv, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
            jnp.zeros((3, 3, 3, C, Cout), dtype))
        (dw,) = vjp_fn(g)
        return xx + jnp.sum(dw).astype(xx.dtype) * 0

    row["xla_ms"], row["xla_tflops"] = _time(xla_dw_step, x_n, fl, iters)
    print(row, flush=True)
    return row


def _scanned_op(op, x0, iters: int = 20):
    """scanned_ms for an op whose output shape differs from its input:
    carry x0, fold a zero-scaled token of the output back into the carry
    (keeps the op live and data-dependent across iterations — the
    established scanned_ms idiom).

    Fallback: ops that force an exotic operand layout (the f32 head einsum)
    can make XLA copy the while-carry into a 128×-padded tiling — 16 GB of
    HLO temp, a compile-time OOM. Retry with an optimization_barrier pinning
    the carry; measured +~1 ms of barrier copy, noted as an overestimate."""

    def step(x):
        y = op(x)
        tok = (y.ravel()[0] * 0).astype(x.dtype)
        return x + tok

    def step_barrier(x):
        y = op(x)
        tok = (y.ravel()[0] * 0).astype(x.dtype)
        return jax.lax.optimization_barrier(x + tok)

    try:
        return scanned_ms(step, x0, iters=iters), ""
    except Exception:
        return (
            scanned_ms(step_barrier, x0, iters=iters),
            "barrier-carry (scan layout OOM fallback; slight overestimate)",
        )


def bench_budget() -> dict:
    """Per-op forward/backward budget of the fine 128³ production forward
    (VERDICT r4 missing #2: fused rows explained only ~13-14 ms of the
    37.4 ms forward — the stride-2 downsamples, pixelshuffle projections,
    concat convs, and head had no measured rows).

    Geometries follow models/unet3d.py at the fine_kits preset (5 levels,
    features 32/64/128/256/320, B=1, 128³ patch, DCHW layout). Each row
    times the op as PRODUCTION executes it: NDCHW XLA convs for stride-2 /
    W%64-gated shapes, the v2m fused conv+stats primitive where
    fused_block_applicable says the model would fuse. bwd rows time
    jax.grad wrt (x, w) of the segment."""
    from runet_tpu.kernels.fused_block import (
        conv_in_stats_dchw_batch,
        fused_block_applicable,
    )
    from runet_tpu.models.unet3d import depth_to_space_dchw

    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    def conv_dchw(x, w, strides):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding="SAME",
            dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
        )

    rows = []

    def add_conv_row(name, D, C, HW, Cout, strides, fused_eligible):
        x = mk((1, D, C, HW, HW))
        w = mk((3, 3, 3, C, Cout))
        out_vox = (D // strides[0]) * (HW // strides[1]) * (HW // strides[2])
        gflop = 2 * 27 * C * Cout * out_vox / 1e9
        row = {"name": name, "shape": [D, C, HW, HW], "Cout": Cout,
               "stride": strides[0], "gflop": round(gflop, 1)}
        xla_ms, note = _scanned_op(lambda xx: conv_dchw(xx, w, strides), x)
        row["xla_ms"] = round(xla_ms, 3)
        row["xla_tflops"] = round(gflop / xla_ms, 1)
        if note:
            row["xla_note"] = note
        prod = "xla"
        if fused_eligible and strides == (1, 1, 1):
            # the gate the model itself consults (NDHWC-equivalent shape)
            if fused_block_applicable((1, D, HW, HW, C), Cout, "v2m"):
                f_ms, fnote = _scanned_op(
                    lambda xx: conv_in_stats_dchw_batch(xx, w, version="v2m")[0],
                    x,
                )
                row["v2m_ms"] = round(f_ms, 3)
                row["v2m_tflops"] = round(gflop / f_ms, 1)
                if fnote:
                    row["v2m_note"] = fnote
                prod = "v2m"
        row["prod"] = prod
        row["prod_ms"] = row[f"{prod}_ms"]

        # backward (dx + dw together, as the production grad computes them)
        def seg_loss(xx, ww):
            return conv_dchw(xx, ww, strides).astype(jnp.float32).sum()

        g = jax.grad(seg_loss, argnums=(0, 1))

        def bwd_step(xx):
            gx, gw = g(xx, w)
            tok = (gx.ravel()[0] * 0 + gw.ravel()[0] * 0).astype(xx.dtype)
            return xx + tok

        try:
            row["xla_bwd_ms"] = round(scanned_ms(bwd_step, x, iters=10), 3)
        except Exception as e:
            row["xla_bwd_error"] = str(e)[:120]
        rows.append(row)
        print(f"budget row {name}: {row}", file=sys.stderr, flush=True)

    # encoder entry + stride-2 downsample ladder
    add_conv_row("enc0_in", 128, 1, 128, 32, (1, 1, 1), True)
    add_conv_row("down_l1", 128, 32, 128, 64, (2, 2, 2), False)
    add_conv_row("down_l2", 64, 64, 64, 128, (2, 2, 2), False)
    add_conv_row("down_l3", 32, 128, 32, 256, (2, 2, 2), False)
    add_conv_row("down_l4", 16, 256, 16, 320, (2, 2, 2), False)
    # bottleneck second conv
    add_conv_row("bot_l4", 8, 320, 8, 320, (1, 1, 1), True)
    # decoder post-concat convs (2F -> F)
    add_conv_row("cat_l0", 128, 64, 128, 32, (1, 1, 1), True)
    add_conv_row("cat_l1", 64, 128, 64, 64, (1, 1, 1), True)
    add_conv_row("cat_l2", 32, 256, 32, 128, (1, 1, 1), True)
    add_conv_row("cat_l3", 16, 512, 16, 256, (1, 1, 1), True)

    # pixelshuffle projection GEMM + depth_to_space per decoder level
    def add_proj_row(name, D, C, HW, F):
        x = mk((1, D, C, HW, HW))
        k = mk((C, 8 * F))
        gflop = 2 * C * 8 * F * D * HW * HW / 1e9

        def op(xx):
            y = jnp.einsum("bdchw,cf->bdfhw", xx, k)
            return depth_to_space_dchw(y, 2)

        ms, note = _scanned_op(op, x)
        row = {"name": name, "shape": [D, C, HW, HW], "F": F,
               "gflop": round(gflop, 1), "xla_ms": round(ms, 3),
               "xla_tflops": round(gflop / ms, 1), "prod": "xla",
               "prod_ms": round(ms, 3)}
        if note:
            row["xla_note"] = note
        rows.append(row)
        print(f"budget row {name}: {row}", file=sys.stderr, flush=True)

    add_proj_row("proj_d3", 8, 320, 8, 256)
    add_proj_row("proj_d2", 16, 256, 16, 128)
    add_proj_row("proj_d1", 32, 128, 32, 64)
    add_proj_row("proj_d0", 64, 64, 64, 32)

    # logits head: f32 flat GEMM + bias (models/unet3d.py::_Head)
    xh = mk((1, 128, 32, 128, 128))
    kh = mk((32, 3), jnp.float32)
    gflop_h = 2 * 32 * 3 * 128 ** 3 / 1e9
    ms_h, note_h = _scanned_op(
        lambda xx: jnp.einsum("bdchw,ck->bdhwk", xx.astype(jnp.float32), kh),
        xh,
    )
    row = {"name": "head", "shape": [128, 32, 128, 128], "Cout": 3,
           "gflop": round(gflop_h, 1), "xla_ms": round(ms_h, 3),
           "xla_tflops": round(gflop_h / ms_h, 1), "prod": "xla",
           "prod_ms": round(ms_h, 3)}
    if note_h:
        row["xla_note"] = note_h
    rows.append(row)
    print(f"budget row head: {row}", file=sys.stderr, flush=True)
    return {"rows": rows}


def bench_model_fwd(iters: int = 20) -> dict:
    """Full fine-model forward at 128³, fused Pallas blocks ON vs OFF.

    Feeds `infer/cascade.py::_xla_over_fused()` — the per-voxel padding
    tiebreaker in `_bucket_up` — so the bucket cost model tracks the kernel
    class automatically instead of going stale on a baked constant
    (VERDICT r4 weak #5). Host-loop timing: at ~40 ms/call the ~1 ms
    dispatch floor is noise."""
    import dataclasses
    import time

    from runet_tpu.config import get_config
    from runet_tpu.models.unet3d import create_model, init_params

    from runet_tpu.utils.latency import chained_ms

    cfg = get_config("fine_kits")
    res = {}
    for fused, key in ((True, "fused_ms"), (False, "xla_ms")):
        mcfg = dataclasses.replace(cfg.model, fused_blocks=fused)
        model = create_model(mcfg)
        params = init_params(model, jax.random.key(0), (128, 128, 128))
        fwd = jax.jit(lambda p, x, m=model: m.apply({"params": p}, x))
        x = jnp.zeros((1, 128, 128, 128, mcfg.in_channels), jnp.bfloat16)
        # chained protocol: per-call sync through the tunnel adds a ~20 ms
        # RTT per iteration (the first version of this measured 60 ms for a
        # 37 ms forward); chained_ms amortizes the RTT across the chain.
        res[key] = round(chained_ms(fwd, (params, x), n=iters), 2)
    res["xla_over_fused"] = round(res["xla_ms"] / res["fused_ms"], 3)
    res["geometry"] = [128, 128, 128]
    return res


def main():
    dev = jax.devices()[0]
    rows = [
        # level-0 second conv at the fine 128³ patch (the hot shape)
        bench_geometry("fine_l0", 128, 128, 128, 32, 32),
        # level-1 at the 128³ patch: W=64 — v2's half-vreg gate
        bench_geometry("fine_l1", 64, 64, 64, 64, 64),
        # levels >=2: C>=128 fills the MXU contraction dim — XLA adequate,
        # v3 experiment documented in kernels/attic/conv_v3_deep.py
        bench_geometry("fine_l2", 32, 32, 32, 128, 128, v3=True),
        bench_geometry("fine_l3", 16, 16, 16, 256, 256, v3=True),
        # level-0 decoder at a big ROI bucket shape
        bench_geometry("roi_l0", 160, 192, 256, 32, 32, iters=10),
        # bwd-weights at the hot shapes (the delta that flipped the fused
        # train step from losing to winning, round 3)
        bench_dw("dw_l0", 128, 128, 128, 32, 32),
        bench_dw("dw_l1", 64, 64, 64, 64, 64),
    ]
    out = {"device": str(dev), "rows": rows,
           "model_fwd": bench_model_fwd(),
           "budget": bench_budget(),
           "v2m_decision": (
               "v2m (M-packed kw taps + double-buffered slab DMA) is the "
               "DEFAULT since 2026-08-20. The M-packing alone was a tie — "
               "the kernel is memory-path-bound (no-dot variant: 2.69 of "
               "3.44 ms at level 0; GEMMs add ~0.75 ms) — but double "
               "buffering the single slab (affordable only in v2m; v2 "
               "needs three shifted slabs) dropped the level-0 kernel "
               "3.6 -> 1.80 ms (64.5 TF/s token-carry protocol vs v2 "
               "3.35 ms / 34.6). Full-model A/B: fwd 128^3 42.4 (v2m) vs "
               "45.6 (v2) ms, ROI 151.6 vs 166.1, train step 174.8 vs "
               "180.9. NOTE the scan rows below carry ~1.7 ms/iter of "
               "shape-preserving re-pad glue (measured via a pad-only "
               "chain), so fused-row TF/s are UNDERestimates; the glue is "
               "kept for protocol comparability across rounds."
           ),
           "protocol": ("scanned_ms: device-resident lax.scan chain, 30 "
                        "iters, min of 3; bf16. Host-dispatch chains "
                        "(chained_ms) floor at ~1 ms/call and OVERSTATE "
                        "sub-ms rows 3-4x — do not compare against round-2 "
                        "artifacts. v1/v2/dw rows include a per-iter re-pad "
                        "to keep the scan shape-preserving (slight "
                        "underestimate of the fused win).")}
    Path(__file__).resolve().parent.parent.joinpath("KERNEL_BENCH.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print("wrote KERNEL_BENCH.json")


if __name__ == "__main__":
    main()
