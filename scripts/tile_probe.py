"""Empirical per-geometry probe of larger v2m tile configs (VERDICT r4
item 8).

Mosaic's scoped-vmem accounting rejects some (TD, TH) tile configs at some
block geometries with no predictive model (kernels/fused_block.py
``_pick_tiles_v2m`` history: C=Cout=64 blew the 16 MB limit by 2 MB while
other geometries compiled fine). Instead of modeling it, this script
compile-probes each candidate at each PRODUCTION block geometry, measures
the kernel delta vs the default tiles where the compile succeeds, and
writes TILE_PROBE.json. Candidates that measure a real win can be promoted
into ``fused_block.TILE_OVERRIDES`` as a committed table.

Run on the TPU host:   python scripts/tile_probe.py
"""

import json
import sys
import time
from functools import partial
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

from runet_tpu.kernels import fused_block as fb  # noqa: E402
from runet_tpu.utils.latency import scanned_ms  # noqa: E402

# Production block geometries (D, H, W, C, Cout) at the fine 128³ patch and
# the modal ROI bucket (see KERNEL_BENCH.json rows + budget rows).
GEOMETRIES = [
    ("fine_l0", 128, 128, 128, 32, 32),
    ("fine_l0_cat", 128, 128, 128, 64, 32),   # decoder concat conv
    ("fine_l1", 64, 64, 64, 64, 64),
    ("fine_l1_cat", 64, 64, 64, 128, 64),
    ("roi_l0", 160, 192, 256, 32, 32),
]

# Larger-tile candidates (TD, TH); RH picked by the (RH·W)%128 rule.
CANDIDATES = [(8, 32), (8, 16), (4, 32)]


def _rh_for(TH, W):
    for RH in (min(8, TH), 4, 2, 1):
        if RH <= TH and TH % RH == 0 and (RH * W) % 128 == 0:
            return RH
    return None


def kernel_ms(D, H, W, C, Cout, iters=20):
    """scanned v2m kernel time at the CURRENT override table."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Cout)) * 0.05, jnp.bfloat16)
    xp = jnp.asarray(rng.normal(size=(D + 2, C, H + 2, W)), jnp.bfloat16)

    def step(xx):
        y, s, q = fb._conv3x3_dchw_m_impl(xx, w)
        y = y + (s * 0 + q * 0).astype(y.dtype)[None, :, None, None]
        y = jnp.pad(y, ((1, 1), (0, 0), (1, 1), (0, 0)))
        if Cout != C:  # keep the scan shape-preserving for non-square rows
            reps = -(-C // Cout)
            y = jnp.concatenate([y] * reps, axis=1)[:, :C]
        return y

    return scanned_ms(step, xp, iters=iters)


def main():
    out = {"device": str(jax.devices()[0]), "rows": [],
           "protocol": ("per-geometry: default-tile scanned kernel ms, then "
                        "each candidate (TD,TH) compile-probed (override "
                        "installed, impl jit cache cleared); compile "
                        "failures recorded verbatim — that opacity is WHY "
                        "this is empirical (VERDICT r4 item 8)")}
    for name, D, H, W, C, Cout in GEOMETRIES:
        key = (D, H, C, Cout, W, 2)
        fb.TILE_OVERRIDES.pop(key, None)
        fb._conv3x3_dchw_m_impl.clear_cache()
        default_tiles = fb._pick_tiles_v2m(D, H, C, W, 2, cout=Cout)
        try:
            base = kernel_ms(D, H, W, C, Cout)
        except Exception as e:
            out["rows"].append({"name": name, "error": str(e)[:160]})
            continue
        row = {"name": name, "geom": [D, H, W, C, Cout],
               "default_tiles": list(default_tiles),
               "default_ms": round(base, 3), "candidates": []}
        best = None
        for TD, TH in CANDIDATES:
            if D % TD or H % TH:
                continue
            RH = _rh_for(TH, W)
            if RH is None:
                continue
            cand = (TD, TH, RH)
            if cand == default_tiles:
                continue
            fb.TILE_OVERRIDES[key] = cand
            fb._conv3x3_dchw_m_impl.clear_cache()
            t0 = time.monotonic()
            try:
                ms = kernel_ms(D, H, W, C, Cout)
                entry = {"tiles": list(cand), "ms": round(ms, 3),
                         "probe_s": round(time.monotonic() - t0, 1)}
                if best is None or ms < best[1]:
                    best = (cand, ms)
            except Exception as e:
                entry = {"tiles": list(cand),
                         "compile_error": str(e)[:160],
                         "probe_s": round(time.monotonic() - t0, 1)}
            row["candidates"].append(entry)
            print(f"{name} {cand}: {entry}", file=sys.stderr, flush=True)
        fb.TILE_OVERRIDES.pop(key, None)
        fb._conv3x3_dchw_m_impl.clear_cache()
        if best is not None and best[1] < base * 0.98:
            row["winner"] = {"tiles": list(best[0]), "ms": round(best[1], 3),
                             "win_pct": round((1 - best[1] / base) * 100, 1)}
        row["verdict"] = (
            "override wins" if "winner" in row else "default tiles stand"
        )
        out["rows"].append(row)
        print(f"row {name}: {row}", file=sys.stderr, flush=True)
    Path(__file__).resolve().parent.parent.joinpath("TILE_PROBE.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print("wrote TILE_PROBE.json")


if __name__ == "__main__":
    main()
