"""Decision measurement for ROI batching (NEXT_STEPS round-4 priority 2).

A KiTS19 case usually yields TWO kidney ROIs that share a fine-stage
bucket. Today the cascade dispatches one `_roi_program` per ROI and the
dispatches overlap in-flight on the device queue; batching them into one
B=2 program would pay extra padding logic and a second compile class per
bucket. Whether it can win at all is bounded by the overlap gap this
script measures on chip, at the most common bucket geometry:

  single_rtt_ms    one ROI program, dispatch→fetch wall time (incl. tunnel
                   round-trip)
  enqueued_ms      N=8 programs enqueued back-to-back, ONE final fetch;
                   per-call quotient ≈ device time if overlap is perfect
  fwd_b1_ms        U-Net forward at the bucket shape, B=1 (scan protocol)
  fwd_b2_ms        same, B=2 — per-ROI quotient is the batching ceiling

Decision rule: if `enqueued_ms ≈ fwd-dominated device time` and
`fwd_b2_ms ≈ 2 × fwd_b1_ms` (chip already saturated at B=1, as the train
step showed: 519 vs 2×258 ms), ROI batching cannot pay — close the item.

Run on the TPU host:  python scripts/roi_overlap_bench.py
Writes ROI_OVERLAP.json at the repo root.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if not len(sys.argv) > 1:  # chip mode: fail fast if the tunnel is dead
    from runet_tpu.utils.health import probe_backend

    _ok, _detail = probe_backend(tries=2)
    if not _ok:
        sys.exit(f"TPU backend unreachable ({_detail}); not starting")

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from runet_tpu.config import get_config  # noqa: E402
from runet_tpu.infer.cascade import _roi_program  # noqa: E402
from runet_tpu.models.unet3d import create_model, init_params  # noqa: E402
from runet_tpu.utils.latency import scanned_ms  # noqa: E402

# The modal KiTS19 kidney ROI bucket under roi_bucket=32 / roi_bucket_z=128
# (bench phantom kidneys land here; real kidneys at 0.78×0.78×3 mm native →
# 1 mm fine spacing are ~(96-128)² × ≤128 fine voxels).
PADDED = (128, 128, 128)
NATIVE_SP = (0.78125, 0.78125, 3.0)


def main():
    cfg = get_config("fine_kits")
    global PADDED
    smoke = len(sys.argv) > 1  # CPU smoke: tiny bucket+model, no artifact
    if smoke:
        import dataclasses

        e = int(sys.argv[1])
        PADDED = (e, e, e)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, base_features=4, max_features=8, num_levels=2
            ),
        )
    model = create_model(cfg.model)
    params = jax.device_put(init_params(model, jax.random.key(0), PADDED))

    def apply_fn(p, v):
        return model.apply({"params": p}, v)

    pp = cfg.preprocess
    # Exactly predict_case's conventions (infer/cascade.py:331-338): scales
    # are spacing ratios; the native crop is grown to cover the padded grid.
    scale_nf = tuple(f / n for n, f in zip(NATIVE_SP, pp.spacing))
    scale_fn = tuple(n / f for n, f in zip(NATIVE_SP, pp.spacing))
    cb = max(1, int(getattr(cfg.cascade, "crop_bucket", 16)))
    crop_shape = tuple(
        -(-(int(np.ceil((p - 1) * s)) + 1) // cb) * cb
        for p, s in zip(PADDED, scale_nf)
    )
    fine_shape = PADDED  # full bucketed grid is real context

    crop = jnp.asarray(
        np.random.default_rng(0).normal(40, 120, crop_shape).astype(np.float16)
    )
    crop = jax.device_put(crop)

    s_nf = np.asarray(scale_nf, np.float32)
    s_fn = np.asarray(scale_fn, np.float32)

    def roi_jit(c):  # _roi_program is itself jitted (static shapes; traced scales)
        return _roi_program(
            apply_fn, params, c, PADDED, fine_shape, crop_shape,
            s_nf, s_fn, cfg.model.num_classes,
            pp.hu_window, pp.hu_stats,
        )

    out = roi_jit(crop)
    np.asarray(out)  # compile + warm
    rows = {}

    # single dispatch→fetch wall (what a lone ROI costs a request)
    best = float("inf")
    for _ in range(2 if smoke else 5):
        t0 = time.monotonic()
        np.asarray(roi_jit(crop))
        best = min(best, (time.monotonic() - t0) * 1000)
    rows["single_rtt_ms"] = best

    # N enqueued back-to-back, one final fetch: per-call ≈ device time if
    # the queue hides dispatch + fetch of earlier calls behind compute.
    N = 4 if smoke else 8
    best = float("inf")
    for _ in range(1 if smoke else 3):
        t0 = time.monotonic()
        outs = [roi_jit(crop) for _ in range(N)]
        for o in outs:
            np.asarray(o)
        best = min(best, (time.monotonic() - t0) * 1000 / N)
    rows["enqueued_ms"] = best

    # forward-only ceiling: B=1 vs B=2 at the bucket shape (scan protocol).
    x1 = jax.device_put(jnp.zeros((1, *PADDED, 1), jnp.float32))
    x2 = jax.device_put(jnp.zeros((2, *PADDED, 1), jnp.float32))

    def fwd_step(x):
        y = apply_fn(params, x)
        return x + (jnp.mean(y) * 0).astype(x.dtype)

    it = 2 if smoke else 12
    rows["fwd_b1_ms"] = scanned_ms(fwd_step, x1, iters=it, reps=1 if smoke else 3)
    rows["fwd_b2_ms"] = scanned_ms(fwd_step, x2, iters=it, reps=1 if smoke else 3)

    rows = {k: round(v, 2) for k, v in rows.items()}
    out = {
        "padded": list(PADDED),
        "rows": rows,
        "derived": {
            # dispatch/fetch overhead hidden by the queue per ROI
            "overlap_hides_ms": round(rows["single_rtt_ms"] - rows["enqueued_ms"], 2),
            # batching ceiling: a B=2 ROI program can save at most
            # 2·enqueued − (fwd_b2 + per-ROI non-forward work); if
            # fwd_b2 ≈ 2×fwd_b1 (saturated chip) the ceiling is ~0.
            "batch2_ceiling_ms": round(
                2 * rows["enqueued_ms"]
                - (rows["fwd_b2_ms"] + 2 * (rows["enqueued_ms"] - rows["fwd_b1_ms"])),
                2,
            ),
            "fwd_b2_vs_2xb1": round(rows["fwd_b2_ms"] / (2 * rows["fwd_b1_ms"]), 3),
        },
    }
    if not smoke:
        Path(__file__).resolve().parent.parent.joinpath(
            "ROI_OVERLAP.json"
        ).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
