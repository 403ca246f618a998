"""Serving warm-up / precompile (VERDICT r2 item 1b; SURVEY.md §6).

Cold start is the dominant first-case cost on this deployment: each big
jitted program pays (a) an XLA compile (~20-60 s, amortized by the
persistent compilation cache, utils/cache.py) and (b) a first-execution
load through the remote tunnel helper that has been measured anywhere from
2 s to 5+ minutes per program under shared-infra queueing. A serving
process therefore warms its programs ONCE at startup — the cascade needs
only a handful per deployment: one canonical coarse program plus one fine
ROI program per bucket (infer/cascade.py bounds ROI statics to the bucket
set).

Two entry points:

- ``warmup_cases``: run ``predict_case`` over representative case(s) — the
  exact product path; warms every program those cases touch.
- ``warmup_roi_buckets``: dispatch the fine ROI program for explicit
  bucketed fine shapes (when the expected buckets are known without data).

Both return per-item wall-clock so cold cost is attributable. All warm-up
dispatches run CONCURRENTLY on a small thread pool: JAX dispatch is
thread-safe and first-execution waits are (partly) queueing in the tunnel
helper, so overlapping them recovers real wall-clock when the helper
pipelines.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from runet_tpu.config import CascadeConfig


def warmup_cases(
    coarse,
    fine,
    cases,  # iterable of (image, native_spacing)
    cascade: CascadeConfig = CascadeConfig(),
    workers: int = 2,
    devices=None,
) -> dict[str, float]:
    """Warm every cascade program touched by the given cases (full
    ``predict_case`` path, results discarded). Returns per-case seconds.

    ``devices``: warm each multi-chip serving lane (predict_cases
    ``devices=``) — jit executables are per-device, so a deployment using N
    lanes must warm the case set on each of the N chips (done concurrently,
    one thread per lane-case)."""
    import jax

    from runet_tpu.infer.cascade import bundle_on_device, predict_case

    def timed(img, sp, dev=None, c=None, f=None):
        # Timed INSIDE the submitted callable: measuring completion deltas
        # between concurrently-running futures on the caller thread would
        # attribute near-zero cost to every case after the first.
        t0 = time.monotonic()
        if dev is None:
            predict_case(coarse, fine, img, sp, cascade)
        else:
            with jax.default_device(dev):
                predict_case(c, f, img, sp, cascade)
        return time.monotonic() - t0

    out: dict[str, float] = {}
    t_all = time.monotonic()
    if devices:
        cases = list(cases)
        lanes = [
            (dev, bundle_on_device(coarse, dev), bundle_on_device(fine, dev))
            for dev in devices
        ]
        with ThreadPoolExecutor(max_workers=max(1, workers) * len(lanes)) as pool:
            futs = {
                (j, i): pool.submit(timed, img, sp, dev, c, f)
                for j, (dev, c, f) in enumerate(lanes)
                for i, (img, sp) in enumerate(cases)
            }
            for (j, i), f in futs.items():
                out[f"lane{j}_case{i}_s"] = round(f.result(), 2)
    else:
        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            futs = [pool.submit(timed, img, sp) for img, sp in cases]
            for i, f in enumerate(futs):
                out[f"case{i}_s"] = round(f.result(), 2)
    out["total_s"] = round(time.monotonic() - t_all, 2)
    return out


def warmup_roi_buckets(
    fine,
    fine_shapes,  # iterable of bucketed fine-grid shapes, e.g. (192,160,256)
    native_spacing,
    workers: int = 2,
    cascade: CascadeConfig = CascadeConfig(),
) -> dict[str, float]:
    """Dispatch the ROI program chain for explicit fine buckets on dummy
    input — for deployments that know their bucket set up front. The
    spacing-derived scales are traced program INPUTS (cascade.py), so one
    warm spacing covers every native spacing that lands in the same
    (fine bucket, crop bucket) shape class."""
    import jax.numpy as jnp

    from runet_tpu.infer.cascade import (
        _roi_program,
        _roi_program_batch,
        _to_transfer_dtype,
    )
    from runet_tpu.infer.tta import effective_apply_fn

    n_sp = np.asarray(native_spacing, np.float64)
    f_sp = np.asarray(fine.preprocess.spacing, np.float64)
    scale_nf = tuple(f / n for n, f in zip(n_sp, f_sp))
    scale_fn = tuple(n / f for n, f in zip(n_sp, f_sp))
    apply_fn = effective_apply_fn(fine)
    cb = max(1, int(getattr(cascade, "crop_bucket", 16)))
    roi_batch = max(1, int(getattr(cascade, "roi_batch", 1)))

    def one(job):
        padded, B = job
        padded = tuple(int(p) for p in padded)
        # Same crop-extent bucketing as predict_case: the crop shape is a
        # static of the ROI program and must match what serving dispatches.
        want = tuple(
            -(-(int(np.ceil((p - 1) * s)) + 1) // cb) * cb
            for p, s in zip(padded, scale_nf)
        )
        common = (
            np.asarray(scale_nf, np.float32),
            np.asarray(scale_fn, np.float32),
            fine.num_classes,
            fine.preprocess.hu_window,
            fine.preprocess.hu_stats,
        )
        # Dummy crops go through the SAME transfer-dtype encoding serving
        # uses (cascade._to_transfer_dtype): with transfer_quant the shipping
        # presets dispatch uint8 crops, and a f16 dummy would warm a jit
        # cache class serving never touches — the first real case would eat
        # a cold compile after "successful" warmup (VERDICT r3 missing #5).
        dummy = jnp.asarray(
            _to_transfer_dtype(np.zeros(want, np.float16), fine.preprocess)
        )
        t0 = time.monotonic()
        if B == 1:
            out = _roi_program(
                apply_fn, fine.params, dummy,
                padded, padded, want, *common,
            )
        else:
            out = _roi_program_batch(
                apply_fn, fine.params,
                jnp.broadcast_to(dummy, (B, *dummy.shape)),
                padded, padded, want, *common,
            )
        out.block_until_ready()
        return time.monotonic() - t0

    out: dict[str, float] = {}
    t_all = time.monotonic()
    # B=1 always serves (leftover singles); the roi_batch-sized program
    # serves full same-bucket groups (cascade.py staging).
    jobs = [
        (tuple(int(p) for p in s), B)
        for s in fine_shapes
        for B in ([1] if roi_batch == 1 else [1, roi_batch])
    ]
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for (shape, B), dt in zip(jobs, pool.map(one, jobs)):
            out[f"roi_{'x'.join(map(str, shape))}_b{B}_s"] = round(dt, 2)
    out["total_s"] = round(time.monotonic() - t_all, 2)
    return out
