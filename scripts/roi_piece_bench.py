"""Decision measurements for the two serving-cost findings in
CASCADE_PROFILE.json (round 3, deep pass):

1. The bench-geometry kidney ROIs run at fine bucket (192,160,256) —
   ``roi_bucket_z=128`` is a round-2 relic from the fused kernels' W%128
   lane gate; the v2 gate is W%64 since round 3, so bucket 64 would map
   the same ROIs to (192,160,192): 25% fewer fine voxels per ROI. Measure
   ``predict_case`` end-to-end under both buckets (per-dispatch exec time
   via synced wrappers, total wall, Dice equivalence vs the phantom seg).

2. ``postprocess_cc`` measured 345-1043 ms/case on the chip host — far
   above a synthetic microbench of the same code (~70 ms). Attribute its
   internals live: per-box CC voxels/components/ms via a wrapped
   ``label_components``, the residual = copies + isin + write-back.

Also: piece-level device timing of the ROI program's stages (resample /
normalize / forward / one-hot back-resample / nibble-pack) at the real
bucket under the scanned_ms protocol, so the 578 ms B=2 dispatch is
explained, not guessed at.

Run on the TPU host: python scripts/roi_piece_bench.py
Writes ROI_PIECES.json at the repo root.
"""

import dataclasses
import json
import sys
import time
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

import runet_tpu.infer.cascade as casc  # noqa: E402
import runet_tpu.infer.postprocess as post  # noqa: E402
from runet_tpu.eval.evaluate import evaluate_prediction  # noqa: E402
from runet_tpu.infer.warmup import warmup_cases  # noqa: E402
from runet_tpu.utils.latency import scanned_ms  # noqa: E402
from runet_tpu.utils.timing import PhaseTimer, device_sync  # noqa: E402


def run_bucket(coarse, fine, cascade_cfg, cases, spacing, iters=3):
    """predict_case under a cascade config: synced per-dispatch ROI exec
    times + shapes, total wall (median), Dice vs phantom seg."""
    warmup_cases(coarse, fine, [(img, spacing) for img, _ in cases],
                 cascade_cfg, workers=2)
    orig1, origb = casc._roi_program, casc._roi_program_batch
    disp = []

    def wrap(orig, kind):
        def f(apply_fn, params, crop, padded, *a):
            t0 = time.monotonic()
            dev = orig(apply_fn, params, crop, padded, *a)
            device_sync(dev)
            b = crop.shape[0] if kind == "b" else 1
            disp.append({"batch": b, "padded": list(padded),
                         "crop": list(crop.shape[-3:]),
                         "exec_ms": round((time.monotonic() - t0) * 1000, 1)})
            return dev
        return f

    out = {"cases": []}
    try:
        casc._roi_program = wrap(orig1, "1")
        casc._roi_program_batch = wrap(origb, "b")
        for ci, (img, seg) in enumerate(cases):
            totals, execs = [], []
            pred = None
            for _ in range(iters):
                disp.clear()
                t0 = time.monotonic()
                pred = casc.predict_case(coarse, fine, img, spacing, cascade_cfg)
                totals.append(time.monotonic() - t0)
                execs.append(list(disp))
            m = evaluate_prediction(pred, seg, fine.num_classes)
            # Median-total iteration's dispatch list (tunnel first-exec
            # outliers land in other iterations).
            med_i = int(np.argsort(totals)[len(totals) // 2])
            out["cases"].append({
                "case": ci,
                "total_ms_median": round(float(np.median(totals)) * 1000, 1),
                "total_ms_all": [round(t * 1000, 1) for t in totals],
                "dispatches": execs[med_i],
                "roi_exec_ms": round(sum(d["exec_ms"] for d in execs[med_i]), 1),
                "kidney_dice": round(m["kidney_composite"], 4),
                "tumor_dice": round(m["tumor"], 4),
            })
            print(f"  case {ci}: {out['cases'][-1]}", file=sys.stderr)
    finally:
        casc._roi_program, casc._roi_program_batch = orig1, origb
    return out


def postprocess_attribution(coarse, fine, cascade_cfg, img, spacing):
    """One predict_case with label_components wrapped: per-call voxels,
    components, ms; plus the keep_largest_components_in_boxes total."""
    orig_lc = post.label_components
    calls = []

    def lc(mask):
        t0 = time.monotonic()
        labels, n = orig_lc(mask)
        calls.append({"voxels": int(mask.size), "components": int(n),
                      "ms": round((time.monotonic() - t0) * 1000, 1)})
        return labels, n

    orig_keep = casc.keep_largest_components_in_boxes
    total = {}

    def keep(seg, boxes, **kw):
        t0 = time.monotonic()
        out = orig_keep(seg, boxes, **kw)
        total["keep_in_boxes_ms"] = round((time.monotonic() - t0) * 1000, 1)
        total["boxes"] = [[list(map(int, lo)), list(map(int, hi))]
                          for lo, hi in boxes]
        return out

    try:
        post.label_components = lc
        casc.keep_largest_components_in_boxes = keep
        t = PhaseTimer()
        casc.predict_case(coarse, fine, img, spacing, cascade_cfg, timer=t)
        total["phases_ms"] = {k: round(v * 1000, 1)
                              for k, v in t.as_dict().items()}
    finally:
        post.label_components = orig_lc
        casc.keep_largest_components_in_boxes = orig_keep
    total["label_components_calls"] = calls
    total["native_lib_loaded"] = post.native_label_components(
        np.zeros((4, 4, 4), np.uint8)
    ) is not None
    return total


def roi_program_pieces(fine, padded, crop_shape, n_sp, iters=8):
    """Device ms of each ROI-program stage at the real bucket. Stages
    change shapes, so each is wrapped shape-preservingly for the
    ``scanned_ms`` device loop: a tiny f32 carry perturbs the stage input
    (float ``*0`` is not foldable under NaN semantics — the stage stays
    data-dependent on the carry, so XLA can neither hoist nor DCE it) and
    the stage output folds back into the carry the same way."""
    from runet_tpu.infer.packing import pack_nibbles
    from runet_tpu.infer.sliding_window import _single_pass
    from runet_tpu.infer.tta import effective_apply_fn
    from runet_tpu.preprocess.normalize import normalize
    from runet_tpu.preprocess.resample import (
        resample_dynamic,
        resample_labels_onehot_dynamic,
    )

    apply_fn = effective_apply_fn(fine)
    f_sp = np.asarray(fine.preprocess.spacing, np.float64)
    scale_nf = jnp.asarray([f / n for n, f in zip(n_sp, f_sp)], jnp.float32)
    scale_fn = jnp.asarray([n / f for n, f in zip(n_sp, f_sp)], jnp.float32)
    hu_w, hu_s = fine.preprocess.hu_window, fine.preprocess.hu_stats
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.normal(100, 50, crop_shape).astype(np.float16))

    def timed(f, base, iters=iters):
        """f(base-like) with base perturbed by the carry; returns device ms."""
        def step(c):
            v = jnp.sum(c) * 0  # f32; not foldable (NaN semantics)
            out = f(base + v.astype(base.dtype))
            return c + jnp.sum(out.astype(jnp.float32)) * 0

        return round(scanned_ms(step, jnp.zeros((8,), jnp.float32), iters=iters), 2)

    rows = {}
    rows["resample_ms"] = timed(
        lambda c: resample_dynamic(c, padded, scale_nf, "linear"), crop)
    roi = resample_dynamic(crop, padded, scale_nf, "linear")
    rows["normalize_ms"] = timed(lambda r: normalize(r, hu_w, hu_s), roi)
    x = normalize(roi, hu_w, hu_s)
    rows["fwd_argmax_b1_ms"] = timed(
        lambda v: _single_pass(apply_fn, fine.params, v[..., None])[0], x)
    xb = jnp.stack([x, x])
    rows["fwd_argmax_b2_ms"] = timed(
        lambda v: jnp.argmax(
            apply_fn(fine.params, v[..., None]), axis=-1
        ).astype(jnp.uint8),
        xb, iters=max(2, iters // 2),
    )
    labels, _ = _single_pass(apply_fn, fine.params, x[..., None])
    labels = labels.astype(jnp.int32)
    rows["onehot_back_ms"] = timed(
        lambda l: resample_labels_onehot_dynamic(
            l, crop_shape, scale_fn, fine.num_classes
        ).astype(jnp.uint8),
        labels,
    )
    native = resample_labels_onehot_dynamic(
        labels, crop_shape, scale_fn, fine.num_classes
    ).astype(jnp.uint8)
    rows["pack_ms"] = timed(pack_nibbles, native)
    return rows


def main():
    import bench

    data_root = Path("/tmp/runet_bench_train_data")
    cases = [bench.make_case(seed=s) for s in bench.CASE_SEEDS]
    coarse, _ = bench.trained_bundle("coarse", data_root)
    fine, fine_cfg = bench.trained_bundle("fine_kits", data_root)
    sp = bench.CASE_SPACING

    out = {"device": str(jax.devices()[0]), "case_shape": list(bench.CASE_SHAPE)}

    print("== pieces at (192,160,256) ==", file=sys.stderr)
    out["pieces_z256"] = roi_program_pieces(
        fine, (192, 160, 256), (208, 176, 80), sp)
    print(out["pieces_z256"], file=sys.stderr)

    print("== bucket_z=128 (current default) ==", file=sys.stderr)
    out["bucket_z128"] = run_bucket(coarse, fine, fine_cfg.cascade, cases, sp)
    print("== bucket_z=64 (W%64 gate hypothesis) ==", file=sys.stderr)
    cc64 = dataclasses.replace(fine_cfg.cascade, roi_bucket_z=64)
    out["bucket_z64"] = run_bucket(coarse, fine, cc64, cases, sp)

    print("== postprocess attribution ==", file=sys.stderr)
    out["postprocess"] = postprocess_attribution(
        coarse, fine, fine_cfg.cascade, cases[0][0], sp)
    print(json.dumps(out["postprocess"])[:600], file=sys.stderr)

    Path("ROI_PIECES.json").write_text(json.dumps(out, indent=1))
    print("wrote ROI_PIECES.json", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
