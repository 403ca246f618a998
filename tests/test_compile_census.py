"""Compile-class census across a dataset-scale geometry sweep (VERDICT r4
item 5).

The whole cascade bucketing design — canonical coarse grid, 32-bucketed
strided input, 32/64-bucketed ROI fine grids, 16-bucketed crop extents —
exists to bound the number of distinct jitted device programs across a
~210-case KiTS19 sweep (each fresh XLA compile is ~30-60 s on the 1-core
TPU host; SURVEY.md §3.2/§6: <10 s/vol cannot survive recompiles
mid-sweep). Until now no test counted the classes against a realistic
shape/spacing distribution; this one simulates 210 case geometries through
``predict_case``'s host logic with every device program monkeypatched to a
signature recorder, and asserts the totals stay within stated budgets.

Geometry model (KiTS19-like): 512×512 in-plane at 0.44-1.04 mm, 29-1059
slices at 0.5-5.0 mm z spacing, two kidney-sized foreground boxes.
"""

import numpy as np

from runet_tpu.config import get_config
from runet_tpu.infer import cascade as cas
from runet_tpu.infer.cascade import ModelBundle, predict_case
from runet_tpu.infer.packing import packed_crumb_len


def _case_geometries(n, seed=0):
    """(shape, spacing, kidney mm-boxes) for n synthetic abdominal CTs."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        sx = float(rng.uniform(0.437, 1.04))
        sz = float(rng.choice([0.5, 0.8, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0]))
        z_mm = float(rng.uniform(180.0, 560.0))
        nz = int(np.clip(round(z_mm / sz), 29, 1059))
        shape = (512, 512, nz)
        ext_mm = np.asarray([512 * sx, 512 * sx, nz * sz])
        boxes = []
        for fx, fy in ((0.28, 0.40), (0.68, 0.42)):
            c = ext_mm * np.asarray([fx + rng.uniform(-0.03, 0.03),
                                     fy + rng.uniform(-0.03, 0.03),
                                     0.5 + rng.uniform(-0.1, 0.1)])
            half = np.asarray([rng.uniform(25, 42),
                               rng.uniform(25, 42),
                               rng.uniform(45, 62)])  # kidney ~6-8×9-12 cm
            boxes.append((c - half, c + half))
        out.append((shape, (sx, sx, sz), boxes))
    return out


def test_compile_class_census(monkeypatch):
    coarse_cfg = get_config("coarse")
    fine_cfg = get_config("fine_kits")
    cascade_cfg = get_config("cascade").cascade

    coarse = ModelBundle(apply_fn="coarse_apply", params={}, num_classes=2,
                         preprocess=coarse_cfg.preprocess,
                         infer=coarse_cfg.infer)
    fine = ModelBundle(apply_fn="fine_apply", params={}, num_classes=3,
                       preprocess=fine_cfg.preprocess, infer=fine_cfg.infer)

    # Split-architecture class census (cascade.py "Split program
    # architecture"): HEAVY classes carry the U-Net (~106 s compile each,
    # chip-measured); LIGHT classes are the shape-varying resample stages
    # (~2-8 s each). The sets record each stage's jit cache key: statics +
    # traced arg shapes/dtypes.
    heavy_sigs, light_in_sigs, light_out_sigs, batch_sigs = (
        set(), set(), set(), set(),
    )
    holder = {}  # per-case kidney boxes in mm, read by the fake coarse core

    def fake_stage_in(image, out_shape, scale, hu_window, hu_stats, in_z=None):
        img = np.asarray(image)
        # Tag coarse vs ROI entries: the shipped coarse preset uploads
        # 4-bit-packed (in_z set); ROI crops never do (cascade rejects
        # quant4 on the fine path).
        tag = "coarse" if in_z is not None else "roi"
        light_in_sigs.add((tag, img.shape, str(img.dtype), tuple(out_shape),
                           hu_window, hu_stats, in_z))
        return np.zeros(out_shape, np.float32)

    def fake_coarse_core(apply_fn, params, x):
        out_shape = np.asarray(x).shape
        heavy_sigs.add(("coarse", out_shape))
        mask = np.zeros(out_shape, np.uint8)
        c_sp = np.asarray(coarse.preprocess.spacing)
        for lo_mm, hi_mm in holder["boxes"]:
            lo = np.maximum(np.floor(lo_mm / c_sp).astype(int), 0)
            hi = np.minimum(np.ceil(hi_mm / c_sp).astype(int), out_shape)
            if np.all(hi > lo):
                mask[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1
        return np.packbits(mask, axis=-1, bitorder="little")

    def fake_roi_core(apply_fn, params, roi):
        shape = np.asarray(roi).shape
        heavy_sigs.add(("roi", shape))
        return np.zeros(shape, np.uint8)

    def fake_roi_core_batch(apply_fn, params, rois):
        shape = np.asarray(rois).shape
        batch_sigs.add(("roi_batch", shape))
        return np.zeros(shape, np.uint8)

    def fake_stage_out(labels, fine_shape, crop_shape, scale, num_classes):
        light_out_sigs.add((np.asarray(labels).shape, tuple(fine_shape),
                            tuple(crop_shape), num_classes))
        return np.zeros(
            (crop_shape[0], crop_shape[1], packed_crumb_len(crop_shape[2])),
            np.uint8,
        )

    def fake_stage_out_batch(labels, fine_shape, crop_shape, scale,
                             num_classes):
        b = np.asarray(labels).shape[0]
        light_out_sigs.add((np.asarray(labels).shape, tuple(fine_shape),
                            tuple(crop_shape), num_classes))
        return np.zeros(
            (b, crop_shape[0], crop_shape[1],
             packed_crumb_len(crop_shape[2])),
            np.uint8,
        )

    def no_windowed_fallback(*a, **k):
        raise AssertionError(
            "windowed ROI fallback triggered — a KiTS19-geometry ROI "
            "escaped the single-pass budget, which mints unbounded "
            "compile classes"
        )

    monkeypatch.setattr(cas, "_stage_resample_in", fake_stage_in)
    monkeypatch.setattr(cas, "_stage_resample_in_batch", fake_stage_in)
    monkeypatch.setattr(cas, "_coarse_stage_core", fake_coarse_core)
    monkeypatch.setattr(cas, "_roi_stage_core", fake_roi_core)
    monkeypatch.setattr(cas, "_roi_stage_core_batch", fake_roi_core_batch)
    monkeypatch.setattr(cas, "_roi_stage_out", fake_stage_out)
    monkeypatch.setattr(cas, "_roi_stage_out_batch", fake_stage_out_batch)
    monkeypatch.setattr(cas, "_predict_stage", no_windowed_fallback)
    # Force the lane-bucket rule ON (predict_case disables it off-TPU, but
    # the census must count the classes the TPU deployment would compile).
    monkeypatch.setattr(
        cas, "_xla_over_fused", lambda art_path=None: 1.45
    )
    orig_bucket_up = cas._bucket_up
    lane = getattr(cascade_cfg, "roi_bucket_z", 64)
    monkeypatch.setattr(
        cas, "_bucket_up",
        lambda size, bucket, bucket_z=None: orig_bucket_up(
            size, bucket, bucket_z if bucket_z is not None else lane),
    )

    n_rois = 0
    for shape, spacing, boxes in _case_geometries(210):
        holder["boxes"] = boxes
        img = np.zeros(shape, np.int16)
        pred = predict_case(coarse, fine, img, spacing, cascade_cfg,
                            postprocess=False)
        assert pred.shape == shape
        n_rois += 2

    # ---- budgets ----
    # HEAVY (U-Net) classes: coarse rides the canonical 128³ grid (plus a
    # few 16-bucketed z escapes past 512 mm), ROI cores ride the bucketed
    # fine grids {128,160}×{128,160}×{192,256}. ~106 s compile each
    # (chip-measured 2026-08-20), so this budget is the one that makes a
    # fresh 210-case sweep feasible. Measured on this distribution: 15
    # (6 coarse + 9 roi).
    assert len(heavy_sigs) <= 16, (len(heavy_sigs), sorted(heavy_sigs))
    n_in_coarse = sum(1 for s in light_in_sigs if s[0] == "coarse")
    n_in_roi = len(light_in_sigs) - n_in_coarse
    print(f"census detail: heavy={sorted(heavy_sigs)} "
          f"in_coarse={n_in_coarse} in_roi={n_in_roi} "
          f"out={len(light_out_sigs)}")
    # LIGHT resample-stage classes: 32-bucketed strided inputs (coarse,
    # measured 32) and 16-bucketed crop extents (ROI, measured 268 in /
    # 268 out — crop extents are a near-continuous function of per-case
    # spacing, so they do NOT collapse much; that is exactly why they must
    # not be heavy classes). At the chip-measured ~2-8 s per light compile
    # a fully cold 210-case sweep pays ~35 min total, pipelined behind
    # compute by predict_cases and paid once ever per disk cache. Budgets
    # below guard against a regression to one-class-per-ROI-shape×spacing
    # (unbounded) behavior.
    assert n_in_coarse <= 48, n_in_coarse
    assert n_in_roi <= 340, n_in_roi
    assert len(light_out_sigs) <= 340, len(light_out_sigs)
    # Default roi_batch=1: the batched core never fires.
    assert len(batch_sigs) == 0, sorted(batch_sigs)
    print(f"census: heavy={len(heavy_sigs)} light_in={len(light_in_sigs)} "
          f"light_out={len(light_out_sigs)} batch={len(batch_sigs)} "
          f"over 210 cases/{n_rois} ROIs")
