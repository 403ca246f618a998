"""Committed-params quality gate (VERDICT r3 item 7).

The repo ships the briefly-trained bench params as artifacts
(``artifacts/bench_params_*.npz``; scripts/make_bench_params.py). This test
runs the REAL cascade with those params on a small phantom and asserts Dice
bounds — so a numerics regression (loss, normalization, resample, fused
kernels, transfer quantization...) fails CI instead of silently skewing the
bench quality columns. Bench quality history for calibration: bench tumor
Dice moved 0.9634 → 0.9412 across retrains of the same recipe (r3), so
bounds here sit well below measured values (kidney 0.979 / tumor 0.880 on
this exact geometry at commit time) but far above anything a real numerics
break would produce.

Runtime: ~2 min on the 1-core CPU host (one 192×192×64 case through the
full coarse→ROI→fine→paste→CC path).
"""

import numpy as np
import pytest

import bench
from runet_tpu.config import get_config
from runet_tpu.data.phantom import make_phantom
from runet_tpu.eval.evaluate import evaluate_prediction
from runet_tpu.infer.cascade import ModelBundle, predict_case
from runet_tpu.models.unet3d import UNet3D


def _artifact_bundle(preset):
    cfg = get_config(preset)
    params = bench._load_params(preset)
    if params is None:
        pytest.skip(
            f"no valid bench params artifact for {preset} "
            "(regenerate: python scripts/make_bench_params.py)"
        )
    model = UNet3D(cfg.model)
    return (
        ModelBundle(
            apply_fn=lambda p, w, _m=model: _m.apply({"params": p}, w),
            params=params,
            num_classes=cfg.model.num_classes,
            preprocess=cfg.preprocess,
            infer=cfg.infer,
        ),
        cfg,
    )


def test_committed_params_cascade_quality():
    coarse, _ = _artifact_bundle("coarse")
    fine, fine_cfg = _artifact_bundle("fine_kits")
    # Same phantom family as the bench cases, smaller so CPU stays ~2 min;
    # seed differs from both the training set (0-1) and bench cases (0-2).
    img, seg = make_phantom((192, 192, 64), bench.CASE_SPACING,
                            num_classes=3, seed=7)
    pred = predict_case(coarse, fine, img, bench.CASE_SPACING,
                        fine_cfg.cascade)
    assert pred.shape == seg.shape and pred.dtype == np.uint8
    m = evaluate_prediction(pred, seg, fine.num_classes)
    # Measured at gate commit time: kidney_composite 0.9786, tumor 0.8800.
    assert m["kidney_composite"] > 0.93, m
    assert m["tumor"] > 0.80, m
