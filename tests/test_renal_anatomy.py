"""BASELINE config 4 (renal_anatomy, 5 classes incl. artery/vein) end-to-end
(VERDICT r2 item 6): the 5-class path has to produce per-class Dice for c3
(artery) and c4 (vein), both through the cascade plumbing and from a
really-trained model.
"""

import dataclasses

import numpy as np
import pytest

import jax

from runet_tpu.config import (
    CascadeConfig,
    InferConfig,
    PreprocessConfig,
    get_config,
)
from runet_tpu.data.phantom import make_phantom, write_phantom_dataset
from runet_tpu.eval.evaluate import evaluate_prediction
from runet_tpu.infer.cascade import ModelBundle, predict_case, predict_volume


def _identity_pp(spacing):
    return PreprocessConfig(spacing=spacing, hu_window=(0.0, 100.0), hu_stats=(0.0, 1.0))


def test_cascade_five_class_oracle():
    """Full coarse→ROI→fine cascade at num_classes=5: artery/vein labels
    survive crop/resample/paste and show up in per-class Dice."""
    import jax.numpy as jnp

    _, seg = make_phantom((64, 64, 48), (1.0, 1.0, 1.5), num_classes=5, seed=0)
    img = seg.astype(np.float32)

    def binary_oracle(params, windows):
        x = windows[..., 0]
        return jnp.stack([10.0 * (0.5 - x), 10.0 * (x - 0.5)], axis=-1)

    def class_oracle(params, windows):
        x = jnp.clip(jnp.round(windows[..., 0]).astype(jnp.int32), 0, 4)
        return 20.0 * jax.nn.one_hot(x, 5)

    coarse = ModelBundle(
        apply_fn=binary_oracle, params={}, num_classes=2,
        preprocess=_identity_pp((2.0, 2.0, 2.0)),
        infer=InferConfig(patch_size=(32, 32, 32), overlap=0.5),
    )
    fine = ModelBundle(
        apply_fn=class_oracle, params={}, num_classes=5,
        preprocess=_identity_pp((1.0, 1.0, 1.0)),
        infer=InferConfig(patch_size=(32, 32, 32), overlap=0.5),
    )
    pred = predict_case(
        coarse, fine, img, (1.0, 1.0, 1.5),
        cascade=CascadeConfig(roi_margin_mm=8.0, roi_bucket=16, max_components=2),
    )
    m = evaluate_prediction(pred, seg, 5)
    assert m["dice_c1"] > 0.9, m
    assert m["dice_c2"] > 0.9, m
    # artery/vein are thin tubes, partially outside the kidney ROI boxes —
    # the in-ROI parts must still come through the one-hot resample chain.
    assert m["dice_c3"] > 0.5, m
    assert m["dice_c4"] > 0.5, m


@pytest.mark.slow
def test_renal_anatomy_trained_five_class_cascade(tmp_path):
    """Train the renal_anatomy preset's fine model (scaled down for the CPU
    host) on a 5-class phantom, then run BASELINE config 4 the way it is
    deployed — through the CASCADE, where the fine model sees kidney-centered
    ROIs. Whole-volume single-pass would be the WRONG e2e here: InstanceNorm
    makes the net sensitive to the input's intensity distribution, and a
    model trained on fg-biased patches collapses on a mostly-background
    volume (measured: kidney Dice 0.947 via cascade ROIs vs 0.004 via
    whole-volume single-pass for the same params). Asserts real per-class
    Dice including c3 (artery) / c4 (vein) from actual gradients."""
    import jax.numpy as jnp

    from runet_tpu.models.unet3d import UNet3D
    from runet_tpu.train.loop import train

    write_phantom_dataset(
        tmp_path / "data", num_cases=1, shape=(48, 48, 32),
        spacing=(1.0, 1.0, 1.0), num_classes=5, vessel_radius=2.5,
        kidney_scale=1.25,
    )
    cfg = get_config("renal_anatomy")
    assert cfg.model.num_classes == 5
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, base_features=16, num_levels=2, compute_dtype="float32",
            fused_blocks=False,
        ),
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        # Recipe robustness: 250 steps @ lr 3e-3 sat on a knife edge — the
        # trajectory is chaotic enough that an unrelated numerics change
        # (e.g. the IN variance clamp) or the suite's fake-8-device env
        # flipped tumor Dice between 0.44 and 0.0. 400 steps @ lr 2e-3 with
        # fg_prob 0.9 trains every class with margin (probed standalone:
        # c1 0.96 / c2 0.82 / c3 0.83 / c4 0.85).
        train=dataclasses.replace(
            cfg.train, patch_size=(24, 24, 24), batch_size=2, grad_accum=1,
            steps=400, lr=2e-3, lr_schedule="const", warmup_steps=10,
            val_every=10**9, val_full_every=0, ckpt_every=10**9, fg_prob=0.9,
            seed=1,
        ),
        infer=dataclasses.replace(cfg.infer, patch_size=(24, 24, 24)),
    )
    state, aux = train(
        cfg, data_root=tmp_path / "data", out_dir=tmp_path / "run", log_every=100
    )
    assert np.isfinite(float(aux["loss"]))

    model = UNet3D(cfg.model)

    def apply_fn(p, w):
        return model.apply({"params": p}, w)

    fine = ModelBundle(
        apply_fn=apply_fn, params=state.params, num_classes=5,
        preprocess=cfg.preprocess, infer=cfg.infer,
    )

    # Coarse kidney localizer as an HU-threshold oracle (soft tissue ≥ -15
    # HU): the coarse stage's own training is covered elsewhere; this test
    # pins the 5-class fine path.
    def coarse_oracle(params, windows):
        x = windows[..., 0]
        return jnp.stack([-(x + 15.0), x + 15.0], axis=-1)

    coarse = ModelBundle(
        apply_fn=coarse_oracle, params={}, num_classes=2,
        preprocess=PreprocessConfig(
            spacing=(2.0, 2.0, 2.0), hu_window=(-2000.0, 2000.0), hu_stats=(0.0, 1.0)
        ),
        infer=InferConfig(patch_size=(16, 16, 16)),
    )

    img, seg = make_phantom(
        (48, 48, 32), (1.0, 1.0, 1.0), num_classes=5, seed=0,
        vessel_radius=2.5, kidney_scale=1.25,
    )
    pred = predict_case(
        coarse, fine, img, (1.0, 1.0, 1.0),
        cascade=CascadeConfig(roi_margin_mm=6.0, roi_bucket=16, max_components=2),
    )
    m = evaluate_prediction(pred, seg, 5)
    # Probed on this recipe: c1 0.959, c2 0.815, c3 0.826, c4 0.851
    # (standalone CPU); thresholds leave room for env-induced trajectory
    # noise while still requiring every class to be genuinely learned.
    assert m["dice_c1"] > 0.8, m
    assert m["dice_c2"] > 0.4, m
    assert m["dice_c3"] > 0.55, m
    assert m["dice_c4"] > 0.55, m
