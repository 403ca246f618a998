"""Mirror-flip TTA (infer/tta.py): contract + equivariance + integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.infer.tta import (
    effective_apply_fn,
    flip_combinations,
    make_tta_apply,
)


def test_flip_combinations_powerset():
    assert flip_combinations(()) == ((),)
    combos = flip_combinations((1, 2, 3))
    assert len(combos) == 8
    assert () in combos and (1, 2, 3) in combos


def _pointwise_apply(params, w):
    """Pointwise logits: flip-equivariant, so TTA must be an exact no-op."""
    return jnp.stack([w[..., 0], -w[..., 0]], axis=-1) * params


def test_tta_pointwise_is_identity_on_probs():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 1)).astype(np.float32))
    params = jnp.float32(1.3)

    plain_probs = jax.nn.softmax(_pointwise_apply(params, w), axis=-1)
    tta_fn = make_tta_apply(_pointwise_apply, (0, 1, 2))
    tta_probs = jax.nn.softmax(tta_fn(params, w), axis=-1)
    np.testing.assert_allclose(
        np.asarray(tta_probs), np.asarray(plain_probs), atol=1e-6
    )


def test_tta_probs_are_mean_of_flip_variant_probs():
    """softmax(tta_logits) == mean over flip variants of softmax(logits)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 2, 3)).astype(np.float32))

    def apply_fn(params, windows):
        # 1-D conv along X: NOT flip-equivariant, so variants genuinely differ.
        return jax.lax.conv_general_dilated(
            windows.reshape(1, -1, 2).swapaxes(1, 2), params,
            window_strides=(1,), padding="SAME",
        ).swapaxes(1, 2).reshape(windows.shape[:-1] + (3,))

    manual = []
    for axes in flip_combinations((1,)):
        wf = jnp.flip(w, axes) if axes else w
        p = jax.nn.softmax(apply_fn(kernel, wf).astype(jnp.float32), -1)
        manual.append(jnp.flip(p, axes) if axes else p)
    expected = sum(manual) / len(manual)

    tta_fn = make_tta_apply(apply_fn, (0,))
    got = jax.nn.softmax(tta_fn(kernel, w), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)
    # And the variants really disagree (the test would be vacuous otherwise).
    assert float(jnp.abs(manual[0] - manual[1]).max()) > 1e-4


def test_make_tta_apply_is_cached():
    f = _pointwise_apply
    assert make_tta_apply(f, (0, 1)) is make_tta_apply(f, (0, 1))
    assert make_tta_apply(f, (0,)) is not make_tta_apply(f, (0, 1))


def test_effective_apply_fn_respects_config():
    import dataclasses

    from runet_tpu.config import InferConfig
    from runet_tpu.infer.cascade import ModelBundle

    b = ModelBundle(
        apply_fn=_pointwise_apply, params=None, num_classes=2,
        preprocess=None, infer=InferConfig(),
    )
    assert effective_apply_fn(b) is _pointwise_apply
    b2 = dataclasses.replace(b, infer=InferConfig(tta=True))
    assert effective_apply_fn(b2) is make_tta_apply(
        _pointwise_apply, (0, 1, 2)
    )


def test_sliding_window_predict_with_tta_unet():
    """End-to-end: TTA apply_fn through the single-pass path on a tiny U-Net."""
    from runet_tpu.config import ModelConfig
    from runet_tpu.infer.sliding_window import sliding_window_predict
    from runet_tpu.models.unet3d import UNet3D, init_params

    cfg = ModelConfig(
        num_classes=3, base_features=4, num_levels=2, compute_dtype="float32"
    )
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))

    def apply_fn(p, w):
        return model.apply({"params": p}, w)

    rng = np.random.default_rng(2)
    vol = rng.normal(size=(10, 9, 8)).astype(np.float32)
    plain = sliding_window_predict(
        apply_fn, params, vol, (8, 8, 8), 3, single_pass_ratio=8.0
    )
    tta = sliding_window_predict(
        make_tta_apply(apply_fn, (0, 1, 2)), params, vol, (8, 8, 8), 3,
        single_pass_ratio=8.0,
    )
    assert tta.shape == vol.shape
    assert tta.dtype == np.uint8
    # Same model, same input: predictions agree on the vast majority of
    # voxels (TTA only shifts uncertain boundary voxels).
    assert (np.asarray(tta) == np.asarray(plain)).mean() > 0.5
