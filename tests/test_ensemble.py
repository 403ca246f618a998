"""Checkpoint-ensemble inference (infer/ensemble.py): exact probability
fusion semantics, composition with the sliding-window/bundle machinery,
and the CLI comma-spec loader."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from runet_tpu.config import InferConfig, ModelConfig, PreprocessConfig
from runet_tpu.infer.cascade import ModelBundle
from runet_tpu.infer.ensemble import ensemble_bundle, stack_params
from runet_tpu.models.unet3d import create_model, init_params

MC = ModelConfig(num_classes=3, base_features=4, max_features=8, num_levels=2)


def _bundle(seed: int) -> ModelBundle:
    model = create_model(MC)
    params = init_params(model, jax.random.key(seed), (16, 16, 16))

    def apply_fn(p, w):
        return model.apply({"params": p}, w)

    return ModelBundle(
        apply_fn=apply_fn,
        params=params,
        num_classes=MC.num_classes,
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        infer=InferConfig(patch_size=(16, 16, 16)),
    )


def test_ensemble_mean_prob_exact():
    """log(mean softmax) over members, computed member-by-member via the
    scan, matches the direct numpy average."""
    b1, b2 = _bundle(0), _bundle(1)
    ens = ensemble_bundle([b1, b2])
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 16, 1))

    out = ens.apply_fn(ens.params, x)
    p1 = jax.nn.softmax(b1.apply_fn(b1.params, x).astype(jnp.float32), -1)
    p2 = jax.nn.softmax(b2.apply_fn(b2.params, x).astype(jnp.float32), -1)
    want = np.log(np.asarray((p1 + p2) / 2) + 1e-12)
    # bf16 compute: the scanned forward and the direct forward round
    # differently (layout/fusion choices differ under scan) — tolerances at
    # bf16 scale; the fusion FORMULA is exact (see identical-members test).
    np.testing.assert_allclose(np.asarray(out), want, rtol=5e-2, atol=1e-3)
    # downstream consumers softmax the bundle output: softmax(log p) == p
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(out, -1)), np.asarray((p1 + p2) / 2),
        rtol=5e-2, atol=1e-3,
    )


def test_ensemble_of_identical_members_matches_single():
    """K identical members fuse to the member itself. Probabilities match at
    bf16 tolerance (the scanned and direct forwards are different compiled
    programs); argmax may flip only on near-tie voxels of these random
    params, so require >=99% agreement rather than exact equality."""
    b = _bundle(0)
    ens = ensemble_bundle([b, b])
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 16, 1))
    p_single = np.asarray(
        jax.nn.softmax(b.apply_fn(b.params, x).astype(jnp.float32), -1)
    )
    p_fused = np.asarray(jax.nn.softmax(ens.apply_fn(ens.params, x), -1))
    np.testing.assert_allclose(p_fused, p_single, rtol=5e-2, atol=1e-3)
    agree = (np.argmax(p_fused, -1) == np.argmax(p_single, -1)).mean()
    assert agree >= 0.99, agree


def test_ensemble_composes_with_predict_volume():
    """An ensemble bundle drives the whole-volume inference path unchanged."""
    from runet_tpu.infer.cascade import predict_volume

    ens = ensemble_bundle([_bundle(0), _bundle(1)])
    ens = dataclasses.replace(
        ens, infer=dataclasses.replace(ens.infer, single_pass_ratio=8.0)
    )
    img = np.random.default_rng(0).normal(0, 100, (20, 18, 16)).astype(np.float32)
    pred = predict_volume(ens, img, (1.0, 1.0, 1.0))
    assert pred.shape == img.shape
    assert set(np.unique(pred)) <= {0, 1, 2}


def test_ensemble_validation():
    b = _bundle(0)
    with pytest.raises(ValueError, match=">= 2"):
        ensemble_bundle([b])
    with pytest.raises(ValueError, match=">= 2"):
        stack_params([b.params])
    b5 = dataclasses.replace(_bundle(1), num_classes=5)
    with pytest.raises(ValueError, match="num_classes"):
        ensemble_bundle([b, b5])


def test_cli_spec_loads_ensemble(tmp_path):
    """--fine a.npz,b.npz fuses two serving exports into one ensemble."""
    from runet_tpu.cli import _load_bundle_spec
    from runet_tpu.config import Config, TrainConfig
    from runet_tpu.utils.export import save_params_npz

    cfg = Config(
        model=MC,
        preprocess=PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16)),
        infer=InferConfig(patch_size=(16, 16, 16)),
    )
    paths = []
    for seed in (0, 1):
        b = _bundle(seed)
        p = tmp_path / f"m{seed}.npz"
        save_params_npz(p, b.params, cfg.to_json())
        paths.append(str(p))

    single, _ = _load_bundle_spec(paths[0])
    fused, fused_cfg = _load_bundle_spec(",".join(paths))
    assert fused.num_classes == single.num_classes
    k = jax.tree_util.tree_leaves(fused.params)[0].shape[0]
    assert k == 2
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 16, 1))
    out = fused.apply_fn(fused.params, x)
    assert out.shape == (1, 16, 16, 16, 3)


def test_ensemble_composes_with_tta():
    """TTA over an ensemble == flip-average of the ensemble's mean
    probabilities: softmax(tta(ensemble_apply)) must equal the manual
    two-level average (flip outer, member inner) at bf16 tolerance."""
    from runet_tpu.infer.tta import flip_combinations, make_tta_apply

    b1, b2 = _bundle(0), _bundle(1)
    ens = ensemble_bundle([b1, b2])
    tta_fn = make_tta_apply(ens.apply_fn, (0, 1, 2))
    x = jax.random.normal(jax.random.key(5), (1, 12, 12, 12, 1))

    got = np.asarray(jax.nn.softmax(tta_fn(ens.params, x), -1))

    combos = flip_combinations((1, 2, 3))
    acc = np.zeros_like(got)
    for axes in combos:
        xw = jnp.flip(x, axes) if axes else x
        p = (
            jax.nn.softmax(b1.apply_fn(b1.params, xw).astype(jnp.float32), -1)
            + jax.nn.softmax(b2.apply_fn(b2.params, xw).astype(jnp.float32), -1)
        ) / 2
        acc += np.asarray(jnp.flip(p, axes) if axes else p)
    want = acc / len(combos)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-3)
