"""Deep supervision (ModelConfig.deep_supervision): aux heads, multi-scale
loss, train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from runet_tpu.config import ModelConfig, TrainConfig
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.train.losses import deep_supervised_loss, dice_ce_loss
from runet_tpu.train.state import create_train_state, make_train_step


def _model(ds: bool, levels: int = 4):
    cfg = ModelConfig(
        num_classes=3, base_features=4, num_levels=levels,
        compute_dtype="float32", deep_supervision=ds,
    )
    return UNet3D(cfg)


def test_param_tree_gains_only_aux_heads():
    m_off, m_on = _model(False), _model(True)
    p_off = init_params(m_off, jax.random.key(0), (16, 16, 16))
    p_on = init_params(m_on, jax.random.key(0), (16, 16, 16))
    extra = set(p_on) - set(p_off)
    assert extra == {"ds1", "ds2"}
    assert set(p_off) - set(p_on) == set()
    # head shapes: (1,1,1,C_lvl,K)
    assert p_on["ds1"]["kernel"].shape[-1] == 3
    assert p_on["ds2"]["kernel"].shape[-1] == 3


def test_default_call_returns_plain_logits_deep_call_returns_aux():
    m = _model(True)
    p = init_params(m, jax.random.key(0), (16, 16, 16))
    x = jnp.zeros((1, 16, 16, 16, 1))
    out = m.apply({"params": p}, x)
    assert out.shape == (1, 16, 16, 16, 3)  # inference surface unchanged
    logits, aux = m.apply({"params": p}, x, deep_outputs=True)
    assert logits.shape == (1, 16, 16, 16, 3)
    assert [a.shape for a in aux] == [(1, 8, 8, 8, 3), (1, 4, 4, 4, 3)]


def test_shallow_model_has_no_aux():
    m = _model(True, levels=2)
    p = init_params(m, jax.random.key(0), (16, 16, 16))
    assert "ds1" not in p
    logits, aux = m.apply(
        {"params": p}, jnp.zeros((1, 16, 16, 16, 1)), deep_outputs=True
    )
    assert aux == []


def test_ds_loss_reduces_to_plain_without_aux():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32))
    plain, _ = dice_ce_loss(logits, labels)
    ds, _ = deep_supervised_loss(logits, [], labels)
    np.testing.assert_allclose(float(ds), float(plain), rtol=1e-6)


def test_ds_loss_weights_and_label_downsampling():
    """Perfect predictions at every scale -> near-zero loss; corrupting only
    the stride-2 aux raises it by exactly the (1/2)/1.75 share."""
    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 8)).astype(np.int32))

    def hot(lab):
        return 20.0 * jax.nn.one_hot(lab, 3, dtype=jnp.float32)

    l_full = hot(labels)
    l_s2 = hot(labels[:, ::2, ::2, ::2])
    l_s4 = hot(labels[:, ::4, ::4, ::4])
    good, _ = deep_supervised_loss(l_full, [l_s2, l_s4], labels)
    assert float(good) < 1e-3

    bad_s2, _ = deep_supervised_loss(l_full, [-l_s2, l_s4], labels)
    plain_bad, _ = dice_ce_loss(-l_s2, labels[:, ::2, ::2, ::2])
    np.testing.assert_allclose(
        float(bad_s2), float(plain_bad) * 0.5 / 1.75, rtol=1e-3, atol=1e-3
    )


def test_ds_train_step_updates_aux_heads():
    m = _model(True)
    params = init_params(m, jax.random.key(0), (16, 16, 16))
    tcfg = TrainConfig(patch_size=(16, 16, 16), batch_size=1, warmup_steps=0, lr=1e-2)
    state = create_train_state(m, params, tcfg)
    before = np.asarray(state.params["ds1"]["kernel"]).copy()
    step = make_train_step(m)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, size=(1, 16, 16, 16)).astype(np.int32))
    state, aux = step(state, img, lab)
    assert np.isfinite(float(aux["loss"]))
    after = np.asarray(state.params["ds1"]["kernel"])
    assert not np.allclose(before, after)  # grads reach the aux head


def test_ds_checkpoint_stable_between_train_and_serving_models():
    from runet_tpu.models.unet3d import create_model, create_train_model

    cfg = ModelConfig(
        num_classes=3, base_features=4, num_levels=3,
        compute_dtype="float32", deep_supervision=True,
    )
    p_train = init_params(create_train_model(cfg), jax.random.key(0), (16, 16, 16))
    p_serve = init_params(create_model(cfg), jax.random.key(0), (16, 16, 16))
    t1 = jax.tree_util.tree_structure(p_train)
    t2 = jax.tree_util.tree_structure(p_serve)
    assert t1 == t2
