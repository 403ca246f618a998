import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig
from runet_tpu.models.norm import InstanceNorm, instance_norm_reference
from runet_tpu.models.unet3d import UNet3D, init_params, level_features


def small_cfg(**kw):
    base = dict(
        num_classes=3,
        base_features=8,
        num_levels=3,
        compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_instance_norm_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(2, 5, 6, 7, 4)).astype(np.float32)
    m = InstanceNorm(affine=False)
    y = m.apply({"params": {}}, jnp.asarray(x))
    # torch is NCDHW
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    tn = torch.nn.InstanceNorm3d(4, eps=1e-5, affine=False)
    yt = np.moveaxis(tn(xt).detach().numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-4)


def test_instance_norm_train_eval_identical():
    # No running stats: the module is a pure function of its input.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    m = InstanceNorm()
    params = m.init(jax.random.key(0), x)
    y1 = m.apply(params, x)
    y2 = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_instance_norm_large_mean_no_nan():
    """Single-pass E[x²]−E[x]² can round negative in f32 when |mean|≫std
    (near-constant channel); rsqrt of a negative variance is NaN. The clamp
    must keep the output finite."""
    x = jnp.full((1, 16, 16, 16, 2), 1.0e4, jnp.float32)
    m = InstanceNorm(affine=False)
    y = m.apply({"params": {}}, x)
    assert np.isfinite(np.asarray(y)).all()
    # Also with a tiny perturbation (realistic near-constant activations).
    rng = np.random.default_rng(3)
    xp = x + jnp.asarray(rng.normal(0, 1e-3, x.shape).astype(np.float32))
    yp = m.apply({"params": {}}, xp)
    assert np.isfinite(np.asarray(yp)).all()


def test_instance_norm_reference_fn():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 5, 2)).astype(np.float32))
    y = instance_norm_reference(x)
    assert np.abs(np.asarray(y).mean(axis=(1, 2, 3))).max() < 1e-5


def test_level_features_cap():
    cfg = ModelConfig(base_features=32, max_features=320, num_levels=6)
    assert level_features(cfg) == [32, 64, 128, 256, 320, 320]


@pytest.mark.parametrize("num_levels", [2, 3])
def test_unet_shapes(num_levels):
    cfg = small_cfg(num_levels=num_levels)
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    x = jnp.zeros((2, 16, 16, 16, 1))
    logits = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert logits.shape == (2, 16, 16, 16, 3)
    assert logits.dtype == jnp.float32


def test_unet_bf16_compute_f32_logits():
    cfg = small_cfg(compute_dtype="bfloat16")
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    x = jnp.ones((1, 8, 8, 8, 1))
    logits = model.apply({"params": params}, x)
    assert logits.dtype == jnp.float32
    # Params stay f32.
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32


def test_unet_fixed_seed_forward_deterministic():
    cfg = small_cfg()
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(42), (8, 8, 8))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 8, 1)), jnp.float32)
    l1 = model.apply({"params": params}, x)
    l2 = model.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_unet_gradients_finite():
    cfg = small_cfg()
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    x = jnp.ones((1, 8, 8, 8, 1))

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
