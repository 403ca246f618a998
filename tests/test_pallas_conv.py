"""Pallas conv3d kernel parity + integration (SURVEY.md §4.2).

Interpret mode on CPU here; the compiled-on-TPU parity is exercised by the
verify drives and bench (measured 1.4x over XLA at the level-0 geometry).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig
from runet_tpu.kernels.conv3d import (
    conv3x3x3_same,
    pallas_conv3x3,
    pallas_conv_applicable,
    pallas_conv_shape_ok,
    reference_conv3x3x3,
)
from runet_tpu.models.unet3d import UNet3D, init_params


@pytest.mark.parametrize("shape,cout", [((4, 16, 128, 16), 24), ((2, 8, 128, 8), 8)])
def test_kernel_parity_interpret(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout)).astype(np.float32) * 0.1)
    got = conv3x3x3_same(x, w, interpret=True)
    want = reference_conv3x3x3(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_applicability_gate():
    assert pallas_conv_shape_ok((1, 128, 128, 128, 32), 32)
    assert not pallas_conv_shape_ok((1, 128, 128, 96, 32), 32)  # W % 128
    assert not pallas_conv_shape_ok((1, 127, 128, 128, 32), 32)  # D % 2
    assert not pallas_conv_shape_ok((1, 128, 128, 128, 4), 4)  # C % 8
    # Backend gate: CPU test env must fall back to XLA even on good shapes.
    import jax

    if jax.default_backend() != "tpu":
        assert not pallas_conv_applicable((1, 128, 128, 128, 32), 32)


def test_custom_vjp_grads_match_xla(monkeypatch):
    # Route the kernel through interpret mode (CPU test env).
    import runet_tpu.kernels.conv3d as k

    orig = conv3x3x3_same
    monkeypatch.setattr(
        k, "conv3x3x3_same", lambda x, w, interpret=True: orig(x, w, interpret=True)
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 128, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32) * 0.1)

    def loss_pallas(x, w):
        return jnp.sum(k.pallas_conv3x3(x, w) ** 2)

    def loss_ref(x, w):
        return jnp.sum(reference_conv3x3x3(x, w) ** 2)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3)


def test_model_flag_parity():
    """Same params, flag on vs off -> same logits (Pallas path active only
    where shapes allow; here W=128 activates it)."""
    import runet_tpu.kernels.conv3d as k

    # Route the flagged path through interpret mode on CPU.
    orig = k.conv3x3x3_same
    orig_app = k.pallas_conv_applicable
    k_interp = lambda x, w, interpret=True: orig(x, w, interpret=True)
    try:
        k.conv3x3x3_same = k_interp
        k.pallas_conv_applicable = k.pallas_conv_shape_ok  # bypass TPU gate

        base = dict(
            num_classes=2, base_features=8, num_levels=2, compute_dtype="float32"
        )
        m_off = UNet3D(ModelConfig(**base, use_pallas_conv=False))
        m_on = UNet3D(ModelConfig(**base, use_pallas_conv=True))
        params = init_params(m_off, jax.random.key(0), (4, 8, 128))
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 4, 8, 128, 1)), jnp.float32
        )
        out_off = m_off.apply({"params": params}, x)
        out_on = m_on.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out_on), np.asarray(out_off), atol=2e-3
        )
    finally:
        k.conv3x3x3_same = orig
        k.pallas_conv_applicable = orig_app
