"""Attic conv3d kernel parity (SURVEY.md §4.2; kernels/attic/__init__.py).

The per-conv im2col kernel was superseded by the fused blocks but its
measurements stay reproducible: interpret-mode parity on CPU here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.kernels.attic.conv3d import (
    conv3x3x3_same,
    pallas_conv3x3,
    pallas_conv_applicable,
    pallas_conv_shape_ok,
    reference_conv3x3x3,
)


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
    import runet_tpu.kernels.attic.conv3d as k

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
