"""Parity tests for the fused stride-2 downsample kernel
(kernels/strided_conv.py) — interpret mode on CPU vs the XLA strided conv
oracle, the custom_vjp vs XLA autodiff, and the applicability gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.kernels.strided_conv import (
    _conv3x3_s2_impl,
    _pick_tiles_s2,
    conv3x3_s2_applicable,
    conv_s2_stats_dchw_batch,
)


def _xla_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), "SAME", dimension_numbers=("NDCHW", "DHWIO", "NDCHW")
    )


@pytest.mark.parametrize(
    "dims",
    [(8, 16, 8, 128, 16), (4, 32, 8, 128, 64), (16, 16, 4, 256, 32)],
)
def test_s2_kernel_matches_xla(dims):
    D, C, H, W, Cout = dims
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, D, C, H, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, Cout)) * 0.1, jnp.float32)
    ref = _xla_s2(x, w)[0]
    xp = jnp.pad(x[0], ((0, 1), (0, 0), (0, 1), (0, 0)))
    y, sums, sqs = _conv3x3_s2_impl(xp, w, interpret=True)
    assert y.shape == (D // 2, Cout, H // 2, W // 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-4)
    reff = np.asarray(ref, np.float32)
    np.testing.assert_allclose(
        np.asarray(sums), reff.sum(axis=(0, 2, 3)), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(sqs), (reff * reff).sum(axis=(0, 2, 3)), rtol=1e-4, atol=1e-2
    )


def test_s2_batch_wrapper_pads_channels():
    # C=8 and Cout=24 are not multiples of 16; the wrapper zero-pads both.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 24)) * 0.1, jnp.float32)
    y, mean, sqm = conv_s2_stats_dchw_batch(x, w, interpret=True)
    ref = _xla_s2(x, w)
    assert y.shape == (1, 2, 24, 2, 64)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-4)
    n = 2 * 2 * 64
    np.testing.assert_allclose(
        np.asarray(mean),
        np.asarray(ref, np.float32).sum(axis=(1, 3, 4)) / n,
        rtol=1e-4, atol=1e-4,
    )


def test_s2_custom_vjp_matches_xla_grads():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 16)) * 0.1, jnp.float32)

    def loss_p(xx, ww):
        y, m, sq = conv_s2_stats_dchw_batch(xx, ww, interpret=True)
        return (y.astype(jnp.float32) ** 2).sum() + m.sum() + sq.sum()

    def loss_x(xx, ww):
        yf = _xla_s2(xx, ww).astype(jnp.float32)
        n = yf.shape[1] * yf.shape[3] * yf.shape[4]
        return (
            (yf ** 2).sum()
            + (yf.sum(axis=(1, 3, 4)) / n).sum()
            + ((yf * yf).sum(axis=(1, 3, 4)) / n).sum()
        )

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gx):
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 2e-4, rel


def test_s2_applicability_gate():
    from runet_tpu.kernels import fused_block as fb

    orig = fb.FORCE_INTERPRET
    fb.FORCE_INTERPRET = True
    try:
        assert conv3x3_s2_applicable((1, 128, 32, 128, 128), 64)
        assert not conv3x3_s2_applicable((2, 128, 32, 128, 128), 64)  # B>1
        assert not conv3x3_s2_applicable((1, 127, 32, 128, 128), 64)  # odd D
        assert not conv3x3_s2_applicable((1, 128, 32, 128, 64), 64)  # W%128
        assert not conv3x3_s2_applicable((1, 128, 32, 128, 128), 24)  # C%16
    finally:
        fb.FORCE_INTERPRET = orig
    # (1, 1) always divides, so the picker succeeds for any positive dims.
    assert _pick_tiles_s2(3, 5, 32, 128, 2) == (1, 1)


def test_s2_tile_picker_vmem_bound():
    for (D2, H2, C, W) in ((64, 64, 32, 128), (80, 96, 32, 256), (32, 32, 64, 128)):
        TD, TH = _pick_tiles_s2(D2, H2, C, W, 2)
        slab_b = (2 * TD + 1) * C * (2 * TH + 1) * W * 2
        assert 2 * slab_b <= 6 * 1024 * 1024
        assert D2 % TD == 0 and H2 % TH == 0
