"""Fused layout-persistent block parity tests (SURVEY.md §4.2: every Pallas
kernel vs its pure-XLA reference, interpret mode on CPU + compiled on TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.kernels import fused_block as fb
from runet_tpu.kernels.fused_block import (
    conv3x3_dchw,
    conv3x3_dhcw,
    conv_in_stats_dchw_batch,
    conv_in_stats_dhcw_batch,
    fused_block_applicable,
    reference_conv3x3_dchw,
    reference_conv3x3_dhcw,
)


def _rand_case(seed=0, D=4, H=8, C=16, Cout=16, W=128, dtype=np.float32):
    rng = np.random.default_rng(seed)
    xp = np.zeros((D + 2, H + 2, C, W), dtype)
    xp[1:-1, 1:-1] = rng.normal(size=(D, H, C, W)).astype(dtype)
    w = (rng.normal(size=(3, 3, 3, C, Cout)) * 0.2).astype(dtype)
    return jnp.asarray(xp), jnp.asarray(w)


def test_conv3x3_dhcw_matches_reference():
    xp, w = _rand_case()
    y, s, q = conv3x3_dhcw(xp, w, True)
    yr, sr, qr = reference_conv3x3_dhcw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=1e-3, rtol=1e-5)


def test_conv3x3_dhcw_w_edges_zero_padded():
    """SAME padding in W comes from in-kernel roll masks — pin the edges."""
    D, H, C, W = 2, 8, 16, 128
    xp = jnp.ones((D + 2, H + 2, C, W), jnp.float32)
    w = jnp.ones((3, 3, 3, C, 16), jnp.float32)
    y, _, _ = conv3x3_dhcw(xp, w, True)
    yr, _, _ = reference_conv3x3_dhcw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-6)
    # Interior fully covered: 27·C; W edge misses a kw plane: 18·C.
    assert np.asarray(y)[1, 4, 0, 64] == pytest.approx(27 * C)
    assert np.asarray(y)[1, 4, 0, 0] == pytest.approx(18 * C)
    assert np.asarray(y)[1, 4, 0, W - 1] == pytest.approx(18 * C)


def test_conv3x3_dhcw_grads_match_reference():
    """custom_vjp (pallas dx + XLA dw + stats-cotangent folding) vs XLA
    autodiff of the reference — including gradient flow through Σy/Σy²."""
    xp, w = _rand_case(seed=1, D=2, H=8, C=16, Cout=16)
    gcoef = jnp.asarray(
        np.random.default_rng(2).normal(size=(16,)).astype(np.float32)
    )

    def loss_fused(xp, w):
        y, s, q = conv3x3_dhcw(xp, w, True)
        return (
            jnp.sum(y**2) * 1e-2 + jnp.sum(s * gcoef) + jnp.sum(q * gcoef) * 1e-2
        )

    def loss_ref(xp, w):
        y, s, q = reference_conv3x3_dhcw(xp, w)
        return (
            jnp.sum(y**2) * 1e-2 + jnp.sum(s * gcoef) + jnp.sum(q * gcoef) * 1e-2
        )

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(xp, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(xp, w)
    # Interior input grads match; pad rows of the fused dx are zeros by
    # construction (they are sliced off by the caller's pad transpose).
    np.testing.assert_allclose(
        np.asarray(gx_f)[1:-1, 1:-1], np.asarray(gx_r)[1:-1, 1:-1],
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=2e-3, rtol=1e-4)


def test_conv_in_stats_batch_pads_channels():
    """Cin=1 (the network input) is zero-padded to 16 — results exact."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 1, 128)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 3, 1, 24)) * 0.3).astype(np.float32))
    y, mean, sqm = conv_in_stats_dhcw_batch(x, k, interpret=True)
    assert y.shape == (2, 4, 8, 24, 128)
    assert mean.shape == (2, 24) and sqm.shape == (2, 24)
    for b in range(2):
        xp = jnp.pad(x[b], ((1, 1), (1, 1), (0, 0), (0, 0)))
        yr, sr, qr = reference_conv3x3_dhcw(
            jnp.pad(xp, [(0, 0), (0, 0), (0, 15), (0, 0)]),
            jnp.pad(k, [(0, 0)] * 3 + [(0, 15), (0, 0)]),
        )
        np.testing.assert_allclose(
            np.asarray(y[b]), np.asarray(yr)[:, :, :24], atol=2e-5, rtol=1e-5
        )
        n = 4 * 8 * 128
        np.testing.assert_allclose(np.asarray(mean[b]), np.asarray(sr)[:24] / n, atol=1e-5)


def test_applicability_gate():
    assert not fused_block_applicable((1, 4, 8, 64, 16))  # W%128
    assert not fused_block_applicable((1, 3, 8, 128, 16))  # D%2
    # Shape fits; backend decides (CPU test env → False unless forced).
    ok_shape = (1, 4, 8, 128, 16)
    if jax.default_backend() == "tpu":
        assert fused_block_applicable(ok_shape)
    else:
        assert not fused_block_applicable(ok_shape)
        fb.FORCE_INTERPRET = True
        try:
            assert fused_block_applicable(ok_shape)
        finally:
            fb.FORCE_INTERPRET = False


@pytest.mark.parametrize("version", ["v1", "v2", "v2m"])
def test_unet_fused_matches_xla_forward(version):
    """Model-level parity: fused blocks ON (interpret) == XLA path, same
    params; and the param tree is identical (checkpoint-stable)."""
    from runet_tpu.config import ModelConfig
    from runet_tpu.models.unet3d import UNet3D, init_params

    cfg_x = ModelConfig(
        num_classes=2, base_features=16, num_levels=2,
        compute_dtype="float32", fused_blocks=False,
    )
    cfg_f = ModelConfig(
        num_classes=2, base_features=16, num_levels=2,
        compute_dtype="float32", fused_blocks=True, fused_kernel=version,
    )
    model_x, model_f = UNet3D(cfg_x), UNet3D(cfg_f)
    params = init_params(model_x, jax.random.key(0), (4, 8, 128))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 128, 1)).astype(np.float32))

    out_x = model_x.apply({"params": params}, x)
    fb.FORCE_INTERPRET = True
    try:
        params_f = init_params(model_f, jax.random.key(0), (4, 8, 128))
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
        out_f = model_f.apply({"params": params}, x)
    finally:
        fb.FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=5e-4, rtol=1e-4
    )


def test_create_train_model_fused_gating():
    """Fused Pallas blocks are ON in the train step by default since round 3
    (Pallas dw kernel flipped the A/B, ModelConfig.fused_blocks_train);
    setting fused_blocks_train=False gates the step back to pure XLA."""
    from runet_tpu.config import ModelConfig
    from runet_tpu.models.unet3d import create_train_model

    import dataclasses

    cfg = ModelConfig(num_classes=2, fused_blocks=True)
    assert cfg.fused_blocks_train is True
    assert create_train_model(cfg).cfg.fused_blocks is True
    cfg_opt = dataclasses.replace(cfg, fused_blocks_train=False)
    assert create_train_model(cfg_opt).cfg.fused_blocks is False
    cfg_off = dataclasses.replace(cfg, fused_blocks=False)
    assert create_train_model(cfg_off).cfg.fused_blocks is False


@pytest.mark.parametrize("version", ["v1", "v2", "v2m"])
def test_unet_fused_grads_finite_and_close(version):
    """Train-step-shaped gradient through the fused model ≈ XLA gradients."""
    from runet_tpu.config import ModelConfig
    from runet_tpu.models.unet3d import UNet3D, init_params

    mk = lambda fused: ModelConfig(
        num_classes=2, base_features=16, num_levels=2,
        compute_dtype="float32", fused_blocks=fused, fused_kernel=version,
    )
    model_x, model_f = UNet3D(mk(False)), UNet3D(mk(True))
    params = init_params(model_x, jax.random.key(1), (4, 8, 128))
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 128, 1)).astype(np.float32))

    def loss(model):
        def f(p):
            logits = model.apply({"params": p}, x)
            return jnp.mean(logits**2)
        return f

    gx = jax.grad(loss(model_x))(params)
    fb.FORCE_INTERPRET = True
    try:
        gf = jax.grad(loss(model_f))(params)
    finally:
        fb.FORCE_INTERPRET = False
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3)


def test_applicability_checks_vmem_feasibility():
    """Shapes whose tiling can't fit VMEM must fall back to XLA, not raise
    at trace time (level-0 decoder at big W, e.g. (160,192,C=64,W=512))."""
    fb.FORCE_INTERPRET = True
    try:
        # C=64 at W=512: slab+col exceed the 10MB bound for every tile
        # config only if RH fallback also fails; assert consistency instead:
        # applicable implies _pick_tiles succeeds.
        for shape, feats in (
            ((1, 160, 192, 512, 64), 64),
            ((1, 4, 8, 128, 16), 16),
            ((1, 128, 128, 1024, 32), 32),
        ):
            ok = fb.fused_block_applicable(shape, feats)
            if ok:
                _, D, H, W, C = shape
                fb._pick_tiles(D, H, fb._ceil16(max(C, feats)), W, 2)
    finally:
        fb.FORCE_INTERPRET = False


def test_pick_tiles_rh_fallback_extends_feasibility():
    """Large C*W geometries fit via a smaller RH instead of raising."""
    TD, TH, RH = fb._pick_tiles(160, 192, 64, 512, 2)
    assert 160 % TD == 0 and 192 % TH == 0 and TH % RH == 0
    slab = 3 * (TD + 2) * (TH + 2) * 64 * 512 * 2
    col = 27 * 64 * RH * 512 * 2
    assert slab + col <= 10 * 1024 * 1024


# --------------------------- v2 kernel (dchw) ---------------------------


def _rand_case_v2(seed=0, D=4, H=8, C=16, Cout=16, W=128, dtype=np.float32):
    rng = np.random.default_rng(seed)
    xp = np.zeros((D + 2, C, H + 2, W), dtype)
    xp[1:-1, :, 1:-1] = rng.normal(size=(D, C, H, W)).astype(dtype)
    w = (rng.normal(size=(3, 3, 3, C, Cout)) * 0.2).astype(dtype)
    return jnp.asarray(xp), jnp.asarray(w)


def test_conv3x3_dchw_matches_reference():
    xp, w = _rand_case_v2()
    y, s, q = conv3x3_dchw(xp, w, True)
    yr, sr, qr = reference_conv3x3_dchw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=1e-3, rtol=1e-5)


def test_conv3x3_dchw_w_edges_zero_padded():
    """v2's roll crosses H rows in the flattened lane dim; the SAME-padding
    mask must still zero exactly the per-W-row wrapped lanes."""
    D, H, C, W = 2, 8, 16, 128
    xp = jnp.ones((D + 2, C, H + 2, W), jnp.float32)
    w = jnp.ones((3, 3, 3, C, 16), jnp.float32)
    y, _, _ = conv3x3_dchw(xp, w, True)
    yr, _, _ = reference_conv3x3_dchw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-6)
    assert np.asarray(y)[1, 0, 4, 64] == pytest.approx(27 * C)
    assert np.asarray(y)[1, 0, 4, 0] == pytest.approx(18 * C)
    assert np.asarray(y)[1, 0, 4, W - 1] == pytest.approx(18 * C)


def test_conv3x3_dchw_grads_match_reference():
    xp, w = _rand_case_v2(seed=1, D=2, H=8, C=16, Cout=16)
    gcoef = jnp.asarray(
        np.random.default_rng(2).normal(size=(16,)).astype(np.float32)
    )

    def loss_fused(xp, w):
        y, s, q = conv3x3_dchw(xp, w, True)
        return jnp.sum(y**2) + jnp.sum(s * gcoef) + jnp.sum(q * gcoef**2)

    def loss_ref(xp, w):
        y, s, q = reference_conv3x3_dchw(xp, w)
        return jnp.sum(y**2) + jnp.sum(s * gcoef) + jnp.sum(q * gcoef**2)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(xp, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(
        np.asarray(gx)[1:-1, :, 1:-1], np.asarray(rx)[1:-1, :, 1:-1],
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-2, rtol=1e-3)


def test_conv_in_stats_dchw_batch_pads_channels():
    """Non-multiple-of-16 channels are zero-padded exactly (v2 wrapper)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 20, 8, 128)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 3, 20, 24)) * 0.2).astype(np.float32))
    y, m, sq = conv_in_stats_dchw_batch(x, k, interpret=True)
    assert y.shape == (2, 4, 24, 8, 128)
    assert m.shape == sq.shape == (2, 24)
    for b in range(2):
        xp = jnp.pad(x[b], ((1, 1), (0, 0), (1, 1), (0, 0)))
        yr, sr, qr = reference_conv3x3_dchw(xp, k)
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(yr), atol=2e-5, rtol=1e-5)
        n = 4 * 8 * 128
        np.testing.assert_allclose(np.asarray(m[b]), np.asarray(sr) / n, atol=1e-5)


@pytest.mark.parametrize("dims", [(4, 16, 16, 24, 128), (2, 32, 8, 16, 64)])
def test_conv3x3_dchw_dw_kernel_matches_oracle(dims):
    """The dedicated dw kernel (tap contractions over RH·W lanes) must match
    the vjp of the XLA oracle — including at W=64 half-vreg offsets and
    rectangular C≠Cout."""
    from runet_tpu.kernels.fused_block import conv3x3_dchw_dw

    D, C, H, Cout, W = dims
    rng = np.random.default_rng(7)
    xp = np.zeros((D + 2, C, H + 2, W), np.float32)
    xp[1:-1, :, 1:-1] = rng.normal(size=(D, C, H, W))
    xp = jnp.asarray(xp)
    g = jnp.asarray(rng.normal(size=(D, Cout, H, W)).astype(np.float32))
    w0 = jnp.zeros((3, 3, 3, C, Cout), jnp.float32)
    _, vjp_fn = jax.vjp(lambda wv: reference_conv3x3_dchw(xp, wv)[0], w0)
    (ref,) = vjp_fn(g)
    got = conv3x3_dchw_dw(xp, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-4)


# ---- v2m (M-packed tap GEMMs) ----


def _m_case(seed=0, D=4, H=8, C=16, Cout=16, W=128, dtype=np.float32):
    rng = np.random.default_rng(seed)
    xp = np.zeros((D + 2, C, H + 2, W), dtype)
    xp[1:-1, :, 1:-1] = rng.normal(size=(D, C, H, W)).astype(dtype)
    w = (rng.normal(size=(3, 3, 3, C, Cout)) * 0.2).astype(dtype)
    return jnp.asarray(xp), jnp.asarray(w)


@pytest.mark.parametrize(
    "dims",
    [
        (4, 8, 16, 16, 128),   # level-0-like
        (2, 8, 32, 32, 64),    # W=64 half-vreg slices
        (2, 16, 16, 32, 128),  # Cout != C
    ],
)
def test_conv3x3_dchw_m_matches_reference(dims):
    from runet_tpu.kernels.fused_block import conv3x3_dchw_m

    D, H, C, Cout, W = dims
    xp, w = _m_case(seed=D + W, D=D, H=H, C=C, Cout=Cout, W=W)
    y, s, q = conv3x3_dchw_m(xp, w, True)
    yr, sr, qr = reference_conv3x3_dchw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=1e-3, rtol=1e-5)


def test_conv3x3_dchw_m_w_edges_zero_padded():
    """The v2m kw shifts happen on the GEMM RESULT (post-GEMM roll+mask);
    the per-W-row boundary lanes must still see exact SAME zero padding."""
    from runet_tpu.kernels.fused_block import conv3x3_dchw_m

    D, H, C, W = 2, 8, 16, 128
    xp = jnp.ones((D + 2, C, H + 2, W), jnp.float32)
    w = jnp.ones((3, 3, 3, C, 16), jnp.float32)
    y, _, _ = conv3x3_dchw_m(xp, w, True)
    yr, _, _ = reference_conv3x3_dchw(xp, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-6)
    assert np.asarray(y)[1, 0, 4, 64] == pytest.approx(27 * C)
    assert np.asarray(y)[1, 0, 4, 0] == pytest.approx(18 * C)
    assert np.asarray(y)[1, 0, 4, W - 1] == pytest.approx(18 * C)


def test_conv3x3_dchw_m_grads_match_reference():
    from runet_tpu.kernels.fused_block import conv3x3_dchw_m

    xp, w = _m_case(seed=1, D=2, H=8, C=16, Cout=16)
    gcoef = jnp.asarray(
        np.random.default_rng(2).normal(size=(16,)).astype(np.float32)
    )

    def loss_fused(xp, w):
        y, s, q = conv3x3_dchw_m(xp, w, True)
        return jnp.sum(y**2) + jnp.sum(s * gcoef) + jnp.sum(q * gcoef**2)

    def loss_ref(xp, w):
        y, s, q = reference_conv3x3_dchw(xp, w)
        return jnp.sum(y**2) + jnp.sum(s * gcoef) + jnp.sum(q * gcoef**2)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(xp, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(
        np.asarray(gx)[1:-1, :, 1:-1], np.asarray(rx)[1:-1, :, 1:-1],
        atol=1e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-2, rtol=1e-3)


def test_conv_in_stats_dchw_batch_v2m_dispatch():
    """The batch wrapper's version switch routes to the M-packed kernel and
    keeps the channel-padding contract."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 20, 8, 128)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 3, 20, 24)) * 0.2).astype(np.float32))
    y, m, sq = conv_in_stats_dchw_batch(x, k, interpret=True, version="v2m")
    xp = jnp.pad(x[0], ((1, 1), (0, 0), (1, 1), (0, 0)))
    yr, sr, qr = reference_conv3x3_dchw(xp, k)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(yr), atol=2e-5, rtol=1e-5)
    n = 4 * 8 * 128
    np.testing.assert_allclose(np.asarray(m[0]), np.asarray(sr) / n, atol=1e-5)
