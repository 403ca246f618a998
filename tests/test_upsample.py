"""Pixelshuffle upsampling equivalence with ConvTranspose(k=2, s=2)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from runet_tpu.config import ModelConfig
from runet_tpu.models.unet3d import UNet3D, depth_to_space_3d, init_params


def test_depth_to_space_layout():
    # Voxel (d, h, w) block (a, b, c) channel f must land at (2d+a, 2h+b, 2w+c, f).
    B, D, H, W, F = 1, 2, 2, 2, 3
    x = np.arange(B * D * H * W * 8 * F, dtype=np.float32).reshape(B, D, H, W, 8 * F)
    y = np.asarray(depth_to_space_3d(jnp.asarray(x), 2))
    assert y.shape == (1, 4, 4, 4, 3)
    for d in range(D):
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    block_idx = (a * 2 + b) * 2 + c
                    np.testing.assert_array_equal(
                        y[0, 2 * d + a, 0 + b, 0 + c],
                        x[0, d, 0, 0, block_idx * F : (block_idx + 1) * F],
                    )


def test_pixelshuffle_equals_convtranspose_with_mapped_weights():
    """ConvTranspose(k=2,s=2): out[2i+a,2j+b,2k+c,o] = Σ_ci x[i,j,k,ci]·W[a,b,c,ci,o].
    The 1x1-conv weight W2[ci, (a,b,c,o)] realizes the identical map."""
    rng = np.random.default_rng(0)
    Cin, F = 5, 4
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 5, Cin)).astype(np.float32))

    W = rng.normal(size=(2, 2, 2, Cin, F)).astype(np.float32)
    ct = nn.ConvTranspose(F, (2, 2, 2), strides=(2, 2, 2), use_bias=False)
    y_ct = ct.apply({"params": {"kernel": jnp.asarray(W)}}, x)

    # flax ConvTranspose flips the kernel (verified empirically):
    # out[2i+a,...] uses W[1-a,1-b,1-c]. Map with the flip.
    Wf = W[::-1, ::-1, ::-1]
    W2 = np.transpose(Wf, (3, 0, 1, 2, 4)).reshape(Cin, 8 * F)[None, None, None]
    conv = nn.Conv(8 * F, (1, 1, 1), use_bias=False)
    y_ps = depth_to_space_3d(
        conv.apply({"params": {"kernel": jnp.asarray(W2)}}, x), 2
    )
    np.testing.assert_allclose(np.asarray(y_ps), np.asarray(y_ct), atol=1e-5)


def test_unet_both_upsample_modes_run():
    for mode in ("pixelshuffle", "convtranspose"):
        cfg = ModelConfig(
            num_classes=2, base_features=4, num_levels=2,
            compute_dtype="float32", upsample_mode=mode,
        )
        model = UNet3D(cfg)
        params = init_params(model, jax.random.key(0), (8, 8, 8))
        out = model.apply({"params": params}, jnp.ones((1, 8, 8, 8, 1)))
        assert out.shape == (1, 8, 8, 8, 2)


def test_depth_to_space_dchw_matches_ndhwc():
    """The DCHW-layout rearrange (whole-net layout persistence) must use the
    SAME channel->sub-voxel assignment as the NDHWC version, or pixelshuffle
    checkpoints would decode garbage after the round-4 layout rework."""
    from runet_tpu.models.unet3d import depth_to_space_dchw

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 5, 16)).astype(np.float32)  # NDHWC, C=2^3*2
    want = np.asarray(depth_to_space_3d(jnp.asarray(x), 2))
    x_dchw = jnp.asarray(x.transpose(0, 1, 4, 2, 3))
    got = np.asarray(depth_to_space_dchw(x_dchw, 2))
    np.testing.assert_array_equal(got.transpose(0, 1, 3, 4, 2), want)
