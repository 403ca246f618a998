"""Spatial-partition (halo exchange) inference tests on the fake 8-device
CPU mesh (SURVEY.md §2.3 SP row, §4.4)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.parallel import comm
from runet_tpu.parallel.spatial import spatial_shard_forward, spatial_shard_predict


def _mesh(n=4):
    devs = np.asarray(jax.devices()[:n])
    from jax.sharding import Mesh

    return Mesh(devs, (comm.SPACE_AXIS,))


def test_norm_free_conv_stack_exact():
    """A conv stack (no norm): sharded output must EXACTLY equal the
    unsharded forward everywhere further than one receptive field (~17 vox)
    from the global X edges — in particular across every SHARD boundary.
    (Within RF of the global edge, zero-halo vs SAME-padding semantics
    differ once biases map zeros to nonzeros — documented property shared
    with sliding-window inference.)"""
    from flax import linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            # Two levels incl. stride-2 down + transpose up: RF ~ 17 voxels.
            x = nn.Conv(8, (3, 3, 3), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.01)
            x = nn.Conv(8, (3, 3, 3), strides=(2, 2, 2), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.01)
            x = nn.ConvTranspose(8, (2, 2, 2), strides=(2, 2, 2))(x)
            return nn.Conv(3, (1, 1, 1))(x)

    model = Stack()
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(64, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), vol[None])

    def apply_fn(p, x):
        return model.apply(p, x)

    dense = apply_fn(params, vol[None])[0]

    mesh = _mesh(4)
    # halo 16: multiple of 2 (downsample factor), > RF/2.
    out = spatial_shard_forward(apply_fn, params, vol, mesh, halo=16)
    rf = 17
    np.testing.assert_allclose(
        np.asarray(out)[rf:-rf], np.asarray(dense)[rf:-rf], atol=1e-5
    )
    # Shard boundaries are at X = 16, 32, 48 — all inside the compared
    # interior, so halo exchange correctness is fully covered.


def test_unet_with_synced_instance_norm_close():
    """Full U-Net with pmean-synced InstanceNorm: halo voxels perturb the
    moments slightly — predictions must still match the dense forward for
    (nearly) every voxel."""
    cfg = ModelConfig(
        num_classes=3, base_features=8, num_levels=2, compute_dtype="float32",
        spatial_axis=comm.SPACE_AXIS,
    )
    sp_model = UNet3D(cfg)
    dense_model = UNet3D(dataclasses.replace(cfg, spatial_axis=None))
    params = init_params(dense_model, jax.random.key(0), (16, 16, 16))

    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(64, 16, 16, 1)).astype(np.float32))
    dense_labels = jnp.argmax(
        dense_model.apply({"params": params}, vol[None])[0], axis=-1
    )

    mesh = _mesh(4)
    labels = spatial_shard_predict(
        lambda p, x: sp_model.apply({"params": p}, x), params, vol, mesh, halo=8, divisor=2
    )
    # At this toy geometry (local block 16, halo 8) HALF the voxels in each
    # device's norm stats are halo duplicates — worst-case stats distortion.
    # Production geometry (block >=128, halo 32) is far milder; here we
    # assert bulk agreement only.
    agree = (np.asarray(labels) == np.asarray(dense_labels)).mean()
    assert agree > 0.90, f"only {agree:.4f} voxel agreement"


def test_spatial_predict_pads_indivisible():
    cfg = ModelConfig(
        num_classes=2, base_features=4, num_levels=2, compute_dtype="float32",
        spatial_axis=comm.SPACE_AXIS,
    )
    model = UNet3D(cfg)
    params = init_params(
        UNet3D(dataclasses.replace(cfg, spatial_axis=None)), jax.random.key(0), (16, 16, 16)
    )
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(size=(50, 16, 16)).astype(np.float32))  # 50 % 4 != 0
    mesh = _mesh(4)
    labels = spatial_shard_predict(
        lambda p, x: model.apply({"params": p}, x), params, vol, mesh, halo=8, divisor=2
    )
    assert labels.shape == (50, 16, 16)


def test_spatial_forward_rejects_halo_zero():
    mesh = _mesh(2)
    vol = jnp.zeros((8, 4, 4, 1), jnp.float32)
    with pytest.raises(ValueError, match="halo"):
        spatial_shard_forward(lambda p, x: x, {}, vol, mesh, halo=0)
