"""Spatial-partition inference — halo-exchange sharding (SURVEY.md §2.3
"SP/CP" row, §5.7 stretch goal).

The conv-net analog of context parallelism: the volume's leading spatial
axis is sharded over the ``space`` mesh axis; each device exchanges a halo
with its neighbors via ``jax.lax.ppermute`` (rides ICI), runs the fully
convolutional net on halo-extended local blocks, and crops the halo from its
output. One all-to-nothing collective pattern, no host involvement.

Exactness: with a halo that is (a) ≥ the model's half receptive field and
(b) a multiple of 2^(levels-1) (so strided-conv grids align), every voxel
further than one receptive field from the GLOBAL volume boundary matches the
unsharded forward exactly for bias-free/norm-free nets (tested on the fake
8-device CPU mesh). Voxels within RF of the global edge see a zero halo
where the dense net sees its own SAME padding — once a bias or norm layer
maps zeros to nonzeros these differ; sliding-window inference has the same
property at window edges. (Clinically the outer slices are air.) With
InstanceNorm, set ``ModelConfig.spatial_axis`` so norms ``pmean`` their
moments over the mesh axis; halo voxels then perturb the moments slightly —
the second documented approximation (immaterial at halo ≪ block size).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from runet_tpu.parallel.comm import SPACE_AXIS


def _exchange_halos(x_local: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """x_local: (Xl, Y, Z, C) -> (Xl + 2*halo, Y, Z, C).

    Interior boundaries receive neighbor data; global edges receive zeros
    (the unsharded SAME-padding semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    send_right = x_local[-halo:]
    send_left = x_local[:halo]
    from_left = jax.lax.ppermute(
        send_right, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        send_left, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    # Devices without a partner must see ZERO halos (the unsharded SAME
    # padding semantics) — ppermute leaves missing deliveries undefined.
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=0)


def spatial_shard_forward(
    apply_fn,
    params,
    volume: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    axis_name: str = SPACE_AXIS,
):
    """Run one fully-convolutional forward over a spatially sharded volume.

    volume: (X, Y, Z, C) with X divisible by the mesh's ``axis_name`` size;
    halo: multiple of the model's total downsampling factor.
    Returns logits (X, Y, Z, K) with the same sharding.
    """
    if volume.ndim != 4:
        raise ValueError(f"expected (X, Y, Z, C), got {volume.shape}")
    if halo < 1:
        # halo=0 would send full shards (x[-0:] == x) and crop to empty
        # (logits[0:0]) — reject rather than silently corrupt.
        raise ValueError(f"halo must be >= 1, got {halo}")
    n = mesh.shape[axis_name]
    if volume.shape[0] % n != 0:
        raise ValueError(f"X={volume.shape[0]} not divisible by {n} devices")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    def run(params, x_local):
        x = _exchange_halos(x_local, halo, axis_name)
        logits = apply_fn(params, x[None])[0]
        return logits[halo:-halo]

    vol_sharded = jax.device_put(volume, NamedSharding(mesh, P(axis_name)))
    return jax.jit(run)(params, vol_sharded)


def spatial_shard_predict(
    apply_fn,
    params,
    volume,
    mesh: Mesh,
    halo: int,
    axis_name: str = SPACE_AXIS,
    divisor: int = 32,
) -> jnp.ndarray:
    """Whole-volume single-pass prediction across the mesh; returns uint8
    labels shaped like the input (pads X up to divisibility internally).

    ``divisor``: the model's total downsampling factor — local blocks are
    padded so each is a multiple of it."""
    vol = jnp.asarray(volume)
    if vol.ndim == 3:
        vol = vol[..., None]
    n = mesh.shape[axis_name]
    X = vol.shape[0]
    unit = n * divisor
    Xp = -(-X // unit) * unit
    if Xp != X:
        vol = jnp.pad(vol, [(0, Xp - X), (0, 0), (0, 0), (0, 0)])
    logits = spatial_shard_forward(apply_fn, params, vol, mesh, halo, axis_name)
    labels = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.uint8)
    return labels[:X]
