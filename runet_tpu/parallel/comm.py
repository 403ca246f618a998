"""Mesh + collective helpers — the distributed comms backend (SURVEY.md §2.4).

The reference had no distributed layer at all (single-GPU, provenance
[RECALL]); the rebuild's backend is XLA collectives over ICI, owned by this
module so training code never touches raw collectives:

- ``make_mesh``: build a 1-D (or N-D) ``jax.sharding.Mesh`` over the local
  devices (TPU slice, or fake CPU devices under
  ``--xla_force_host_platform_device_count`` for tests).
- Named axes: ``data`` for DP batch sharding; a future ``space`` axis is
  reserved for spatial partitioning (SURVEY.md §2.3 SP analog).
- Sharding constructors for batches and replicated params.

Under jit, gradient reduction across ``data`` is inserted automatically by
SPMD partitioning (GSPMD); the explicit-psum ``shard_map`` variant lives in
``parallel/dp.py`` and is cross-checked against this in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    num_devices: int | None = None,
    axis_names: tuple[str, ...] = (DATA_AXIS,),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
