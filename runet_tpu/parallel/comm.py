"""Mesh + collective helpers — the distributed comms backend (SURVEY.md §2.4).

The reference had no distributed layer at all (single-GPU, provenance
[RECALL]); the rebuild's backend is XLA collectives over ICI, owned by this
module so training code never touches raw collectives:

- ``make_mesh``: build a 1-D (or N-D) ``jax.sharding.Mesh`` over the local
  devices (TPU slice, or fake CPU devices under
  ``--xla_force_host_platform_device_count`` for tests).
- ``make_hybrid_mesh`` + ``init_distributed``: multi-host readiness
  (SURVEY.md §2.4 "DCN via jax.distributed.initialize if ever multi-host") —
  a (dcn × ici) mesh whose outer axis crosses hosts and inner axis rides
  ICI; data-parallel batches shard over BOTH axes so gradient reduction is
  hierarchical (reduce-scatter on ICI first, small cross-DCN step after —
  XLA's partitioner does this given the mesh device order).
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
DCN_AXIS = "dcn"  # across hosts (data-center network)
ICI_AXIS = "ici"  # within a slice (inter-chip interconnect)

_distributed_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper (SURVEY.md §2.4).

    Returns True if a multi-process runtime was initialized (or already
    was), False for the single-process case (no-op). Args default to the
    standard env vars (JAX_COORDINATOR_ADDRESS etc. / TPU metadata) when
    None, matching jax.distributed semantics.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    # CRITICAL: decide WITHOUT touching jax.process_count()/jax.devices() —
    # any such call initializes the XLA backend, after which
    # jax.distributed.initialize() raises (same pre-backend-init pitfall as
    # __graft_entry__._pin_cpu_platform). Single-process is detected from
    # the absence of explicit args AND of the standard env vars.
    import os

    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None and env_coord is None:
        # Nothing to coordinate with: explicit single-process run.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    return True


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


def make_hybrid_mesh(
    n_dcn: int | None = None,
    n_ici: int | None = None,
    devices=None,
) -> Mesh:
    """(dcn × ici) mesh for multi-host DP (SURVEY.md §2.4).

    Device order groups each host's local devices along the inner ``ici``
    axis, so collectives over ``ici`` stay on-slice and only the outer
    ``dcn`` axis crosses the data-center network. Defaults: one dcn row per
    process, all local devices on the ici axis. On a single host this is a
    (1, n) mesh — same program, no DCN traffic.

    Testable on the fake CPU mesh by passing explicit (n_dcn, n_ici).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_dcn is None:
        n_dcn = jax.process_count()
    if n_ici is None:
        n_ici = n // n_dcn
    if n_dcn * n_ici != n:
        raise ValueError(f"mesh ({n_dcn}, {n_ici}) != {n} devices")
    # jax.devices() is sorted by device id, which is NOT guaranteed to group
    # a host's local devices contiguously; sort by (process_index, id) so
    # each ici row really is one host's slice and only the dcn axis crosses
    # the data-center network.
    devices = sorted(
        devices, key=lambda d: (getattr(d, "process_index", 0), d.id)
    )
    dev_array = np.asarray(devices).reshape(n_dcn, n_ici)
    return Mesh(dev_array, (DCN_AXIS, ICI_AXIS))


def data_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes a data-parallel batch shards over: (data,) on the 1-D
    mesh, (dcn, ici) on the hybrid mesh."""
    names = tuple(mesh.axis_names)
    if DATA_AXIS in names:
        return (DATA_AXIS,)
    if DCN_AXIS in names and ICI_AXIS in names:
        return (DCN_AXIS, ICI_AXIS)
    raise ValueError(f"mesh axes {names} have no data-parallel axis")


def batch_spec(mesh: Mesh, ndim: int, batch_axis: int = 0) -> P:
    """PartitionSpec sharding the batch dim over the data axes.

    ``batch_axis=1`` serves (steps, batch, ...) superbatches for the
    multi-step-per-dispatch train path (train/state.py
    ``make_multi_train_step``): the scan consumes axis 0, the batch shards
    over the mesh on axis 1."""
    spec = [None] * ndim
    spec[batch_axis] = data_axes(mesh)
    return P(*spec)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim over the data axes, replicate the rest."""
    return NamedSharding(mesh, batch_spec(mesh, ndim, batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """device_put a pytree of host arrays with batch-dim sharding.

    Multi-process: each host passes its PROCESS-LOCAL batch shard (global
    batch = concat over processes in process order); the returned arrays
    are global. Single-process: plain sharded device_put.
    """
    if jax.process_count() > 1:

        def put(x):
            sh = batch_sharding(mesh, np.ndim(x), batch_axis)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), batch_axis)),
        tree,
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
