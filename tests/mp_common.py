"""Shared model/batch construction for the multi-process DP parity test.

Deterministic: both child processes and the single-process reference build
the identical tiny model, params, and global batch, so loss and the
post-update param checksum must agree to float tolerance regardless of the
process topology (gradient all-reduce correctness end-to-end).
"""

from __future__ import annotations

import jax
import numpy as np

from runet_tpu.config import ModelConfig, TrainConfig
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.parallel import comm
from runet_tpu.train.state import create_train_state, make_train_step

PATCH = (16, 16, 16)
GLOBAL_BATCH = 4


def build_state_and_batch():
    cfg = ModelConfig(
        num_classes=2, base_features=4, num_levels=2, compute_dtype="float32",
        fused_blocks=False,
    )
    tcfg = TrainConfig(
        patch_size=PATCH, batch_size=GLOBAL_BATCH, warmup_steps=0,
        lr=1e-2, lr_schedule="const", weight_decay=0.0, augment=False,
    )
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), PATCH)
    state = create_train_state(model, params, tcfg)

    rng = np.random.default_rng(7)
    images = rng.normal(size=(GLOBAL_BATCH, *PATCH, 1)).astype(np.float16)
    labels = rng.integers(0, 2, size=(GLOBAL_BATCH, *PATCH)).astype(np.uint8)
    return (model, state), images, labels


def run_one_step(mesh, model_state, local_images, local_labels):
    """One DP train step through comm.shard_batch; returns (loss, checksum)."""
    model, state = model_state
    step = make_train_step(model, augment=False)
    state = comm.replicate(mesh, state)
    images, labels = comm.shard_batch(mesh, (local_images, local_labels))
    assert images.shape[0] == GLOBAL_BATCH  # global array, local shard passed
    state, aux = step(state, images, labels)
    loss = float(jax.device_get(aux["loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    return loss, checksum


def build_multi_batch(k: int = 2):
    """Deterministic (K, GLOBAL_BATCH, ...) superbatch for the multi-step
    chunk parity check (train/state.py make_multi_train_step)."""
    rng = np.random.default_rng(9)
    images = rng.normal(size=(k, GLOBAL_BATCH, *PATCH, 1)).astype(np.float16)
    labels = rng.integers(0, 2, size=(k, GLOBAL_BATCH, *PATCH)).astype(np.uint8)
    return images, labels


def run_multi_chunk(mesh, model_state, local_images, local_labels):
    """K micro-steps in one scan dispatch through comm.shard_batch
    batch_axis=1 (the multi-process make_array_from_process_local_data
    branch with a non-leading batch axis); returns (loss, checksum)."""
    from runet_tpu.train.state import make_multi_train_step

    model, state = model_state
    k = local_images.shape[0]
    multi = make_multi_train_step(model, k, augment=False)
    state = comm.replicate(mesh, state)
    images, labels = comm.shard_batch(mesh, (local_images, local_labels), batch_axis=1)
    assert images.shape[1] == GLOBAL_BATCH  # global on the batch axis
    state, aux = multi(state, images, labels)
    loss = float(jax.device_get(aux["loss"]))
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    return loss, checksum
