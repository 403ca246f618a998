"""Explicit shard_map data-parallel train step (SURVEY.md §2.3 DP row).

BASELINE config 5: "Data-parallel training over full KiTS19 via pmap across a
v5e slice". This is the modern equivalent: ``shard_map`` over the ``data``
mesh axis with explicit ``lax.pmean`` gradient reduction riding ICI. The
GSPMD path (train/state.py) and this one are asserted to produce identical
grads in tests/test_parallel.py (SURVEY.md §4.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from runet_tpu.parallel.comm import data_axes
from runet_tpu.train.losses import dice_ce_loss


def make_dp_train_step(model, mesh: Mesh, include_background_dice: bool = False):
    """Returns a jitted step: (state, images(B,...), labels(B,...)) -> state, aux.

    Per-device: local grads on the local batch shard; cross-device:
    ``pmean`` over the data axes — ``("data",)`` on the 1-D mesh or
    ``("dcn", "ici")`` on the multi-host hybrid mesh, where the reduction
    is hierarchical (on-slice ICI first, then the small DCN hop); update
    applied identically everywhere (params stay replicated).
    """
    axes = data_axes(mesh)

    def loss_fn(params, images, labels):
        logits = model.apply({"params": params}, images)
        loss, aux = dice_ce_loss(logits, labels, include_background=include_background_dice)
        return loss, aux

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_step(state, images, labels):
        # Compact-transfer upcast + label-range clamp, same as train/state.py
        # (2-class coarse on multi-class GT binarizes; OOB gather NaNs on TPU).
        if images.dtype != jnp.float32:
            images = images.astype(jnp.float32)
        labels = jnp.minimum(labels.astype(jnp.int32), model.cfg.num_classes - 1)
        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params, images, labels)
        grads = jax.lax.pmean(grads, axes)
        aux = jax.lax.pmean(aux, axes)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, dict(aux, grad_norm=gnorm)

    return jax.jit(sharded_step, donate_argnums=(0,))
