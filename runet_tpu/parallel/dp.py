"""Explicit shard_map data-parallel train step (SURVEY.md §2.3 DP row).

BASELINE config 5: "Data-parallel training over full KiTS19 via pmap across a
v5e slice". This is the modern equivalent: ``shard_map`` over the ``data``
mesh axis with explicit ``lax.pmean`` gradient reduction riding ICI. The
GSPMD path (train/state.py) and this one are asserted to produce identical
grads in tests/test_parallel.py (SURVEY.md §4.4).

Since round 3 this is also the loop's multi-device step (train/loop.py):
the fused Pallas blocks are ON in the training step by default, and a
``pallas_call`` is an opaque custom call to the GSPMD partitioner — under
``shard_map`` each device traces the kernel at its LOCAL shard shapes, so
fused kernels, augmentation, and the gradient pmean compose without any
partitioning rule for the custom call.
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


def split_key_data(key, batch: int):
    """Per-sample key material for the augmented dp step: raw ``uint32``
    key data, shape (batch, key_size) — a plain array so it shards over the
    data axis exactly like the batch (and survives the multi-process
    ``make_array_from_process_local_data`` path, which ``np.asarray``-s its
    input and so cannot carry typed PRNG keys). Matches
    ``make_train_step``'s internal ``jax.random.split(key, B)`` draw for
    draw, which the GSPMD/shard_map parity test relies on."""
    return jax.random.key_data(jax.random.split(key, batch))


def _sharded_step_fn(
    model,
    mesh: Mesh,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """Raw shard_map step shared by ``make_dp_train_step`` (one dispatch per
    step) and ``make_dp_multi_train_step`` (scan of K steps per dispatch)."""
    from runet_tpu.data.augment import augment_one

    axes = data_axes(mesh)
    loss_kwargs = loss_kwargs or {}
    deep = getattr(model.cfg, "deep_supervision", False)

    def loss_fn(params, images, labels):
        if deep:
            from runet_tpu.train.losses import deep_supervised_loss

            logits, aux_logits = model.apply(
                {"params": params}, images, deep_outputs=True
            )
            return deep_supervised_loss(
                logits, aux_logits, labels,
                include_background=include_background_dice, **loss_kwargs,
            )
        logits = model.apply({"params": params}, images)
        loss, aux = dice_ce_loss(
            logits, labels, include_background=include_background_dice, **loss_kwargs
        )
        return loss, aux

    in_specs = (P(), P(axes), P(axes)) + ((P(axes),) if augment else ())

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_step(state, images, labels, *maybe_keys):
        # Compact-transfer upcast + label-range clamp, same as train/state.py
        # (2-class coarse on multi-class GT binarizes; OOB gather NaNs on TPU).
        if images.dtype != jnp.float32:
            images = images.astype(jnp.float32)
        labels = jnp.minimum(labels.astype(jnp.int32), model.cfg.num_classes - 1)
        if augment:
            keys = jax.vmap(jax.random.wrap_key_data)(maybe_keys[0])
            images, labels = jax.vmap(
                partial(augment_one, elastic=elastic)
            )(keys, images, labels)
        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params, images, labels)
        grads = jax.lax.pmean(grads, axes)
        aux = jax.lax.pmean(aux, axes)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, dict(aux, grad_norm=gnorm)

    return sharded_step


def make_dp_train_step(
    model,
    mesh: Mesh,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """Returns a jitted step: (state, images(B,...), labels(B,...)[, keys])
    -> (state, aux). ``keys`` (required iff ``augment``) is the
    ``split_key_data`` array, sharded like the batch.

    Per-device: local grads on the local batch shard; cross-device:
    ``pmean`` over the data axes — ``("data",)`` on the 1-D mesh or
    ``("dcn", "ici")`` on the multi-host hybrid mesh, where the reduction
    is hierarchical (on-slice ICI first, then the small DCN hop); update
    applied identically everywhere (params stay replicated).
    """
    sharded_step = _sharded_step_fn(
        model, mesh, include_background_dice, augment, elastic, loss_kwargs
    )
    return jax.jit(sharded_step, donate_argnums=(0,))


def make_dp_multi_train_step(
    model,
    mesh: Mesh,
    k: int,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """K shard_map micro-steps in ONE dispatch (``lax.scan`` outside the
    shard_map; see train/state.py ``make_multi_train_step`` for why).

    Signature: ``(state, images (K,B,...), labels (K,B,...)[, keys (K,B,key)])
    -> (state, aux)`` with the superbatch sharded on axis 1
    (``comm.shard_batch(..., batch_axis=1)``); ``keys`` stacks the per-step
    ``split_key_data`` arrays, so the chunk reproduces K single dp steps
    draw-for-draw. ``aux`` scalars are chunk means.
    """
    sharded_step = _sharded_step_fn(
        model, mesh, include_background_dice, augment, elastic, loss_kwargs
    )

    def multi(state, images, labels, *maybe_keys):
        xs = (images, labels) + maybe_keys

        def body(s, x):
            return sharded_step(s, *x)

        state, auxs = jax.lax.scan(body, state, xs)
        return state, jax.tree_util.tree_map(lambda a: jnp.mean(a, 0), auxs)

    return jax.jit(multi, donate_argnums=(0,))
