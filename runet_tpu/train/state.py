"""Train state, optimizer, LR schedules (SURVEY.md §2.1 "Training loop").

Reference: Adam/SGD with an LR schedule, hand-rolled loop (provenance
[DOMAIN]). Rebuild: optax AdamW + global-norm clipping; poly/cosine/const
schedules with linear warmup; optax.MultiSteps for gradient accumulation
(SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from runet_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_schedule == "const":
        sched = optax.constant_schedule(cfg.lr)
    elif cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(cfg.lr, max(cfg.steps - cfg.warmup_steps, 1))
    elif cfg.lr_schedule == "poly":
        sched = optax.polynomial_schedule(
            init_value=cfg.lr,
            end_value=cfg.lr * 1e-3,
            power=cfg.poly_power,
            transition_steps=max(cfg.steps - cfg.warmup_steps, 1),
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        opt = optax.adamw(make_lr_schedule(cfg), weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        # nnU-Net-lineage default ([DOMAIN]): SGD + Nesterov momentum 0.99
        # with the poly schedule; weight decay applied decoupled so it stays
        # comparable with the adamw path.
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(
                make_lr_schedule(cfg), momentum=cfg.sgd_momentum, nesterov=True
            ),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(optax.clip_by_global_norm(12.0), opt)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


class TrainState(train_state.TrainState):
    pass


def create_train_state(model, params, cfg: TrainConfig) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params, tx=make_optimizer(cfg))


def _train_step_fn(
    model,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """Raw (unjitted) micro-step body shared by ``make_train_step`` (one
    dispatch per step) and ``make_multi_train_step`` (lax.scan of K steps
    per dispatch). ``loss_kwargs`` forwards static knobs to dice_ce_loss
    (e.g. tversky_alpha/beta from TrainConfig)."""
    from runet_tpu.data.augment import augment_one
    from runet_tpu.train.losses import deep_supervised_loss, dice_ce_loss

    loss_kwargs = loss_kwargs or {}
    deep = getattr(model.cfg, "deep_supervision", False)

    def loss_fn(params, images, labels):
        if deep:
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

    num_classes = model.cfg.num_classes

    def train_step(state: TrainState, images, labels, key=None):
        # Accept compact transfer dtypes (f16 images / uint8 labels halve the
        # host→device bytes through the ~tunnel-bound PCI path; see
        # data/pipeline.py) — upcast on device where flops are free.
        if images.dtype != jnp.float32:
            images = images.astype(jnp.float32)
        if labels.dtype != jnp.int32:
            labels = labels.astype(jnp.int32)
        # Clip labels into the model's class range: the 2-class coarse
        # localizer trains (kidney ∪ tumor) vs background on multi-class
        # ground truth (BASELINE config 1); out-of-range gather indices are
        # NaN on TPU.
        labels = jnp.minimum(labels, num_classes - 1)
        if augment:
            keys = jax.random.split(key, images.shape[0])
            images, labels = jax.vmap(
                partial(augment_one, elastic=elastic)
            )(keys, images, labels)
        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params, images, labels)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        aux = dict(aux, grad_norm=gnorm)
        return state, aux

    return train_step


def make_train_step(
    model,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """Single fused step: (augment→)fwd+bwd+update in ONE jitted program,
    with donated state. One device program per step matters doubly here:
    XLA fuses augmentation into the step, and each dispatch costs a fixed
    ~38 ms round-trip through the PJRT tunnel (utils/latency.py).

    Works unsharded on one device and data-parallel under GSPMD when the
    batch carries a ``data``-axis NamedSharding (parallel/comm.py) — XLA
    inserts the gradient all-reduce (SURVEY.md §3.1 rebuild equivalent).
    """
    train_step = _train_step_fn(
        model, include_background_dice, augment, elastic, loss_kwargs
    )
    # Donate the state only: the batch arrives in compact transfer dtypes
    # (f16/uint8) and is upcast on device, so donating it can never be
    # honored — XLA logs "donated buffers were not usable" every step and
    # the donation does nothing. State donation is the one that matters
    # (params + opt state alias in place).
    if augment:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(lambda s, i, l: train_step(s, i, l), donate_argnums=(0,))


def make_multi_train_step(
    model,
    k: int,
    include_background_dice: bool = False,
    augment: bool = False,
    elastic: bool = False,
    loss_kwargs: dict | None = None,
):
    """K micro-steps in ONE dispatch: ``lax.scan`` over the raw step body.

    Each per-step host dispatch through the PJRT tunnel costs ~1 ms of
    enqueue plus scheduling gaps; at a ~200 ms step that is noise, but the
    dispatch train also serializes with the host thread. Scanning K steps
    amortizes all of it to once per chunk (``TrainConfig.steps_per_dispatch``).

    Signature: ``(state, images (K,B,...), labels (K,B,...)[, key, step0])
    -> (state, aux)`` where ``key`` is the loop's base rng key and ``step0``
    the global index of the chunk's first micro-step — augmentation draws
    are ``fold_in(key, step0+i)``, IDENTICAL draw-for-draw to K calls of
    ``make_train_step`` (asserted in tests/test_train_extras.py). ``aux``
    scalars are means over the chunk (grad_norm included).
    """
    step = _train_step_fn(model, include_background_dice, augment, elastic, loss_kwargs)

    if augment:

        def multi(state, images, labels, key, step0):
            idx = step0 + jnp.arange(k)

            def body(s, x):
                im, lb, i = x
                return step(s, im, lb, jax.random.fold_in(key, i))

            state, auxs = jax.lax.scan(body, state, (images, labels, idx))
            return state, jax.tree_util.tree_map(lambda a: jnp.mean(a, 0), auxs)

    else:

        def multi(state, images, labels):
            def body(s, x):
                return step(s, *x)

            state, auxs = jax.lax.scan(body, state, (images, labels))
            return state, jax.tree_util.tree_map(lambda a: jnp.mean(a, 0), auxs)

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(model, num_classes: int):
    from runet_tpu.train.losses import hard_dice_per_class

    def eval_step(params, images, labels):
        if images.dtype != jnp.float32:
            images = images.astype(jnp.float32)  # compact transfer, see train_step
        labels = jnp.minimum(labels.astype(jnp.int32), num_classes - 1)
        logits = model.apply({"params": params}, images)
        pred = jnp.argmax(logits, axis=-1)
        return hard_dice_per_class(pred, labels, num_classes)

    return jax.jit(eval_step)
