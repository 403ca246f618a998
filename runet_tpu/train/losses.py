"""Dice + cross-entropy compound loss and Dice metrics (SURVEY.md L4).

Reference form: PyTorch loss fns, soft Dice + CE sum, per-class Dice with
background handling (SURVEY.md §2.1 "Loss", provenance [BASELINE]/[DOMAIN]).
All math in float32 on (B, D, H, W, K) logits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _onehot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Comparison-based one-hot: a (..., K) broadcast-equality SELECT.

    TPU-critical: ``jnp.take_along_axis``/``jax.nn.one_hot``-style gathers
    over 2M voxel rows measured 25+ ms at 128³ (the whole CE was 27.5 ms);
    the K-way compare is pure VPU and fuses with the surrounding math —
    same loss to 2.4e-7, grads to 1.8e-11, 1.9 ms (measured on v5e)."""
    return (labels[..., None] == jnp.arange(num_classes, dtype=labels.dtype)).astype(
        jnp.float32
    )


def soft_dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smooth: float = 1e-5,
    include_background: bool = False,
) -> jnp.ndarray:
    """1 - mean soft Dice over classes (and batch).

    Dice is computed per (sample, class) over spatial dims with additive
    smoothing so absent classes contribute dice≈1 (no gradient noise from
    empty patches).
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = _onehot(labels, num_classes)
    axes = tuple(range(1, labels.ndim))  # spatial dims
    intersect = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = (2.0 * intersect + smooth) / (denom + smooth)  # (B, K)
    if not include_background:
        dice = dice[:, 1:]
    return 1.0 - jnp.mean(dice)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(logp * _onehot(labels, logits.shape[-1]), axis=-1))


def dice_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smooth: float = 1e-5,
    include_background: bool = False,
    ce_weight: float = 1.0,
    dice_weight: float = 1.0,
    tversky_alpha: float = 0.5,
    tversky_beta: float = 0.5,
) -> tuple[jnp.ndarray, dict]:
    """Compound loss in ONE pass over the logits: a single logsumexp feeds
    both log-probs (CE) and probs (Dice), and the one-hot is the fused
    K-way compare — everything elementwise + reductions, no gathers.
    Measured 1.9 vs 27.5 ms at 128³ b1 K=3 on v5e vs the two-pass
    gather-based form (same values/grads; see _onehot).

    ``tversky_alpha``/``tversky_beta`` weight false positives / false
    negatives in the overlap term (Tversky index). At the 0.5/0.5 default
    the expression reduces EXACTLY to the soft-Dice form above (the
    FP/FN split is computed from the same reductions — no extra passes);
    beta > alpha trades precision for recall, the standard knob for thin
    under-segmented structures like the renal_anatomy vessels [DOMAIN]."""
    x = logits.astype(jnp.float32)
    num_classes = x.shape[-1]
    lz = jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)
    logp = x - lz
    probs = jnp.exp(logp)
    onehot = _onehot(labels, num_classes)
    ce = -jnp.mean(jnp.sum(logp * onehot, axis=-1))
    axes = tuple(range(1, labels.ndim))
    intersect = jnp.sum(probs * onehot, axis=axes)  # soft TP (B, K)
    sum_p = jnp.sum(probs, axis=axes)
    sum_g = jnp.sum(onehot, axis=axes)
    # fp = sum_p - TP, fn = sum_g - TP; alpha=beta=0.5 gives
    # (2TP + s) / (sum_p + sum_g + s) — the classic soft Dice. The default
    # branch keeps that exact expression (bit-compatible with checkpoints
    # and parity tests); alpha/beta are trace-time Python floats, so this
    # is a static branch, not device control flow.
    if tversky_alpha == 0.5 and tversky_beta == 0.5:
        denom = sum_p + sum_g
    else:
        denom = (
            2.0 * intersect
            + 2.0 * tversky_alpha * (sum_p - intersect)
            + 2.0 * tversky_beta * (sum_g - intersect)
        )
    dice = (2.0 * intersect + smooth) / (denom + smooth)
    if not include_background:
        dice = dice[:, 1:]
    dl = 1.0 - jnp.mean(dice)
    loss = dice_weight * dl + ce_weight * ce
    return loss, {"loss": loss, "dice_loss": dl, "ce_loss": ce}


def deep_supervised_loss(
    logits: jnp.ndarray,
    aux_logits: list,
    labels: jnp.ndarray,
    include_background: bool = False,
    **loss_kwargs,
) -> tuple[jnp.ndarray, dict]:
    """Multi-scale compound loss (deep supervision, nnU-Net lineage
    [DOMAIN]): the full-resolution dice_ce_loss plus the same loss on each
    aux head's logits against stride-sliced labels (nearest downsampling —
    ``labels[::s]``), with halving weights (1, 1/2, 1/4) normalized to sum
    to 1 so the loss scale matches the plain objective. ``aux_logits`` is
    ordered [level1, level2] (stride 2**level), exactly what
    ``UNet3D(..., deep_outputs=True)`` returns; empty list degrades to the
    plain loss.

    aux dict semantics: ``loss`` is the weighted multi-scale TOTAL;
    ``dice_loss``/``ce_loss`` stay the UNWEIGHTED full-resolution components
    (comparable across DS on/off runs); ``ds_aux_loss`` is the weighted aux
    contribution, so loss == w0/W*(dice+ce terms) + ds_aux_loss."""
    total, aux = dice_ce_loss(
        logits, labels, include_background=include_background, **loss_kwargs
    )
    weights = [1.0] + [0.5 ** (i + 1) for i in range(len(aux_logits))]
    wsum = sum(weights)
    total = total * (weights[0] / wsum)
    ds_aux = jnp.zeros((), jnp.float32)
    for i, lg in enumerate(aux_logits):
        stride = labels.shape[1] // lg.shape[1]
        lab_s = labels[:, ::stride, ::stride, ::stride]
        l_i, _ = dice_ce_loss(
            lg, lab_s, include_background=include_background, **loss_kwargs
        )
        ds_aux = ds_aux + l_i * (weights[i + 1] / wsum)
    total = total + ds_aux
    aux = dict(aux, loss=total, ds_aux_loss=ds_aux)
    return total, aux


@partial(jax.jit, static_argnames=("num_classes",))
def hard_dice_per_class(
    pred_labels: jnp.ndarray, gt_labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Per-class Dice of an argmaxed prediction. Returns (K,) float32;
    classes absent from BOTH pred and gt score 1.0."""
    dices = []
    for k in range(num_classes):
        p = (pred_labels == k).astype(jnp.float32)
        g = (gt_labels == k).astype(jnp.float32)
        inter = jnp.sum(p * g)
        denom = jnp.sum(p) + jnp.sum(g)
        dices.append(jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1e-8), 1.0))
    return jnp.stack(dices)


def kits_composite_dice(pred_labels, gt_labels) -> dict:
    """KiTS19-style eval (SURVEY.md §3.4): kidney composite = classes {1,2}
    merged; tumor = class 2. Composite membership is EXACTLY {1,2} — in the
    5-class renal_anatomy convention classes 3/4 are vessels, which must not
    count toward kidney overlap."""
    pk = ((pred_labels == 1) | (pred_labels == 2)).astype(jnp.float32)
    gk = ((gt_labels == 1) | (gt_labels == 2)).astype(jnp.float32)
    inter = jnp.sum(pk * gk)
    denom = jnp.sum(pk) + jnp.sum(gk)
    kidney = jnp.where(denom > 0, 2 * inter / jnp.maximum(denom, 1e-8), 1.0)
    pt = (pred_labels == 2).astype(jnp.float32)
    gt = (gt_labels == 2).astype(jnp.float32)
    inter_t = jnp.sum(pt * gt)
    denom_t = jnp.sum(pt) + jnp.sum(gt)
    tumor = jnp.where(denom_t > 0, 2 * inter_t / jnp.maximum(denom_t, 1e-8), 1.0)
    return {"kidney_composite": kidney, "tumor": tumor}
