"""Checkpoint ensembling for inference (SURVEY.md §1 L6 "argmax label
fusion"; [DOMAIN] — KiTS19-era nnU-Net-lineage pipelines fuse K
cross-validation folds by averaging softmax probabilities before argmax).

TPU-first shape: an ensemble IS a ``ModelBundle`` whose ``params`` is the
K-stacked param tree and whose ``apply_fn`` folds a ``lax.scan`` over the
members, accumulating mean class probabilities in f32 — one compiled
program, one dispatch, K forwards back-to-back on device, no host
round-trips between members. Because it is just a bundle, every existing
consumer composes unchanged: sliding window, single-pass, TTA (probability
averaging stacks), the cascade's fused ROI programs, and ``predict_cases``
pipelining.

``apply_fn`` returns ``log(mean_prob)``: downstream code treats bundle
outputs as logits and applies softmax→argmax, and softmax(log p) == p
(softmax is invariant to the log-sum constant), so fusion semantics are
exact while the bundle contract stays unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from runet_tpu.infer.cascade import ModelBundle


def stack_params(params_list):
    """Stack K compatible param trees along a new leading axis (leaf-wise)."""
    if len(params_list) < 2:
        raise ValueError("ensemble needs >= 2 param sets")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def ensemble_apply_fn(model_apply, num_classes: int):
    """Build the bundle ``apply_fn`` for stacked params.

    ``model_apply(params, x) -> logits`` is the single-member apply;
    the returned fn scans it over the leading (member) axis of the stacked
    tree and returns log of the mean probability (see module docstring).
    The scan carry is the f32 probability accumulator — activations of
    member k are freed before member k+1 runs, so peak memory is one
    member's forward + one probability volume.
    """

    def apply_fn(stacked, x):
        k = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        acc0 = jnp.zeros((*x.shape[:-1], num_classes), jnp.float32)

        def body(acc, member):
            logits = model_apply(member, x)
            return acc + jax.nn.softmax(logits.astype(jnp.float32), axis=-1), None

        acc, _ = jax.lax.scan(body, acc0, stacked)
        return jnp.log(acc / k + 1e-12)

    return apply_fn


def ensemble_bundle(bundles: list[ModelBundle]) -> ModelBundle:
    """Fuse K single-model bundles (same architecture/config) into one.

    All members must share ``num_classes`` / preprocess / infer config (they
    are K folds of the same training setup); the first bundle's configs and
    ``apply_fn`` are used.
    """
    if len(bundles) < 2:
        raise ValueError("ensemble needs >= 2 bundles")
    nc = bundles[0].num_classes
    if any(b.num_classes != nc for b in bundles):
        raise ValueError("ensemble members disagree on num_classes")
    stacked = stack_params([b.params for b in bundles])
    return ModelBundle(
        apply_fn=ensemble_apply_fn(bundles[0].apply_fn, nc),
        params=stacked,
        num_classes=nc,
        preprocess=bundles[0].preprocess,
        infer=bundles[0].infer,
    )
