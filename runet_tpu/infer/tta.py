"""Test-time augmentation: mirror-flip averaged inference (SURVEY.md §2.1
"Sliding-window inference" [DOMAIN] — nnU-Net-lineage pipelines average
predictions over mirror flips; the reference's training augments with flips,
so flip-TTA is the matching inference-time capability).

TPU-first shape: TTA lives INSIDE the jitted program as a wrapper around
``apply_fn`` — ``jnp.flip`` is a free layout transform for XLA, all 2^k flip
variants run in the same dispatch (no extra host round-trips through the
tunnel), and every downstream consumer (single-pass, windowed, cascade ROI
programs) picks it up unchanged because they only see an ``apply_fn``.

Contract: the wrapper returns **log of the flip-averaged softmax**, so
downstream ``softmax(...)`` reproduces the averaged probabilities exactly
(softmax(log p) = p when p is normalized) and ``argmax`` is unaffected by
the log.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp


def flip_combinations(axes: tuple[int, ...]) -> tuple[tuple[int, ...], ...]:
    """All subsets of the given spatial axes (volume axes 0/1/2), including
    the empty (identity) combination: k axes -> 2^k variants."""
    out = []
    for r in range(len(axes) + 1):
        out.extend(itertools.combinations(axes, r))
    return tuple(out)


@lru_cache(maxsize=64)
def make_tta_apply(apply_fn, axes: tuple[int, ...] = (0, 1, 2)):
    """Wrap ``apply_fn(params, windows) -> logits`` with mirror-flip TTA.

    ``axes`` are volume axes (0/1/2); windows are (B, X, Y, Z, C) so the
    flips act on window axes+1. Cached on (apply_fn, axes) identity so jitted
    programs keyed on the apply_fn static arg (infer/cascade.py) do not
    retrace per call.
    """
    combos = flip_combinations(tuple(int(a) + 1 for a in axes))

    def tta_fn(params, windows):
        def one(flip_axes):
            w = jnp.flip(windows, flip_axes) if flip_axes else windows
            logits = apply_fn(params, w)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.flip(probs, flip_axes) if flip_axes else probs

        mean = one(combos[0])
        for c in combos[1:]:
            mean = mean + one(c)
        mean = mean / len(combos)
        return jnp.log(mean + 1e-12)

    return tta_fn


def effective_apply_fn(bundle):
    """The bundle's apply_fn, TTA-wrapped when its InferConfig asks for it."""
    if getattr(bundle.infer, "tta", False):
        return make_tta_apply(bundle.apply_fn, tuple(bundle.infer.tta_axes))
    return bundle.apply_fn
