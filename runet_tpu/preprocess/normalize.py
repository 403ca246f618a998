"""HU clipping + z-score normalization as a jitted graph (SURVEY.md L1).

Reference form: numpy ops on host per case (SURVEY.md §2.1 "Intensity
normalization", provenance [DOMAIN]); BASELINE.json north_star: "HU clipping +
z-score normalization ... become a jit-compiled JAX preprocessing graph".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("hu_window", "hu_stats"))
def normalize(
    x: jnp.ndarray,
    hu_window: tuple[float, float] = (-79.0, 304.0),
    hu_stats: tuple[float, float] | None = (100.93, 76.9),
) -> jnp.ndarray:
    """Clip to HU window then z-score (fixed stats or per-volume)."""
    x = x.astype(jnp.float32)
    lo, hi = hu_window
    x = jnp.clip(x, lo, hi)
    if hu_stats is not None:
        mean, std = hu_stats
        return (x - mean) / std
    mean = jnp.mean(x)
    std = jnp.std(x) + 1e-8
    return (x - mean) / std


def preprocess_case(
    data: jnp.ndarray,
    src_spacing: tuple[float, float, float],
    dst_spacing: tuple[float, float, float],
    hu_window: tuple[float, float] = (-79.0, 304.0),
    hu_stats: tuple[float, float] | None = (100.93, 76.9),
) -> jnp.ndarray:
    """Full L1 pipeline for one CT volume: resample → clip → normalize."""
    from runet_tpu.preprocess.resample import resample_to_spacing

    x = resample_to_spacing(data, src_spacing, dst_spacing, method="linear")
    return normalize(x, hu_window, hu_stats)
