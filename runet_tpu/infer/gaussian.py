"""Gaussian importance map for sliding-window blending (SURVEY.md L6).

BASELINE north_star: "sliding-window inference with Gaussian-weighted overlap
blending". Map peaks at the patch center and decays toward edges so window
seams are dominated by better-contextualized center predictions (nnU-Net
convention, sigma = patch_size * sigma_scale — provenance [DOMAIN]).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=32)
def gaussian_importance_map(
    patch_size: tuple[int, int, int],
    sigma_scale: float = 0.125,
    dtype=np.float32,
) -> np.ndarray:
    """(X, Y, Z) map, max 1.0 at center, strictly positive."""
    maps = []
    for n in patch_size:
        center = (n - 1) / 2.0
        sigma = max(n * sigma_scale, 1e-3)
        x = np.arange(n, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    out = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    out = out / out.max()
    # Strictly positive so normalization never divides by zero.
    out = np.maximum(out, out[out > 0].min() if (out > 0).any() else 1e-8)
    return out.astype(dtype)


def gaussian_importance_map_device(
    patch_size: tuple[int, int, int],
    sigma_scale: float = 0.125,
):
    """Device-resident importance map for the CURRENT default device.

    Keyed on the thread-local ``jax.default_device`` so each multi-chip
    serving lane (infer/cascade.py predict_cases ``devices=``) caches its
    own copy — a single shared entry would pin to the first lane's chip and
    re-cross ICI on every other lane's window group."""
    import jax

    return _gaussian_map_on_device(
        patch_size, sigma_scale, jax.config.jax_default_device
    )


@lru_cache(maxsize=8)
def _gaussian_map_on_device(
    patch_size: tuple[int, int, int],
    sigma_scale: float,
    _device,  # cache key only; creation follows the ambient default device
):
    """Built ON device from three 1-D factors (≈1 KB host→device instead of
    the full 3-D map — a super-window map is tens of MB, and the PJRT tunnel
    made per-call uploads the dominant cost of the windowed fallback;
    measured in round 2). Cache is deliberately SMALL: each entry pins an
    f32 map in HBM (a super-window map at the 8×128³ budget is ~67 MB; 32
    entries would pin ~2 GB) and a sweep only alternates between a couple of
    window shapes."""
    import jax.numpy as jnp

    axes = []
    for n in patch_size:
        center = (n - 1) / 2.0
        sigma = max(n * sigma_scale, 1e-3)
        x = np.arange(n, dtype=np.float64)
        axes.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    peak = float(axes[0].max() * axes[1].max() * axes[2].max())
    floor = float(
        max(axes[0].min() * axes[1].min() * axes[2].min() / peak, 1e-30)
    )
    a, b, c = (jnp.asarray(v / peak ** (1 / 3), jnp.float32) for v in axes)
    out = a[:, None, None] * b[None, :, None] * c[None, None, :]
    return jnp.maximum(out, floor)
