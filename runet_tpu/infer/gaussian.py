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
