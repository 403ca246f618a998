"""Jit-compiled trilinear / nearest resampling (SURVEY.md L1, §7 step 2).

The reference did this on host with scipy/SimpleITK per case (SURVEY.md §2.1
"Resampling", provenance [DOMAIN]; BASELINE.json north_star moves it into a
"jit-compiled JAX preprocessing graph"). Design notes:

- Separable: trilinear interp = three sequential 1D gather+lerp passes, which
  XLA fuses far better than a single 8-corner 3D gather (3 gathers of N vs 8).
- Coordinate convention: output index j on axis a samples input coordinate
  ``j * scale[a]`` (corner-aligned, spacing-ratio scale), clamped to the valid
  range — i.e. edge mode "nearest". Pinned by golden tests against
  scipy.ndimage.map_coordinates on the same grid (SURVEY.md §4.1).
- Everything is static-shape: output shapes are computed in Python from
  spacings, so jit specializes per (in_shape, out_shape) pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def output_shape_for_spacing(
    in_shape: tuple[int, ...],
    src_spacing: tuple[float, ...],
    dst_spacing: tuple[float, ...],
) -> tuple[int, ...]:
    """Physical-extent-preserving output shape: round(n * src/dst), min 1."""
    return tuple(
        max(1, int(round(n * s / d)))
        for n, s, d in zip(in_shape, src_spacing, dst_spacing)
    )


def _axis_positions(out_size: int, in_size: int, scale: float) -> jnp.ndarray:
    pos = jnp.arange(out_size, dtype=jnp.float32) * jnp.float32(scale)
    return jnp.clip(pos, 0.0, float(in_size - 1))


def _lerp_axis(x: jnp.ndarray, axis: int, out_size: int, scale: float) -> jnp.ndarray:
    n = x.shape[axis]
    pos = _axis_positions(out_size, n, scale)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, n - 1)
    i1 = jnp.minimum(i0 + 1, n - 1)
    w = (pos - i0.astype(jnp.float32)).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    return x0 * (1 - w) + x1 * w


def _nearest_axis(x: jnp.ndarray, axis: int, out_size: int, scale: float) -> jnp.ndarray:
    n = x.shape[axis]
    pos = _axis_positions(out_size, n, scale)
    # floor(x + 0.5) matches scipy map_coordinates order=0 tie-breaking
    # (jnp.round would round half-to-even).
    idx = jnp.clip(jnp.floor(pos + 0.5).astype(jnp.int32), 0, n - 1)
    return jnp.take(x, idx, axis=axis)


@partial(jax.jit, static_argnames=("out_shape", "scale", "method"))
def resample(
    x: jnp.ndarray,
    out_shape: tuple[int, int, int],
    scale: tuple[float, float, float],
    method: str = "linear",
) -> jnp.ndarray:
    """Resample a 3D volume: out[j] = x[clamp(j * scale)] per axis.

    ``scale[a] = dst_spacing[a] / src_spacing[a]`` maps output voxel indices
    to input voxel coordinates.
    """
    if x.ndim != 3:
        raise ValueError(f"expected 3D, got {x.shape}")
    fn = _lerp_axis if method == "linear" else _nearest_axis
    if method == "linear" and not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    for axis in range(3):
        if x.shape[axis] != out_shape[axis] or scale[axis] != 1.0:
            x = fn(x, axis, out_shape[axis], scale[axis])
    return x


def resample_to_spacing(
    x: jnp.ndarray,
    src_spacing: tuple[float, float, float],
    dst_spacing: tuple[float, float, float],
    method: str = "linear",
) -> jnp.ndarray:
    out_shape = output_shape_for_spacing(x.shape, src_spacing, dst_spacing)
    scale = tuple(d / s for s, d in zip(src_spacing, dst_spacing))
    return resample(x, out_shape, scale, method)


def resample_to_shape(
    x: jnp.ndarray,
    out_shape: tuple[int, int, int],
    src_spacing: tuple[float, float, float],
    dst_spacing: tuple[float, float, float],
    method: str = "linear",
) -> jnp.ndarray:
    """Resample into an exact target shape (e.g. back to native grid)."""
    scale = tuple(d / s for s, d in zip(src_spacing, dst_spacing))
    return resample(x, tuple(out_shape), scale, method)


@partial(jax.jit, static_argnames=("out_shape", "scale", "num_classes"))
def resample_labels_onehot(
    labels: jnp.ndarray,
    out_shape: tuple[int, int, int],
    scale: tuple[float, float, float],
    num_classes: int,
) -> jnp.ndarray:
    """One-hot + trilinear + argmax label resampling (BASELINE north_star:
    "resample prediction back to native spacing (nearest/one-hot-linear)").

    Smoother label boundaries than nearest, still integer output.
    """
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32, axis=-1)
    out = oh
    for axis in range(3):
        if out.shape[axis] != out_shape[axis] or scale[axis] != 1.0:
            out = _lerp_axis(out, axis, out_shape[axis], scale[axis])
    return jnp.argmax(out, axis=-1).astype(labels.dtype)


def numpy_reference_resample(
    x: np.ndarray,
    out_shape: tuple[int, int, int],
    scale: tuple[float, float, float],
    order: int = 1,
) -> np.ndarray:
    """scipy golden oracle with the same coordinate convention (tests only)."""
    from scipy.ndimage import map_coordinates

    grids = [
        np.clip(np.arange(out_shape[a]) * scale[a], 0, x.shape[a] - 1)
        for a in range(3)
    ]
    coords = np.meshgrid(*grids, indexing="ij")
    return map_coordinates(x.astype(np.float32), coords, order=order, mode="nearest")
