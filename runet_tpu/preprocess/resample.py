"""Jit-compiled trilinear / nearest resampling (SURVEY.md L1, §7 step 2).

The reference did this on host with scipy/SimpleITK per case (SURVEY.md §2.1
"Resampling", provenance [DOMAIN]; BASELINE.json north_star moves it into a
"jit-compiled JAX preprocessing graph"). Design notes:

- Separable: trilinear interp = three sequential 1D passes. Each 1D pass is
  expressed as a DENSE interpolation-matrix matmul (W: out_n × in_n, ≤2
  nonzeros per row) so it runs on the MXU. The obvious gather formulation
  (``jnp.take``) lowers to XLA GatherOp, which executes on the TPU scalar
  core — measured 11–25 s for a 512×512×160 → 125×125×150 resample vs
  milliseconds as matmuls. The W matrices are built host-side and cached
  per (in, out, scale, method).
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


from functools import lru_cache


def _axis_positions_np(out_size: int, in_size: int, scale: float) -> np.ndarray:
    pos = np.arange(out_size, dtype=np.float64) * float(scale)
    return np.clip(pos, 0.0, float(in_size - 1))


def matrix_from_positions(pos: np.ndarray, in_size: int, method: str) -> np.ndarray:
    """(len(pos), in_size) float32 interpolation matrix, ≤2 nonzeros/row.

    The shared pos→W builder behind every dense-matmul interpolation in the
    package (resampling here, the zoom bank and elastic-field upsample in
    data/augment.py): ``pos`` are input-coordinate sample positions, assumed
    already clamped to [0, in_size-1]."""
    out_size = len(pos)
    W = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    if method == "linear":
        i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        w = (pos - i0).astype(np.float32)
        # i0 may equal i1 at the clamp edge: accumulate, don't overwrite.
        np.add.at(W, (rows, i0), 1.0 - w)
        np.add.at(W, (rows, i1), w)
    else:  # nearest: floor(x + 0.5) matches scipy order=0 tie-breaking.
        idx = np.clip(np.floor(pos + 0.5).astype(np.int64), 0, in_size - 1)
        W[rows, idx] = 1.0
    return W


@lru_cache(maxsize=256)
def _interp_matrix(
    in_size: int, out_size: int, scale: float, method: str
) -> np.ndarray:
    """(out_size, in_size) float32 interpolation matrix, ≤2 nonzeros/row."""
    return matrix_from_positions(
        _axis_positions_np(out_size, in_size, scale), in_size, method
    )


def _apply_axis(x: jnp.ndarray, axis: int, out_size: int, scale: float, method: str):
    """out[..., j, ...] = Σ_i W[j, i] · x[..., i, ...] as one MXU matmul."""
    n = x.shape[axis]
    W = jnp.asarray(_interp_matrix(n, out_size, scale, method))
    moved = jnp.moveaxis(x, axis, 0).reshape(n, -1)
    out = jnp.dot(W, moved.astype(jnp.float32), preferred_element_type=jnp.float32)
    new_shape = (out_size,) + tuple(
        s for a, s in enumerate(x.shape) if a != axis
    )
    return jnp.moveaxis(out.reshape(new_shape), 0, axis)


def _lerp_axis(x: jnp.ndarray, axis: int, out_size: int, scale: float) -> jnp.ndarray:
    return _apply_axis(x, axis, out_size, scale, "linear")


def _nearest_axis(x: jnp.ndarray, axis: int, out_size: int, scale: float) -> jnp.ndarray:
    return _apply_axis(x, axis, out_size, scale, "nearest")


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
    orig_dtype = x.dtype
    for axis in range(3):
        if x.shape[axis] != out_shape[axis] or scale[axis] != 1.0:
            x = fn(x, axis, out_shape[axis], scale[axis])
    if method == "nearest" and not jnp.issubdtype(orig_dtype, jnp.floating):
        # One-hot W rows select exactly; small ints are exact in f32.
        x = jnp.round(x).astype(orig_dtype)
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

    Smoother label boundaries than nearest, still integer output. The
    argmax only compares O(1) weight sums, so the interpolation runs in
    bf16 — halves HBM traffic on the (X, Y, Z, K) one-hot intermediate.
    """
    out = jax.nn.one_hot(labels, num_classes, dtype=jnp.bfloat16, axis=-1)
    for axis in range(3):
        if out.shape[axis] != out_shape[axis] or scale[axis] != 1.0:
            n = out.shape[axis]
            W = jnp.asarray(
                _interp_matrix(n, out_shape[axis], scale[axis], "linear"),
                jnp.bfloat16,
            )
            moved = jnp.moveaxis(out, axis, 0).reshape(n, -1)
            res = jnp.dot(W, moved, preferred_element_type=jnp.float32)
            new_shape = (out_shape[axis],) + tuple(
                s for a, s in enumerate(out.shape) if a != axis
            )
            out = jnp.moveaxis(
                res.astype(jnp.bfloat16).reshape(new_shape), 0, axis
            )
    return jnp.argmax(out, axis=-1).astype(labels.dtype)


def _interp_matrix_traced(
    in_size: int, out_size: int, scale: jnp.ndarray, method: str
) -> jnp.ndarray:
    """(out_size, in_size) interpolation matrix from a TRACED scalar scale.

    Same convention as ``_interp_matrix`` but built with jnp ops, so the
    scale lives in the compiled program's *inputs* instead of its cache key.
    This is what bounds cascade compile classes on real datasets: native CT
    spacing is continuous per case (KiTS19 in-plane 0.44–1.04 mm), and a
    static scale would recompile every jitted resample program per distinct
    spacing — 30–60 s each on this host (infer/cascade.py). Positions are
    f32 (int·f32 product, error ≤ ~1e-4 voxel at clinical sizes — far below
    interpolation tolerance; the static f64 path remains for golden tests).
    At the clamp edge i0 == i1 and both terms hit the same column, summing
    to (1-w) + w = 1 exactly like the static path's accumulate."""
    s = jnp.asarray(scale, jnp.float32)
    pos = jnp.clip(
        jnp.arange(out_size, dtype=jnp.float32) * s, 0.0, float(in_size - 1)
    )
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    if method == "linear":
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        w = pos - i0.astype(jnp.float32)
        W = (cols == i0[:, None]) * (1.0 - w)[:, None] + (
            cols == i1[:, None]
        ) * w[:, None]
    else:  # nearest: floor(x + 0.5) matches scipy order=0 tie-breaking
        idx = jnp.clip(jnp.floor(pos + 0.5).astype(jnp.int32), 0, in_size - 1)
        W = (cols == idx[:, None]).astype(jnp.float32)
    return W.astype(jnp.float32)


@partial(jax.jit, static_argnames=("out_shape", "method"))
def resample_dynamic(
    x: jnp.ndarray,
    out_shape: tuple[int, int, int],
    scale: jnp.ndarray,
    method: str = "linear",
) -> jnp.ndarray:
    """``resample`` with a traced per-axis ``scale`` (shape (3,)).

    For use INSIDE jitted programs whose scale varies per case (cascade ROI
    and coarse programs): the compiled executable is shared across native
    spacings. Every axis is resampled unconditionally (no scale==1 skip —
    the value is unknown at trace time; an identity-ish axis costs one
    near-identity matmul, negligible next to the U-Net forward)."""
    if x.ndim != 3:
        raise ValueError(f"expected 3D, got {x.shape}")
    scale = jnp.asarray(scale, jnp.float32)
    for axis in range(3):
        n = x.shape[axis]
        W = _interp_matrix_traced(n, out_shape[axis], scale[axis], method)
        moved = jnp.moveaxis(x, axis, 0).reshape(n, -1)
        out = jnp.dot(W, moved.astype(jnp.float32), preferred_element_type=jnp.float32)
        new_shape = (out_shape[axis],) + tuple(
            s for a, s in enumerate(x.shape) if a != axis
        )
        x = jnp.moveaxis(out.reshape(new_shape), 0, axis)
    return x


@partial(jax.jit, static_argnames=("out_shape", "num_classes"))
def resample_labels_onehot_dynamic(
    labels: jnp.ndarray,
    out_shape: tuple[int, int, int],
    scale: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """``resample_labels_onehot`` with a traced per-axis scale (see
    ``resample_dynamic`` — bounds cascade compile classes per spacing)."""
    scale = jnp.asarray(scale, jnp.float32)
    out = jax.nn.one_hot(labels, num_classes, dtype=jnp.bfloat16, axis=-1)
    for axis in range(3):
        n = out.shape[axis]
        W = _interp_matrix_traced(n, out_shape[axis], scale[axis], "linear").astype(
            jnp.bfloat16
        )
        moved = jnp.moveaxis(out, axis, 0).reshape(n, -1)
        res = jnp.dot(W, moved, preferred_element_type=jnp.float32)
        new_shape = (out_shape[axis],) + tuple(
            s for a, s in enumerate(out.shape) if a != axis
        )
        out = jnp.moveaxis(res.astype(jnp.bfloat16).reshape(new_shape), 0, axis)
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
