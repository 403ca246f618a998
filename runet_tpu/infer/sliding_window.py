"""Fused on-device sliding-window inference (SURVEY.md §3.2 — the north-star
hot loop; BASELINE.json north_star).

The reference crossed host↔device once PER WINDOW (python loop, torch forward
per tile — provenance [DOMAIN]). Here the entire loop — window extract → U-Net
forward → Gaussian-weighted softmax accumulate → argmax fusion — runs as one
jitted step program per window group, dispatched from the host with window
origins as device scalars and donated HBM-resident accumulators; a final
jitted fusion step does ``argmax(accum / norm)`` on device. The host never
touches voxel data; it sees only the final label map (or probabilities).

Why host-side dispatch instead of one big ``lax.scan`` program: the scan
variant was measured at 327 s XLA compile time on v5e (vs ~20 s for the
forward alone — the while-loop carries full-volume accumulators), and per-call
dispatch overhead is ~100 µs × a few dozen windows, i.e. negligible. The step
program compiles once per (volume shape, patch) pair and lands in the
persistent compilation cache (utils/cache.py).

MXU utilization: windows are evaluated ``window_batch`` at a time (vmapped
model forward) so small patches still fill the matrix units; the window-origin
table is padded to a multiple of the batch (duplicate windows are harmless —
they scale accumulator and normalizer equally).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from runet_tpu.infer.gaussian import gaussian_importance_map_device


def compute_window_starts(dim: int, patch: int, stride: int) -> list[int]:
    """1-D window origins covering [0, dim) with final window flush to the
    end (reference semantics: full coverage, arbitrary overlap)."""
    if dim <= patch:
        return [0]
    starts = list(range(0, dim - patch + 1, stride))
    if starts[-1] != dim - patch:
        starts.append(dim - patch)
    return starts


def make_start_table(
    shape: tuple[int, int, int],
    patch_size: tuple[int, int, int],
    overlap: float,
    window_batch: int = 1,
    strides: list[int] | None = None,
) -> np.ndarray:
    """(N, 3) int32 window origins, N padded to a multiple of window_batch
    (duplicated trailing windows are harmless — they scale accumulator and
    normalizer equally). ``strides`` overrides the overlap-derived strides
    (super-window path: absolute overlap in patch voxels)."""
    if strides is None:
        strides = [max(1, int(round(p * (1.0 - overlap)))) for p in patch_size]
    axes = [
        compute_window_starts(s, p, st)
        for s, p, st in zip(shape, patch_size, strides)
    ]
    table = np.array(
        [(a, b, c) for a in axes[0] for b in axes[1] for c in axes[2]],
        dtype=np.int32,
    )
    rem = len(table) % window_batch
    if rem:
        table = np.concatenate([table, np.repeat(table[-1:], window_batch - rem, 0)])
    return table


def expand_window_size(
    vol_shape: tuple[int, int, int],
    patch_size: tuple[int, int, int],
    budget_ratio: float,
    grow: int = 64,
    div: int = 32,
) -> tuple[int, ...]:
    """Grow the sliding window from ``patch_size`` toward the volume dims
    under a voxel budget of ``budget_ratio × prod(patch_size)``.

    Rationale (measured on v5e through the PJRT tunnel): each window
    dispatch costs ~38 ms RTT + a full forward, and XLA's batched-3D-conv
    layouts at 128³ make window batching a regression (config.py
    InferConfig.window_batch) — so the fallback for ROIs beyond the
    single-pass budget covers the ROI with a FEW large overlapping windows
    (each within the same HBM budget as the single-pass path) instead of
    dozens of patch-sized ones. Growth is in ``grow``-voxel steps (bounds
    compile classes); axes are clamped to the volume rounded up to ``div``
    (U-Net divisibility).
    """
    vol32 = [-(-s // div) * div for s in vol_shape]
    win = [min(p, v) for p, v in zip(patch_size, vol32)]
    budget = float(budget_ratio) * float(np.prod(patch_size))
    while True:
        grown = False
        # Grow the least-covered axis first (fewest windows saved otherwise).
        for a in sorted(range(3), key=lambda a: win[a] / vol32[a]):
            if win[a] >= vol32[a]:
                continue
            new = min(win[a] + grow, vol32[a])
            if new * win[(a + 1) % 3] * win[(a + 2) % 3] <= budget:
                win[a] = new
                grown = True
                break
        if not grown:
            return tuple(win)


def pad_volume(
    vol: np.ndarray | jnp.ndarray, patch_size: tuple[int, int, int], pad_value: float
) -> tuple[jnp.ndarray, tuple[int, int, int]]:
    """Pad spatial dims up to at least patch_size (centered low-side at 0)."""
    pads = [(0, max(0, p - s)) for s, p in zip(vol.shape[:3], patch_size)]
    if vol.ndim == 4:
        pads = pads + [(0, 0)]
    if any(p[1] for p in pads):
        vol = jnp.pad(jnp.asarray(vol), pads, constant_values=pad_value)
    return jnp.asarray(vol), tuple(vol.shape[:3])


@partial(
    jax.jit,
    static_argnames=("apply_fn", "patch_size", "num_classes", "window_batch"),
    donate_argnums=(3, 4),
)
def _window_group_step(
    apply_fn,
    params,
    volume,  # (X, Y, Z, C) padded, float32
    accum,  # (X, Y, Z, K) float32, donated
    norm,  # (X, Y, Z, 1) float32, donated
    start_group,  # (B, 3) int32 device array
    gauss,  # (px, py, pz) float32
    patch_size: tuple[int, int, int],
    num_classes: int,
    window_batch: int,
):
    px, py, pz = patch_size
    C = volume.shape[-1]
    gauss4 = gauss[..., None]

    def extract(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0), (px, py, pz, C)
        )

    windows = jax.vmap(extract)(start_group)  # (B, px, py, pz, C)
    logits = apply_fn(params, windows)  # (B, px, py, pz, K)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * gauss4

    def acc_one(i, carry):
        accum, norm = carry
        s = start_group[i]
        idx = (s[0], s[1], s[2], 0)
        a_slice = jax.lax.dynamic_slice(accum, idx, (px, py, pz, num_classes))
        accum = jax.lax.dynamic_update_slice(accum, a_slice + probs[i], idx)
        n_slice = jax.lax.dynamic_slice(norm, idx, (px, py, pz, 1))
        norm = jax.lax.dynamic_update_slice(norm, n_slice + gauss4, idx)
        return accum, norm

    if window_batch == 1:
        return acc_one(0, (accum, norm))
    return jax.lax.fori_loop(0, window_batch, acc_one, (accum, norm))


@jax.jit
def _fuse_labels(accum, norm):
    probs = accum / norm
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8), probs


@partial(jax.jit, static_argnames=("apply_fn",))
def _single_pass(apply_fn, params, volume):
    logits = apply_fn(params, volume[None])[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(probs, axis=-1).astype(jnp.uint8), probs


def _sliding_window_device(
    apply_fn, params, volume, starts, gauss, patch_size, num_classes, window_batch
):
    X, Y, Z, _ = volume.shape
    accum = jnp.zeros((X, Y, Z, num_classes), jnp.float32)
    norm = jnp.full((X, Y, Z, 1), 1e-12, jnp.float32)
    n_groups = starts.shape[0] // window_batch
    starts_dev = jax.device_put(starts).reshape(n_groups, window_batch, 3)
    for g in range(n_groups):
        accum, norm = _window_group_step(
            apply_fn, params, volume, accum, norm, starts_dev[g], gauss,
            patch_size, num_classes, window_batch,
        )
    return _fuse_labels(accum, norm)


def sliding_window_predict(
    apply_fn,
    params,
    volume,
    patch_size: tuple[int, int, int],
    num_classes: int,
    overlap: float = 0.5,
    sigma_scale: float = 0.125,
    use_gaussian: bool = True,
    window_batch: int = 1,
    pad_value: float | None = None,
    return_probs: bool = False,
    single_pass_ratio: float = 1.75,
    expand_windows: bool = True,
):
    """Whole-volume prediction; returns uint8 labels (and probs if asked),
    shaped like the input volume.

    apply_fn(params, windows(B,px,py,pz,C)) -> logits (B,px,py,pz,K).

    Fast path: the U-Net is fully convolutional, so when the volume (padded
    to 32-divisible dims) is at most ``single_pass_ratio`` × the window
    volume, one whole-volume forward replaces overlapping windows + blending
    — fewer FLOPs and no accumulator traffic, same dense prediction.
    """
    vol = jnp.asarray(volume)
    if vol.ndim == 3:
        vol = vol[..., None]
    orig_shape = vol.shape[:3]
    if pad_value is None:
        # Device scalar, NOT float(): float() would block on a device->host
        # fetch (~38 ms tunnel RTT) before any real work could dispatch;
        # jnp.pad consumes the scalar asynchronously.
        pad_value = jnp.min(vol)

    # Divisibility guard: 32 covers <=6 U-Net levels; never exceed the patch
    # (a model accepting 16-cubed patches has <=5 levels anyway).
    div = min(32, min(patch_size))
    div32 = tuple(-(-s // div) * div for s in orig_shape)
    if (
        single_pass_ratio > 0
        and np.prod(div32) <= single_pass_ratio * np.prod(patch_size)
    ):
        pads = [(0, p - s) for s, p in zip(orig_shape, div32)] + [(0, 0)]
        v = jnp.pad(vol, pads, constant_values=pad_value) if any(p[1] for p in pads) else vol
        labels, probs = _single_pass(apply_fn, params, v.astype(jnp.float32))
        labels = labels[: orig_shape[0], : orig_shape[1], : orig_shape[2]]
        if return_probs:
            return labels, probs[: orig_shape[0], : orig_shape[1], : orig_shape[2]]
        return labels

    win = tuple(patch_size)
    if expand_windows and single_pass_ratio > 0:
        # Super-windows: a few large single-pass-budget windows instead of
        # dozens of patch-sized dispatches (see expand_window_size).
        win = expand_window_size(
            orig_shape, tuple(patch_size), single_pass_ratio, grow=2 * div, div=div
        )
    vol, padded_shape = pad_volume(vol, win, pad_value)

    if win == tuple(patch_size):
        starts = make_start_table(padded_shape, win, overlap, window_batch)
    else:
        # Absolute overlap of overlap×patch voxels between adjacent
        # super-windows (same blend margin as the patch scheme).
        strides = [
            max(1, w - int(round(p * overlap)))
            for w, p in zip(win, patch_size)
        ]
        starts = make_start_table(
            padded_shape, win, overlap, window_batch, strides=strides
        )
    if use_gaussian:
        gauss = gaussian_importance_map_device(win, sigma_scale)
    else:
        gauss = jnp.ones(win, jnp.float32)  # device fill, no host transfer

    labels, probs = _sliding_window_device(
        apply_fn,
        params,
        vol.astype(jnp.float32),
        starts,
        gauss,
        win,
        num_classes,
        window_batch,
    )
    labels = labels[: orig_shape[0], : orig_shape[1], : orig_shape[2]]
    if return_probs:
        return labels, probs[: orig_shape[0], : orig_shape[1], : orig_shape[2]]
    return labels
