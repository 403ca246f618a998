"""Foreground-biased ("patch-balanced") patch sampler (SURVEY.md L2).

BASELINE.json north_star: "random/ROI patch sampling ... patch-balanced
sampling" for class imbalance. Reference form: numpy RNG cropping inside a
PyTorch Dataset (SURVEY.md §2.1 "Patch sampler", provenance [DOMAIN]).

Host-side numpy: sampling is index bookkeeping, not compute — the device only
ever sees the final fixed-size patch batch. Volumes smaller than the patch are
padded (image: min value; labels: 0).
"""

from __future__ import annotations

import numpy as np

from runet_tpu.data.dataset import PreparedCase


def _crop_with_pad(
    arr: np.ndarray, start: np.ndarray, size: tuple[int, int, int], pad_value
) -> np.ndarray:
    """Crop arr[start : start+size] with out-of-range regions padded."""
    out = np.full(size, pad_value, dtype=arr.dtype)
    src_lo = np.maximum(start, 0)
    src_hi = np.minimum(start + size, arr.shape)
    dst_lo = src_lo - start
    dst_hi = dst_lo + (src_hi - src_lo)
    if np.any(src_hi <= src_lo):
        return out
    out[dst_lo[0] : dst_hi[0], dst_lo[1] : dst_hi[1], dst_lo[2] : dst_hi[2]] = arr[
        src_lo[0] : src_hi[0], src_lo[1] : src_hi[1], src_lo[2] : src_hi[2]
    ]
    return out


def sample_patch(
    rng: np.random.Generator,
    case: PreparedCase,
    patch_size: tuple[int, int, int],
    fg_prob: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Draw one (image_patch, label_patch) pair.

    With probability ``fg_prob`` the patch is centered on a random foreground
    voxel of a uniformly chosen present class (tumor as likely as kidney
    regardless of voxel counts — that is the class-balancing part); otherwise
    the origin is uniform over valid positions.
    """
    size = np.asarray(patch_size)
    shape = np.asarray(case.image.shape)

    use_fg = (
        case.fg_coords is not None
        and len(case.fg_coords) > 0
        and rng.uniform() < fg_prob
    )
    if use_fg:
        cls = rng.choice(sorted(case.fg_coords.keys()))
        coords = case.fg_coords[cls]
        center = coords[rng.integers(len(coords))]
        start = center - size // 2
        # Keep patch inside the volume where possible (shift, don't pad).
        start = np.clip(start, 0, np.maximum(shape - size, 0))
    else:
        hi = np.maximum(shape - size, 0) + 1
        start = np.array([rng.integers(h) for h in hi])

    img = _crop_with_pad(case.image, start, tuple(size), case.image.min())
    lab = _crop_with_pad(case.labels, start, tuple(size), 0)
    return img, lab


def sample_batch(
    rng: np.random.Generator,
    cases: list[PreparedCase],
    batch_size: int,
    patch_size: tuple[int, int, int],
    fg_prob: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch of patches from uniformly chosen cases.

    Returns image (B, X, Y, Z, 1) float32 and labels (B, X, Y, Z) int32 —
    NDHWC, the TPU-native layout (channels on lanes).
    """
    imgs, labs = [], []
    for _ in range(batch_size):
        case = cases[rng.integers(len(cases))]
        img, lab = sample_patch(rng, case, patch_size, fg_prob)
        imgs.append(img)
        labs.append(lab)
    images = np.stack(imgs)[..., None].astype(np.float32)
    labels = np.stack(labs).astype(np.int32)
    return images, labels
