"""Connected-component postprocessing (SURVEY.md L8).

Reference: ``scipy.ndimage.label`` + drop spurious components, keep ≤2
largest kidney CCs (provenance [BASELINE]/[DOMAIN]). Rebuild: a native C++
union-find labeling core (native/cc3d.cpp, loaded via ctypes — the
TPU-native equivalent of scipy's C internals per SURVEY.md §2.2) with a
scipy fallback so the path always works.
"""

from __future__ import annotations

import numpy as np

from runet_tpu.utils.native import (
    native_component_stats,
    native_keep_largest,
    native_keep_largest_in_boxes,
    native_label_components,
    native_zero_nonkept,
)


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """6-connected 3D labeling. Returns (labels int32, num_components)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    out = native_label_components(mask)
    if out is not None:
        return out
    from scipy import ndimage

    lab, n = ndimage.label(mask)
    return lab.astype(np.int32), int(n)


def component_sizes(labels: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(labels.ravel(), minlength=n + 1)[1:]


def keep_largest_components(
    seg: np.ndarray,
    foreground_classes: tuple[int, ...] | None = None,
    max_components: int = 2,
    min_voxels: int = 0,
) -> np.ndarray:
    """Keep the ``max_components`` largest CCs of the foreground union and
    zero out everything else (KiTS: ≤2 kidney+tumor components)."""
    if foreground_classes is None:
        # Nonzero == foreground: take the fused native path (one read pass
        # + killed-run writes; no int32 label volume, no bool/uint8 temps).
        out = np.ascontiguousarray(seg.copy())
        if out.dtype == np.uint8:
            box = np.asarray([[0, 0, 0, *out.shape]], np.int64)
            if native_keep_largest_in_boxes(out, box, max_components, min_voxels):
                return out
        fg = seg > 0
    else:
        fg = np.isin(seg, foreground_classes)
    labels, n = label_components(fg)
    if n == 0:
        return seg
    out = np.ascontiguousarray(seg.copy())
    if out.dtype == np.uint8 and native_keep_largest(
        out, labels, n, max_components, min_voxels
    ):
        return out
    sizes = component_sizes(labels, n)
    order = np.argsort(sizes)[::-1]
    keep = [i + 1 for i in order[:max_components] if sizes[i] > min_voxels]
    keep_mask = np.isin(labels, keep)
    out[fg & ~keep_mask] = 0
    return out


def _merge_overlapping_boxes(
    boxes: list[tuple[np.ndarray, np.ndarray]],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Union-merge AABBs until pairwise disjoint. Boxes can overlap after
    margin expansion; labeling overlapping crops independently would let a
    later box's write-back zero voxels of a component an earlier box kept."""
    boxes = [(np.asarray(lo), np.asarray(hi)) for lo, hi in boxes]
    merged = True
    while merged:
        merged = False
        out: list[tuple[np.ndarray, np.ndarray]] = []
        for lo, hi in boxes:
            for i, (olo, ohi) in enumerate(out):
                # <= : merge exactly face-adjacent boxes too — a component
                # crossing a shared face would otherwise be labeled as two
                # fragments and the smaller could lose the top-k ranking.
                if np.all(lo <= ohi) and np.all(olo <= hi):
                    out[i] = (np.minimum(lo, olo), np.maximum(hi, ohi))
                    merged = True
                    break
            else:
                out.append((lo, hi))
        boxes = out
    return boxes


def keep_largest_components_in_boxes(
    seg: np.ndarray,
    boxes: list[tuple[np.ndarray, np.ndarray]],
    max_components: int = 2,
    min_voxels: int = 0,
    inplace: bool = False,
) -> np.ndarray:
    """Box-scoped variant of keep_largest_components for cascade outputs.

    Cascade predictions are zero outside the pasted ROI boxes, so labeling
    the whole native volume is wasted single-core host time (~3 s at KiTS
    scale). Overlapping boxes are union-merged first (so each voxel is
    labeled exactly once), then component sizes are ranked globally across
    boxes and only the top ``max_components`` survive.

    Fast path: one fused native call (``keep_largest_in_boxes_3d``) that
    builds z-runs per box directly on the canvas — one read pass over box
    voxels plus writes to killed runs only. The numpy/int32-label chain
    below is the fallback. ``inplace=True`` skips the defensive full-canvas
    copy (the cascade's canvas is function-local).
    """
    boxes = _merge_overlapping_boxes(boxes)
    out = seg if inplace else seg.copy()
    if out.dtype == np.uint8 and out.flags.c_contiguous and boxes:
        arr = np.asarray(
            [np.concatenate([lo, hi]) for lo, hi in boxes], np.int64
        )
        if native_keep_largest_in_boxes(out, arr, max_components, min_voxels):
            return out
    crops = []  # (crop, labels, n)
    size_chunks = []  # per-box component sizes, concatenated for global rank
    for lo, hi in boxes:
        # Explicit copy: a whole-volume box would otherwise alias `out` and
        # the in-place kill below would corrupt the paste source.
        crop = out[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]].copy()
        labels, n = label_components(crop > 0)
        crops.append((crop, labels, n))
        stats = native_component_stats(labels, n)
        sizes = stats[0] if stats is not None else component_sizes(labels, n)
        size_chunks.append(sizes.astype(np.int64))
    # Rank component sizes globally across boxes (vectorized: speckly
    # predictions can carry thousands of components per box).
    all_sizes = (
        np.concatenate(size_chunks) if size_chunks else np.zeros(0, np.int64)
    )
    k = min(max_components, all_sizes.size)
    top = np.argpartition(all_sizes, -k)[-k:] if k else np.zeros(0, np.intp)
    top = top[all_sizes[top] > min_voxels]
    offsets = np.cumsum([0] + [s.size for s in size_chunks])
    for bi, (lo, hi) in enumerate(boxes):
        crop, labels, n = crops[bi]
        if n == 0:
            continue
        keep_lut = np.zeros(n + 1, np.uint8)
        local = top[(top >= offsets[bi]) & (top < offsets[bi + 1])] - offsets[bi]
        keep_lut[local + 1] = 1
        if crop.dtype != np.uint8 or not native_zero_nonkept(crop, labels, keep_lut):
            crop[~keep_lut.view(np.bool_)[labels]] = 0  # LUT gather, not isin
        out[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]] = crop
    return out


def component_bounding_boxes(
    mask: np.ndarray,
    max_components: int = 2,
    min_voxels: int = 32,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """(lo, hi) inclusive-exclusive voxel bounds of the largest components,
    ordered by size (cascade ROI extraction, SURVEY.md §3.2)."""
    labels, n = label_components(mask)
    if n == 0:
        return []
    stats = native_component_stats(labels, n)
    if stats is not None:
        sizes, all_boxes = stats
    else:
        sizes = component_sizes(labels, n)
        all_boxes = None
    order = np.argsort(sizes)[::-1]
    boxes = []
    for i in order[:max_components]:
        if sizes[i] < min_voxels:
            continue
        if all_boxes is not None:
            boxes.append((all_boxes[i, :3].copy(), all_boxes[i, 3:].copy()))
        else:
            coords = np.argwhere(labels == i + 1)
            boxes.append((coords.min(axis=0), coords.max(axis=0) + 1))
    return boxes
