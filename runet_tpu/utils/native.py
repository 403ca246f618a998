"""ctypes loader for the native C++ runtime components (SURVEY.md §2.2).

The reference inherited its native tier through scipy/SimpleITK/ATen; the
rebuild ships its own: ``native/cc3d.cpp`` (union-find connected components).
Build lazily with g++ on first use; every caller must handle ``None`` (scipy
fallback) so a missing toolchain never breaks the pipeline.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "cc3d.cpp"
_LIB = _REPO_ROOT / "native" / "build" / "libcc3d.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False
_has_ext = False  # zero_nonkept_3d / component_stats_3d present in the .so
_has_boxes = False  # keep_largest_in_boxes_3d present in the .so
_has_crumbs = False  # paste_crumbs_3d present in the .so


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # A deployed prebuilt .so without the .cpp source is valid (use it);
        # neither present -> scipy fallback, never a FileNotFoundError.
        if _LIB.exists() and not _SRC.exists():
            pass  # fall through to load the prebuilt library
        elif not _SRC.exists():
            _build_failed = True
            return None
        elif not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _LIB.parent.mkdir(parents=True, exist_ok=True)
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", str(_SRC), "-o", str(_LIB),
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.label_components_3d.restype = ctypes.c_int32
        lib.label_components_3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.keep_largest_components_3d.restype = None
        lib.keep_largest_components_3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
        ]
        # Older prebuilt .so deployments may predate these symbols; probe and
        # let callers fall back to numpy for just the extended entry points.
        global _has_ext
        try:
            lib.zero_nonkept_3d.restype = None
            lib.zero_nonkept_3d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.component_stats_3d.restype = None
            lib.component_stats_3d.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _has_ext = True
        except AttributeError:
            _has_ext = False
        # Newer still than the _has_ext set — probe independently so an old
        # prebuilt .so degrades per-symbol, not wholesale.
        global _has_boxes
        try:
            lib.keep_largest_in_boxes_3d.restype = ctypes.c_int64
            lib.keep_largest_in_boxes_3d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int64,
            ]
            lib.paste_nibbles_3d.restype = None
            lib.paste_nibbles_3d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
            ] + [ctypes.c_int64] * 6
            _has_boxes = True
        except AttributeError:
            _has_boxes = False
        global _has_crumbs
        try:
            lib.paste_crumbs_3d.restype = None
            lib.paste_crumbs_3d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int64,
            ] + [ctypes.c_int64] * 6
            _has_crumbs = True
        except AttributeError:
            _has_crumbs = False
        _lib = lib
        return _lib


def native_keep_largest(
    seg: np.ndarray,
    labels: np.ndarray,
    n_labels: int,
    keep_k: int,
    min_voxels: int = 0,
) -> bool:
    """In-place zero of non-top-k components. Returns False if unavailable."""
    lib = _load()
    if lib is None:
        return False
    assert seg.dtype == np.uint8 and seg.flags.c_contiguous
    assert labels.dtype == np.int32 and labels.flags.c_contiguous
    lib.keep_largest_components_3d(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        seg.size,
        n_labels,
        keep_k,
        min_voxels,
    )
    return True


def native_label_components(mask: np.ndarray) -> tuple[np.ndarray, int] | None:
    """6-connected labeling via C++ union-find; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert mask.dtype == np.uint8 and mask.flags.c_contiguous
    out = np.empty(mask.shape, np.int32)
    n = lib.label_components_3d(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.shape[0],
        mask.shape[1],
        mask.shape[2],
    )
    if n < 0:
        return None
    return out, int(n)


def native_zero_nonkept(seg: np.ndarray, labels: np.ndarray, keep_lut: np.ndarray) -> bool:
    """In-place zero of voxels whose component id is unmarked in ``keep_lut``
    (uint8, length n_labels+1, index 0 ignored). False if unavailable."""
    lib = _load()
    if lib is None or not _has_ext:
        return False
    assert seg.dtype == np.uint8 and seg.flags.c_contiguous
    assert labels.dtype == np.int32 and labels.flags.c_contiguous
    assert keep_lut.dtype == np.uint8 and keep_lut.flags.c_contiguous
    lib.zero_nonkept_3d(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        seg.size,
        keep_lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return True


def native_keep_largest_in_boxes(
    seg: np.ndarray,
    boxes: np.ndarray,
    keep_k: int,
    min_voxels: int = 0,
) -> bool:
    """Fused in-place box-scoped keep-largest on a uint8 canvas: run-based CC
    per (disjoint) box, global size ranking across boxes, kill non-kept runs.
    ``boxes``: int64 (B, 6) rows of (x0, y0, z0, x1, y1, z1) exclusive,
    pre-clamped to the canvas. Returns False if the native tier is
    unavailable (caller falls back to the numpy chain)."""
    lib = _load()
    if lib is None or not _has_boxes:
        return False
    assert seg.dtype == np.uint8 and seg.flags.c_contiguous and seg.ndim == 3
    boxes = np.ascontiguousarray(boxes, np.int64)
    assert boxes.ndim == 2 and boxes.shape[1] == 6
    lib.keep_largest_in_boxes_3d(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seg.shape[0],
        seg.shape[1],
        seg.shape[2],
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        boxes.shape[0],
        keep_k,
        min_voxels,
    )
    return True


def native_paste_nibbles(
    canvas: np.ndarray,
    packed: np.ndarray,
    lo: np.ndarray,
    extent: np.ndarray,
) -> bool:
    """Fused in-place nibble-unpack + nonzero paste: the (extent) prefix of
    the nibble-packed crop lands at ``canvas[lo : lo+extent]``; nonzero
    nibbles overwrite, zeros keep the destination. False if unavailable."""
    lib = _load()
    if lib is None or not _has_boxes:
        return False
    assert canvas.dtype == np.uint8 and canvas.flags.c_contiguous
    # jax->numpy fetches can come back with non-C strides; normalizing the
    # small packed crop is cheap (no-op when already contiguous).
    packed = np.ascontiguousarray(packed, np.uint8)
    assert packed.ndim == 3 and canvas.ndim == 3
    ex, ey, ez = (int(e) for e in extent)
    assert ex <= packed.shape[0] and ey <= packed.shape[1]
    assert -(-ez // 2) <= packed.shape[2]
    lib.paste_nibbles_3d(
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[1],
        canvas.shape[2],
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        packed.shape[1],
        packed.shape[2],
        int(lo[0]),
        int(lo[1]),
        int(lo[2]),
        ex,
        ey,
        ez,
    )
    return True


def native_paste_crumbs(
    canvas: np.ndarray,
    packed: np.ndarray,
    lo: np.ndarray,
    extent: np.ndarray,
) -> bool:
    """2-bit sibling of ``native_paste_nibbles`` (pack_crumbs encoding,
    4 voxels/byte LSB-first). False if unavailable."""
    lib = _load()
    if lib is None or not _has_crumbs:
        return False
    assert canvas.dtype == np.uint8 and canvas.flags.c_contiguous
    packed = np.ascontiguousarray(packed, np.uint8)
    assert packed.ndim == 3 and canvas.ndim == 3
    ex, ey, ez = (int(e) for e in extent)
    assert ex <= packed.shape[0] and ey <= packed.shape[1]
    assert -(-ez // 4) <= packed.shape[2]
    lib.paste_crumbs_3d(
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[1],
        canvas.shape[2],
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        packed.shape[1],
        packed.shape[2],
        int(lo[0]),
        int(lo[1]),
        int(lo[2]),
        ex,
        ey,
        ez,
    )
    return True


def native_component_stats(
    labels: np.ndarray, n_labels: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """One-pass per-component (sizes int64[n], boxes int64[n,6] as
    x0,y0,z0,x1,y1,z1 exclusive); None if unavailable."""
    lib = _load()
    if lib is None or not _has_ext or n_labels <= 0:
        return None
    assert labels.dtype == np.int32 and labels.flags.c_contiguous
    sizes = np.empty(n_labels, np.int64)
    boxes = np.empty((n_labels, 6), np.int64)
    lib.component_stats_3d(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.shape[0],
        labels.shape[1],
        labels.shape[2],
        n_labels,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return sizes, boxes
