"""Device-side label packing for tunnel-thrifty fetches (SURVEY.md §3.2
"host sees only the final labelmap" — this makes that labelmap cheap).

The device→host hop on this deployment is the PJRT tunnel (~36 MB/s
measured). Class labels need 4 bits (K ≤ 16) and the coarse mask needs 1 —
so pack on device (vector ops, free next to a U-Net forward) and unpack with
vectorized numpy on the host. Measured effect on the single-case cascade:
small (the label fetch overlaps ROI compute, which dominates — the fetch
phase is compute-wait, not bytes); the real win is whole-volume
``predict_volume`` (42 MB → 21 MB native label fetch) and any multi-case
pipeline where fetches can no longer hide behind compute:

- ``pack_nibbles`` / ``unpack_nibbles``: uint8 labels → 2 voxels/byte (2×)
- ``pack_crumbs`` / ``unpack_crumbs``: uint8 labels < 4 → 4 voxels/byte (4×)
- ``pack_bits`` / ``unpack_bits``: binary mask → 8 voxels/byte (8×)

All pack along the LAST axis (Z, contiguous in C-order on both ends).
``pack_width(num_classes)`` picks the widest lossless packing for a label
alphabet: KiTS19's 3 classes ride the 2-bit lanes (half the fetch bytes of
nibbles), renal_anatomy's 5 classes the 4-bit lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def packed_nibble_len(n: int) -> int:
    return -(-n // 2)


def pack_nibbles(labels: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., Z) with values < 16 → uint8 (..., ceil(Z/2)).

    Odd Z is zero-padded; ``unpack_nibbles(..., n=Z)`` slices it back off.
    """
    z = labels.shape[-1]
    if z % 2:
        pad = [(0, 0)] * (labels.ndim - 1) + [(0, 1)]
        labels = jnp.pad(labels, pad)
    lo = labels[..., 0::2]
    hi = labels[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_nibbles(packed: np.ndarray, n: int) -> np.ndarray:
    """Host inverse of ``pack_nibbles``: uint8 (..., ceil(n/2)) → (..., n)."""
    packed = np.asarray(packed)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = packed & 0x0F
    out[..., 1::2] = packed >> 4
    return out[..., :n]


def packed_crumb_len(n: int) -> int:
    return -(-n // 4)


def pack_crumbs(labels: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., Z) with values < 4 → uint8 (..., ceil(Z/4)), LSB-first.

    Short Z is zero-padded; ``unpack_crumbs(..., n=Z)`` slices it back off.
    """
    z = labels.shape[-1]
    pad_z = packed_crumb_len(z) * 4 - z
    if pad_z:
        pad = [(0, 0)] * (labels.ndim - 1) + [(0, pad_z)]
        labels = jnp.pad(labels, pad)
    l = labels.astype(jnp.uint8)
    return (
        l[..., 0::4]
        | (l[..., 1::4] << 2)
        | (l[..., 2::4] << 4)
        | (l[..., 3::4] << 6)
    ).astype(jnp.uint8)


def unpack_crumbs(packed: np.ndarray, n: int) -> np.ndarray:
    """Host inverse of ``pack_crumbs``: uint8 (..., ceil(n/4)) → (..., n)."""
    packed = np.asarray(packed)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 4,), np.uint8)
    out[..., 0::4] = packed & 0x03
    out[..., 1::4] = (packed >> 2) & 0x03
    out[..., 2::4] = (packed >> 4) & 0x03
    out[..., 3::4] = packed >> 6
    return out[..., :n]


def pack_width(num_classes: int) -> int:
    """Lossless bits-per-voxel for a label alphabet of ``num_classes``:
    2 (K ≤ 4), 4 (K ≤ 16), or 8 (no packing)."""
    if num_classes <= 4:
        return 2
    if num_classes <= 16:
        return 4
    return 8


def packed_bit_len(n: int) -> int:
    return -(-n // 8)


def pack_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """bool/uint8 (..., Z) → uint8 (..., ceil(Z/8)), LSB-first per byte."""
    z = mask.shape[-1]
    pad_z = packed_bit_len(z) * 8 - z
    m = mask.astype(jnp.uint8)
    if pad_z:
        m = jnp.pad(m, [(0, 0)] * (mask.ndim - 1) + [(0, pad_z)])
    m = m.reshape(m.shape[:-1] + (-1, 8))
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(m * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: np.ndarray, n: int) -> np.ndarray:
    """Host inverse of ``pack_bits`` → uint8 0/1 (..., n)."""
    packed = np.asarray(packed)
    bits = np.unpackbits(packed, axis=-1, bitorder="little")
    return bits[..., :n]
