"""Device-side label packing round-trips (infer/packing.py)."""

import numpy as np

import jax.numpy as jnp

from runet_tpu.infer.packing import (
    pack_bits,
    pack_nibbles,
    packed_bit_len,
    packed_nibble_len,
    unpack_bits,
    unpack_nibbles,
)


def test_nibble_roundtrip_even_and_odd_z():
    rng = np.random.default_rng(0)
    for z in (8, 9, 1, 2):
        labels = rng.integers(0, 16, size=(3, 5, z)).astype(np.uint8)
        packed = np.asarray(pack_nibbles(jnp.asarray(labels)))
        assert packed.shape == (3, 5, packed_nibble_len(z))
        np.testing.assert_array_equal(unpack_nibbles(packed, z), labels)


def test_bit_roundtrip_all_z_remainders():
    rng = np.random.default_rng(1)
    for z in (16, 17, 23, 1, 8):
        mask = (rng.uniform(size=(4, 3, z)) < 0.3).astype(np.uint8)
        packed = np.asarray(pack_bits(jnp.asarray(mask)))
        assert packed.shape == (4, 3, packed_bit_len(z))
        np.testing.assert_array_equal(unpack_bits(packed, z), mask)


def test_pack_sizes():
    assert packed_nibble_len(160) == 80
    assert packed_bit_len(160) == 20
    from runet_tpu.infer.packing import packed_crumb_len

    assert packed_crumb_len(160) == 40
    assert packed_crumb_len(161) == 41


def test_crumb_roundtrip_all_z_remainders():
    from runet_tpu.infer.packing import pack_crumbs, packed_crumb_len, unpack_crumbs

    rng = np.random.default_rng(2)
    for z in (8, 9, 10, 11, 1, 4):
        labels = rng.integers(0, 4, size=(3, 5, z)).astype(np.uint8)
        packed = np.asarray(pack_crumbs(jnp.asarray(labels)))
        assert packed.shape == (3, 5, packed_crumb_len(z))
        np.testing.assert_array_equal(unpack_crumbs(packed, z), labels)


def test_pack_width_by_alphabet():
    from runet_tpu.infer.packing import pack_width

    assert pack_width(3) == 2  # KiTS19 bg/kidney/tumor
    assert pack_width(4) == 2
    assert pack_width(5) == 4  # renal_anatomy
    assert pack_width(16) == 4
    assert pack_width(17) == 8


def test_native_paste_crumbs_matches_unpack_where():
    """2-bit sibling of the nibble paste parity test below."""
    from runet_tpu.infer.packing import pack_crumbs, unpack_crumbs
    from runet_tpu.utils.native import native_paste_crumbs

    if not native_paste_crumbs(
        np.zeros((1, 1, 1), np.uint8),
        np.zeros((1, 1, 1), np.uint8),
        np.zeros(3, np.int64),
        np.zeros(3, np.int64),
    ):
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(11)
    for _ in range(8):
        cshape = tuple(int(s) for s in rng.integers(10, 36, 3))
        canvas = rng.integers(0, 3, cshape).astype(np.uint8)
        wbuf = tuple(int(s) for s in rng.integers(4, 15, 3))
        labels = rng.integers(0, 4, wbuf).astype(np.uint8)
        packed = np.asarray(pack_crumbs(jnp.asarray(labels)))
        lo = np.array(
            [int(rng.integers(0, max(1, c - w))) if c > w else 0
             for c, w in zip(cshape, wbuf)]
        )
        ext = np.minimum(np.asarray(cshape) - lo, wbuf)
        ref = canvas.copy()
        crop = unpack_crumbs(packed, wbuf[2])[: ext[0], : ext[1], : ext[2]]
        dst = ref[lo[0]:lo[0]+ext[0], lo[1]:lo[1]+ext[1], lo[2]:lo[2]+ext[2]]
        ref[lo[0]:lo[0]+ext[0], lo[1]:lo[1]+ext[1], lo[2]:lo[2]+ext[2]] = (
            np.where(crop > 0, crop, dst)
        )
        got = canvas.copy()
        assert native_paste_crumbs(got, packed, lo, ext)
        np.testing.assert_array_equal(got, ref)


def test_cascade_quality_unchanged_by_packing():
    """predict_case end-to-end still produces the same labels as before the
    packed transfer (covered broadly by tests/test_cascade.py; this pins the
    mask-binarization semantics: any class > 0 is foreground)."""
    labels = jnp.asarray(np.array([[[0, 1, 2, 0, 3, 0, 0, 1]]], np.uint8))
    packed = np.asarray(pack_bits(labels > 0))
    np.testing.assert_array_equal(
        unpack_bits(packed, 8)[0, 0], [0, 1, 1, 0, 1, 0, 0, 1]
    )


def test_native_paste_nibbles_matches_unpack_where():
    """Fused native unpack+paste (cascade ROI write-back) == the numpy
    unpack_nibbles + np.where chain, including odd paste extents, clipped
    extents, and the keep-destination-on-zero overlap semantics."""
    from runet_tpu.infer.packing import unpack_nibbles
    from runet_tpu.utils.native import native_paste_nibbles

    if not native_paste_nibbles(
        np.zeros((1, 1, 1), np.uint8),
        np.zeros((1, 1, 1), np.uint8),
        np.zeros(3, np.int64),
        np.zeros(3, np.int64),
    ):
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(9)
    for _ in range(6):
        cshape = tuple(int(s) for s in rng.integers(10, 36, 3))
        canvas = rng.integers(0, 3, cshape).astype(np.uint8)
        wbuf = tuple(int(s) for s in rng.integers(4, 14, 3))
        labels = rng.integers(0, 16, wbuf).astype(np.uint8)
        packed = np.asarray(pack_nibbles(jnp.asarray(labels)))
        lo = np.array(
            [int(rng.integers(0, max(1, c - w))) if c > w else 0
             for c, w in zip(cshape, wbuf)]
        )
        ext = np.minimum(np.asarray(cshape) - lo, wbuf)
        ref = canvas.copy()
        crop = unpack_nibbles(packed, wbuf[2])[: ext[0], : ext[1], : ext[2]]
        dst = ref[lo[0]:lo[0]+ext[0], lo[1]:lo[1]+ext[1], lo[2]:lo[2]+ext[2]]
        ref[lo[0]:lo[0]+ext[0], lo[1]:lo[1]+ext[1], lo[2]:lo[2]+ext[2]] = (
            np.where(crop > 0, crop, dst)
        )
        got = canvas.copy()
        assert native_paste_nibbles(got, packed, lo, ext)
        np.testing.assert_array_equal(got, ref)
