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


def test_cascade_quality_unchanged_by_packing():
    """predict_case end-to-end still produces the same labels as before the
    packed transfer (covered broadly by tests/test_cascade.py; this pins the
    mask-binarization semantics: any class > 0 is foreground)."""
    labels = jnp.asarray(np.array([[[0, 1, 2, 0, 3, 0, 0, 1]]], np.uint8))
    packed = np.asarray(pack_bits(labels > 0))
    np.testing.assert_array_equal(
        unpack_bits(packed, 8)[0, 0], [0, 1, 1, 0, 1, 0, 0, 1]
    )
