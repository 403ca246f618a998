import gzip
import struct

import numpy as np
import pytest

from runet_tpu.io.nifti import Volume, load_volume, save_volume


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.uint8])
def test_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(-500, 1500, size=(7, 9, 5)).astype(dtype)
    else:
        data = rng.normal(size=(7, 9, 5)).astype(dtype)
    spacing = (0.8, 0.8, 2.5)
    p = tmp_path / f"vol{suffix}"
    save_volume(p, data, spacing=spacing)
    vol = load_volume(p)
    assert vol.shape == (7, 9, 5)
    assert vol.spacing == pytest.approx(spacing, rel=1e-5)
    np.testing.assert_array_equal(vol.data, data)


def test_affine_roundtrip(tmp_path):
    data = np.zeros((4, 4, 4), dtype=np.uint8)
    affine = np.array(
        [
            [0.0, -0.8, 0.0, 10.0],
            [0.8, 0.0, 0.0, -20.0],
            [0.0, 0.0, 2.5, 30.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    p = tmp_path / "aff.nii.gz"
    save_volume(p, data, spacing=(0.8, 0.8, 2.5), affine=affine)
    vol = load_volume(p)
    np.testing.assert_allclose(vol.affine, affine, atol=1e-5)


def test_fortran_order_layout(tmp_path):
    # Voxel (x, y, z) must land at file offset x + nx*y + nx*ny*z.
    data = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "f.nii"
    save_volume(p, data)
    raw = p.read_bytes()
    flat = np.frombuffer(raw, dtype=np.int16, offset=352)
    assert flat[0] == data[0, 0, 0]
    assert flat[1] == data[1, 0, 0]  # x fastest
    assert flat[2] == data[0, 1, 0]
    vol = load_volume(p)
    np.testing.assert_array_equal(vol.data, data)


def test_scl_slope_inter(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "s.nii"
    save_volume(p, data)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
    struct.pack_into("<f", raw, 116, -1.0)  # scl_inter
    p.write_bytes(bytes(raw))
    vol = load_volume(p)
    np.testing.assert_allclose(vol.data, data.astype(np.float32) * 2.0 - 1.0)


def test_qform_affine(tmp_path):
    # Identity quaternion -> diagonal spacing affine with offsets.
    data = np.zeros((3, 3, 3), dtype=np.uint8)
    p = tmp_path / "q.nii"
    save_volume(p, data, spacing=(1.5, 2.0, 3.0))
    raw = bytearray(p.read_bytes())
    struct.pack_into("<h", raw, 252, 1)  # qform_code = 1
    struct.pack_into("<h", raw, 254, 0)  # sform_code = 0
    struct.pack_into("<f", raw, 268, 5.0)
    struct.pack_into("<f", raw, 272, 6.0)
    struct.pack_into("<f", raw, 276, 7.0)
    p.write_bytes(bytes(raw))
    vol = load_volume(p)
    expect = np.array(
        [
            [1.5, 0, 0, 5.0],
            [0, 2.0, 0, 6.0],
            [0, 0, 3.0, 7.0],
            [0, 0, 0, 1.0],
        ]
    )
    np.testing.assert_allclose(vol.affine, expect, atol=1e-6)


def test_gzip_transparent(tmp_path):
    data = np.ones((3, 3, 3), dtype=np.float32)
    p = tmp_path / "z.nii.gz"
    save_volume(p, data)
    with gzip.open(p, "rb") as f:
        assert f.read(4) == struct.pack("<i", 348)
