import numpy as np
import pytest

from runet_tpu.preprocess.normalize import normalize, preprocess_case
from runet_tpu.preprocess.resample import (
    numpy_reference_resample,
    output_shape_for_spacing,
    resample,
    resample_labels_onehot,
    resample_to_shape,
    resample_to_spacing,
)


def test_output_shape_for_spacing():
    assert output_shape_for_spacing((100, 100, 50), (1, 1, 2), (1, 1, 1)) == (100, 100, 100)
    assert output_shape_for_spacing((100, 100, 50), (0.5, 0.5, 0.5), (1, 1, 1)) == (50, 50, 25)
    assert output_shape_for_spacing((3, 3, 3), (1, 1, 1), (100, 100, 100)) == (1, 1, 1)


@pytest.mark.parametrize("scale", [(0.5, 0.5, 0.5), (2.0, 1.7, 0.33), (1.0, 1.0, 1.0)])
def test_linear_matches_scipy_golden(scale):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(17, 13, 11)).astype(np.float32)
    out_shape = tuple(max(1, int(round(n / s))) for n, s in zip(x.shape, scale))
    got = np.asarray(resample(x, out_shape, scale, method="linear"))
    want = numpy_reference_resample(x, out_shape, scale, order=1)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_nearest_matches_scipy_golden():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 5, size=(19, 10, 14)).astype(np.int32)
    scale = (1.9, 0.6, 1.3)
    out_shape = tuple(max(1, int(round(n / s))) for n, s in zip(x.shape, scale))
    got = np.asarray(resample(x, out_shape, scale, method="nearest"))
    want = numpy_reference_resample(x, out_shape, scale, order=0)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_identity_resample_is_exact():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 9, 10)).astype(np.float32)
    got = np.asarray(resample(x, x.shape, (1.0, 1.0, 1.0), method="linear"))
    np.testing.assert_array_equal(got, x)


def test_roundtrip_native_iso_native_error_bound():
    # SURVEY §4.5: round-trip resample error bound on a smooth volume.
    g = np.mgrid[0:32, 0:32, 0:16].astype(np.float32)
    x = np.sin(g[0] / 5) + np.cos(g[1] / 7) + g[2] / 16.0
    native_spacing, iso_spacing = (0.8, 0.8, 2.0), (1.0, 1.0, 1.0)
    iso = resample_to_spacing(x, native_spacing, iso_spacing)
    back = resample_to_shape(np.asarray(iso), x.shape, iso_spacing, native_spacing)
    assert np.abs(np.asarray(back) - x).mean() < 0.05


def test_label_onehot_resample_preserves_classes():
    labels = np.zeros((12, 12, 12), dtype=np.int32)
    labels[3:9, 3:9, 3:9] = 1
    labels[5:7, 5:7, 5:7] = 2
    out = np.asarray(
        resample_labels_onehot(labels, (24, 24, 24), (0.5, 0.5, 0.5), num_classes=3)
    )
    assert set(np.unique(out)) == {0, 1, 2}
    # Upsampled interior should still be the right class.
    assert out[12, 12, 12] == 2
    assert out[7, 7, 7] == 1
    assert out[0, 0, 0] == 0


def test_normalize_fixed_stats():
    x = np.array([[[-1000.0, 0.0, 500.0]]], dtype=np.float32)
    out = np.asarray(normalize(x, hu_window=(-79.0, 304.0), hu_stats=(100.93, 76.9)))
    np.testing.assert_allclose(out[0, 0, 0], (-79.0 - 100.93) / 76.9, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2], (304.0 - 100.93) / 76.9, rtol=1e-5)


def test_normalize_per_volume():
    rng = np.random.default_rng(4)
    x = rng.normal(100.0, 50.0, size=(10, 10, 10)).astype(np.float32)
    out = np.asarray(normalize(x, hu_window=(-500.0, 500.0), hu_stats=None))
    assert abs(out.mean()) < 1e-4
    assert abs(out.std() - 1.0) < 1e-3


def test_preprocess_case_pipeline():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 200, size=(20, 20, 10)).astype(np.float32)
    out = preprocess_case(x, (1.0, 1.0, 2.0), (1.0, 1.0, 1.0))
    assert out.shape == (20, 20, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_resample_dynamic_matches_static():
    """The traced-scale resample (used by the cascade so compile classes
    don't scale with native spacing) must match the static-scale path to
    float32 position tolerance on both methods."""
    import jax.numpy as jnp

    from runet_tpu.preprocess.resample import resample, resample_dynamic

    rng = np.random.default_rng(3)
    x = rng.normal(0, 100, (23, 17, 29)).astype(np.float32)
    for scale in [(1.0, 1.0, 1.0), (0.73, 1.31, 2.05), (3.3, 0.4, 1.0)]:
        out_shape = tuple(
            max(1, int(round(n / s))) for n, s in zip(x.shape, scale)
        )
        for method in ("linear", "nearest"):
            a = np.asarray(resample(jnp.asarray(x), out_shape, scale, method))
            b = np.asarray(
                resample_dynamic(
                    jnp.asarray(x), out_shape, np.asarray(scale, np.float32),
                    method,
                )
            )
            # f32 position rounding can flip a nearest/floor index only
            # within ~1e-4 of a voxel boundary; values must agree tightly
            # almost everywhere and never wildly.
            close = np.isclose(a, b, rtol=1e-4, atol=1e-2)
            assert close.mean() > 0.999, (method, scale, close.mean())


def test_resample_labels_onehot_dynamic_matches_static():
    from runet_tpu.preprocess.resample import (
        resample_labels_onehot,
        resample_labels_onehot_dynamic,
    )

    rng = np.random.default_rng(5)
    labels = (rng.uniform(size=(19, 23, 15)) * 4).astype(np.int32)
    scale = (0.8, 1.27, 1.9)
    out_shape = (24, 18, 8)
    a = np.asarray(resample_labels_onehot(labels, out_shape, scale, 4))
    b = np.asarray(
        resample_labels_onehot_dynamic(
            labels, out_shape, np.asarray(scale, np.float32), 4
        )
    )
    assert (a == b).mean() > 0.995, (a != b).sum()
