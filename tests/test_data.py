import numpy as np

import jax
import jax.numpy as jnp

from runet_tpu.config import PreprocessConfig
from runet_tpu.data.augment import augment_batch
from runet_tpu.data.dataset import index_cases, prepare_case, prepare_dataset
from runet_tpu.data.phantom import make_phantom, write_phantom_dataset
from runet_tpu.data.pipeline import PatchLoader
from runet_tpu.data.sampler import sample_batch, sample_patch


def test_phantom_basic():
    img, seg = make_phantom((48, 48, 32), num_classes=3, seed=0)
    assert img.shape == (48, 48, 32) and seg.shape == (48, 48, 32)
    assert set(np.unique(seg)) == {0, 1, 2}
    assert img[seg == 1].mean() > 0  # kidney HU ~30
    assert img[0, 0, 0] < -500  # air outside body


def test_phantom_renal_anatomy_classes():
    _, seg = make_phantom((48, 48, 32), num_classes=5, seed=1)
    assert set(np.unique(seg)) == {0, 1, 2, 3, 4}


def test_dataset_roundtrip(tmp_path):
    ids = write_phantom_dataset(tmp_path, num_cases=2, shape=(40, 40, 24))
    recs = index_cases(tmp_path)
    assert [r.case_id for r in recs] == ids
    pp = PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None)
    case = prepare_case(recs[0], pp)
    # native (40,40,24) @ (1,1,2)mm -> (20,20,24) @ 2mm iso
    assert case.image.shape == (20, 20, 24)
    assert case.labels.shape == (20, 20, 24)
    assert case.native_shape == (40, 40, 24)
    assert 1 in case.fg_coords and 2 in case.fg_coords
    # fg coords actually index the class
    c = case.fg_coords[1][0]
    assert case.labels[c[0], c[1], c[2]] == 1


def test_sampler_fg_bias(tmp_path):
    write_phantom_dataset(tmp_path, num_cases=1, shape=(64, 64, 40))
    pp = PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None)
    cases = prepare_dataset(tmp_path, pp)
    rng = np.random.default_rng(0)
    # With fg_prob=1 every patch center region must contain foreground.
    hits = 0
    for _ in range(20):
        img, lab = sample_patch(rng, cases[0], (24, 24, 24), fg_prob=1.0)
        assert img.shape == (24, 24, 24) and lab.shape == (24, 24, 24)
        if (lab > 0).any():
            hits += 1
    assert hits == 20
    # Tumor must appear in a decent fraction (class-balanced pick).
    tumor = sum(
        (sample_patch(rng, cases[0], (24, 24, 24), fg_prob=1.0)[1] == 2).any()
        for _ in range(30)
    )
    assert tumor >= 10


def test_sampler_patch_larger_than_volume(tmp_path):
    write_phantom_dataset(tmp_path, num_cases=1, shape=(20, 20, 12))
    pp = PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None)
    cases = prepare_dataset(tmp_path, pp)
    rng = np.random.default_rng(1)
    img, lab = sample_patch(rng, cases[0], (32, 32, 32), fg_prob=0.5)
    assert img.shape == (32, 32, 32)
    assert lab.shape == (32, 32, 32)


def test_sample_batch_layout(tmp_path):
    write_phantom_dataset(tmp_path, num_cases=2, shape=(32, 32, 24))
    pp = PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None)
    cases = prepare_dataset(tmp_path, pp)
    rng = np.random.default_rng(2)
    images, labels = sample_batch(rng, cases, 3, (16, 16, 16))
    assert images.shape == (3, 16, 16, 16, 1) and images.dtype == np.float32
    assert labels.shape == (3, 16, 16, 16) and labels.dtype == np.int32


def test_augment_shapes_and_label_consistency():
    rng = np.random.default_rng(3)
    images = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    labels = (rng.uniform(size=(2, 16, 16, 16)) < 0.2).astype(np.int32)
    key = jax.random.key(0)
    # Without zoom, geometric ops permute voxels: label count is invariant.
    out_img, out_lab = augment_batch(key, images.copy(), labels.copy(), zoom=False)
    assert out_img.shape == images.shape
    assert out_lab.shape == labels.shape
    assert int(np.asarray(out_lab).sum()) == int(labels.sum())
    # With zoom, labels must stay valid class ids (nearest resample).
    _, out_lab_z = augment_batch(key, images.copy(), labels.copy(), zoom=True)
    assert set(np.unique(np.asarray(out_lab_z))) <= {0, 1}


def test_augment_multichannel_shared_geometry():
    """All C channels ride the same geometric transform; a regression once
    squeezed to channel 0 and silently dropped the rest (output C=1)."""
    from runet_tpu.data.augment import augment_one

    rng = np.random.default_rng(11)
    ch0 = rng.normal(size=(16, 16, 16, 1)).astype(np.float32)
    img = np.concatenate([ch0, ch0], axis=-1)  # identical channels
    lab = rng.integers(0, 3, size=(16, 16, 16)).astype(np.int32)
    out_img, out_lab = jax.jit(augment_one, static_argnames=("zoom", "elastic"))(
        jax.random.key(7), jnp.asarray(img), jnp.asarray(lab), zoom=True, elastic=True
    )
    assert out_img.shape == img.shape  # C=2 preserved
    assert out_lab.shape == lab.shape
    # Identical inputs + shared geometry -> outputs differ only by the
    # per-voxel intensity noise (sigma=0.05; deterministic given the key).
    diff = np.abs(np.asarray(out_img[..., 0]) - np.asarray(out_img[..., 1]))
    # Divergent geometry would give diffs at signal scale (~several sigma of
    # the N(0,1) input), not noise scale.
    assert diff.max() < 0.5, diff.max()
    c = np.corrcoef(
        np.asarray(out_img[..., 0]).ravel(), np.asarray(out_img[..., 1]).ravel()
    )[0, 1]
    assert c > 0.97


def test_sampler_caches_volume_min(tmp_path):
    """Pad value = volume min, computed once per case (not per draw)."""
    write_phantom_dataset(tmp_path, num_cases=1, shape=(24, 24, 16))
    pp = PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None)
    case = prepare_case(index_cases(tmp_path)[0], pp)
    assert case.image_min is None
    rng = np.random.default_rng(0)
    img, _ = sample_patch(rng, case, (32, 32, 32))  # larger than vol: pads
    assert case.image_min == float(case.image.min())
    # Padded border voxels carry the cached min.
    assert img[0, 0, 0] == case.image_min


def test_zoom_matches_scipy_oracle():
    """Fixed-factor zoom == scipy map_coordinates at center-aligned coords."""
    from scipy.ndimage import map_coordinates

    from runet_tpu.data.augment import ZOOM_FACTORS, _rand_zoom

    rng = np.random.default_rng(4)
    img = rng.normal(size=(12, 12, 12)).astype(np.float32)
    lab = rng.integers(0, 3, size=(12, 12, 12)).astype(np.int32)
    # Find a key whose sampled factor index is a non-identity factor.
    for seed in range(50):
        key = jax.random.key(seed)
        k = int(jax.random.randint(key, (), 0, len(ZOOM_FACTORS)))
        if ZOOM_FACTORS[k] != 1.0:
            break
    f = ZOOM_FACTORS[k]
    out_img, out_lab = _rand_zoom(key, img, lab)
    n = 12
    c = (n - 1) / 2.0
    pos = np.clip(c + (np.arange(n) - c) * f, 0, n - 1)
    coords = np.meshgrid(pos, pos, pos, indexing="ij")
    exp_img = map_coordinates(img, coords, order=1, mode="nearest")
    np.testing.assert_allclose(np.asarray(out_img), exp_img, rtol=1e-5, atol=1e-5)
    # Label path: values from the original label set only.
    assert set(np.unique(np.asarray(out_lab))) <= set(np.unique(lab))


def test_zoom_identity_factor_is_noop():
    from runet_tpu.data.augment import _zoom_matrix_bank

    lin, nst = _zoom_matrix_bank(16, (1.0,))
    np.testing.assert_array_equal(lin[0], np.eye(16, dtype=np.float32))
    np.testing.assert_array_equal(nst[0], np.eye(16, dtype=np.float32))


def test_elastic_zero_amplitude_is_identity():
    from runet_tpu.data.augment import _rand_elastic

    rng = np.random.default_rng(5)
    img = rng.normal(size=(12, 12, 12)).astype(np.float32)
    lab = rng.integers(0, 3, size=(12, 12, 12)).astype(np.int32)
    out_img, out_lab = _rand_elastic(jax.random.key(0), img, lab, alpha=(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out_img), img, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_lab), lab)


def test_elastic_matches_scipy_oracle():
    """Fixed-amplitude elastic == scipy map_coordinates at the same
    (reproducibly re-derived) displaced coordinates."""
    from scipy.ndimage import map_coordinates as scipy_map

    from runet_tpu.data.augment import _field_upsample_matrix, _rand_elastic

    rng = np.random.default_rng(6)
    n, g, a = 12, 4, 2.5
    img = rng.normal(size=(n, n, n)).astype(np.float32)
    lab = rng.integers(0, 4, size=(n, n, n)).astype(np.int32)
    key = jax.random.key(3)
    out_img, out_lab = _rand_elastic(key, img, lab, grid=g, alpha=(a, a))

    # Re-derive the coordinates exactly as _rand_elastic does.
    kf, _ = jax.random.split(key)
    disp = np.asarray(jax.random.normal(kf, (3, g, g, g), jnp.float32)) * a
    M = _field_upsample_matrix(n, g)
    for axis in range(3):
        disp = np.moveaxis(
            np.tensordot(M, np.moveaxis(disp, axis + 1, 1), axes=(1, 1)), 0, axis + 1
        )
    base = np.arange(n, dtype=np.float32)
    grids = np.meshgrid(base, base, base, indexing="ij")
    coords = [np.clip(grids[i] + disp[i], 0, n - 1) for i in range(3)]
    exp_img = scipy_map(img, coords, order=1)
    np.testing.assert_allclose(np.asarray(out_img), exp_img, rtol=1e-4, atol=1e-4)
    exp_lab = lab[tuple(np.round(c).astype(np.int64) for c in coords)]
    np.testing.assert_array_equal(np.asarray(out_lab), exp_lab)


def test_augment_batch_elastic_label_validity():
    rng = np.random.default_rng(7)
    images = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 16, 16, 16)).astype(np.int32)
    out_img, out_lab = augment_batch(
        jax.random.key(1), images.copy(), labels.copy(), elastic=True
    )
    assert out_img.shape == images.shape and out_lab.shape == labels.shape
    assert set(np.unique(np.asarray(out_lab))) <= {0, 1, 2}
    assert np.isfinite(np.asarray(out_img)).all()


def test_augment_deterministic_given_key():
    images = np.ones((1, 8, 8, 8, 1), np.float32)
    labels = np.zeros((1, 8, 8, 8), np.int32)
    key = jax.random.key(7)
    a1, _ = augment_batch(key, images.copy(), labels.copy())
    a2, _ = augment_batch(key, images.copy(), labels.copy())
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_patch_loader(tmp_path):
    write_phantom_dataset(tmp_path, num_cases=1, shape=(32, 32, 24))
    pp = PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None)
    cases = prepare_dataset(tmp_path, pp)
    loader = PatchLoader(cases, batch_size=2, patch_size=(16, 16, 16), seed=0)
    try:
        images, labels = next(loader)
        assert images.shape == (2, 16, 16, 16, 1)
        assert labels.shape == (2, 16, 16, 16)
        assert isinstance(images, jax.Array)
    finally:
        loader.close()


def test_patch_loader_worker_failure_propagates(tmp_path):
    """A worker-thread exception (bad case, device_put on a dropped tunnel)
    must surface in __next__, not deadlock the consumer forever."""
    import pytest

    write_phantom_dataset(tmp_path, num_cases=1, shape=(32, 32, 24))
    pp = PreprocessConfig(spacing=(1.0, 1.0, 1.0), hu_stats=None)
    cases = prepare_dataset(tmp_path, pp)

    def bad_put(batch):
        raise OSError("tunnel dropped")

    loader = PatchLoader(
        cases, batch_size=1, patch_size=(16, 16, 16), put_fn=bad_put
    )
    try:
        with pytest.raises(RuntimeError, match="worker thread failed"):
            next(loader)
        # The sentinel is single-shot: a SECOND next() after the failure
        # must also raise promptly (liveness check), not block forever on
        # the now-empty queue.
        with pytest.raises(RuntimeError, match="worker thread"):
            next(loader)
    finally:
        loader.close()


def test_prepare_dataset_disk_cache_roundtrip(tmp_path):
    """Cached prepare == uncached prepare; second load is memory-mapped and
    does not re-preprocess; changed preprocess config invalidates."""
    import dataclasses
    import json

    from runet_tpu.config import PreprocessConfig
    from runet_tpu.data.dataset import prepare_dataset
    from runet_tpu.data.phantom import write_phantom_dataset

    root = tmp_path / "data"
    write_phantom_dataset(root, num_cases=1, shape=(32, 32, 24))
    pp = PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None)
    cache = tmp_path / "cache"

    plain = prepare_dataset(root, pp)[0]
    cached = prepare_dataset(root, pp, cache_dir=cache)[0]
    np.testing.assert_array_equal(np.asarray(cached.image), plain.image)
    np.testing.assert_array_equal(np.asarray(cached.labels), plain.labels)
    assert set(cached.fg_coords) == set(plain.fg_coords)

    img_path = cache / plain.case_id / "image.npy"
    mtime = img_path.stat().st_mtime_ns
    again = prepare_dataset(root, pp, cache_dir=cache)[0]
    assert img_path.stat().st_mtime_ns == mtime  # reused, not rewritten
    assert isinstance(again.image, np.memmap)
    np.testing.assert_array_equal(np.asarray(again.image), plain.image)

    # Different preprocess config must re-preprocess, not serve stale data.
    pp2 = dataclasses.replace(pp, spacing=(3.0, 3.0, 3.0))
    other = prepare_dataset(root, pp2, cache_dir=cache)[0]
    assert other.image.shape != plain.image.shape

    # Entries are committed by atomic rename from a staging dir (concurrent
    # multi-host preparers share --cache); no staging litter may remain.
    assert not list(cache.glob(".*.tmp.*"))

    # Sampling from the memmap works and matches in-RAM sampling.
    from runet_tpu.data.sampler import sample_batch

    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a = sample_batch(rng1, [plain], 2, (16, 16, 16))
    b = sample_batch(rng2, [prepare_dataset(root, pp, cache_dir=cache)[0]], 2, (16, 16, 16))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_split_folds_deterministic_and_disjoint():
    from runet_tpu.data.dataset import split_folds

    import pytest

    cases = [f"c{i}" for i in range(7)]
    seen_val = []
    for f in range(3):
        trn, val = split_folds(cases, 3, f)
        assert sorted(trn + val) == sorted(cases)
        assert not set(trn) & set(val)
        seen_val += val
        trn2, val2 = split_folds(cases, 3, f)
        assert (trn2, val2) == (trn, val)
    assert sorted(seen_val) == sorted(cases)  # folds partition the dataset
    with pytest.raises(ValueError, match="out of range"):
        split_folds(cases, 3, 3)
    with pytest.raises(ValueError, match="num_folds"):
        split_folds(cases, 1, 0)
