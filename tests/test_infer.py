"""Sliding-window inference + postprocess tests (SURVEY.md §4.1, §4.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import ModelConfig
from runet_tpu.infer.gaussian import gaussian_importance_map
from runet_tpu.infer.postprocess import (
    component_bounding_boxes,
    keep_largest_components,
    label_components,
)
from runet_tpu.infer.sliding_window import (
    compute_window_starts,
    make_start_table,
    sliding_window_predict,
)
from runet_tpu.models.unet3d import UNet3D, init_params


def test_gaussian_properties():
    g = gaussian_importance_map((16, 16, 16))
    assert g.shape == (16, 16, 16)
    assert g.max() == pytest.approx(1.0)
    assert (g > 0).all()
    # Symmetry.
    np.testing.assert_allclose(g, g[::-1], atol=1e-6)
    np.testing.assert_allclose(g, g.transpose(1, 0, 2), atol=1e-6)
    # Max at center region.
    assert g[7:9, 7:9, 7:9].max() == g.max()


def test_window_starts_cover():
    starts = compute_window_starts(100, 32, 16)
    assert starts[0] == 0 and starts[-1] == 68
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s : s + 32] = True
    assert covered.all()
    assert compute_window_starts(16, 32, 16) == [0]


def test_start_table_padding():
    t = make_start_table((64, 64, 32), (32, 32, 32), overlap=0.5, window_batch=4)
    assert t.shape[1] == 3
    assert len(t) % 4 == 0


def _oracle_model():
    """A tiny tractable 'model': class1 where input > 0 else class0."""

    def apply_fn(params, windows):  # windows (B, px, py, pz, 1)
        x = windows[..., 0]
        logits = jnp.stack([-x * 10, x * 10], axis=-1)
        return logits

    return apply_fn


def test_sliding_window_matches_dense_oracle():
    # The threshold model is position-independent, so sliding-window fusion
    # must reproduce the dense decision exactly, seams included.
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(40, 33, 21)).astype(np.float32)
    labels = sliding_window_predict(
        _oracle_model(), {}, vol, patch_size=(16, 16, 16), num_classes=2,
        overlap=0.5, window_batch=1,
    )
    np.testing.assert_array_equal(np.asarray(labels), (vol > 0).astype(np.uint8))


@pytest.mark.parametrize("window_batch", [1, 3])
def test_sliding_window_batching_invariant(window_batch):
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(24, 24, 24)).astype(np.float32)
    labels = sliding_window_predict(
        _oracle_model(), {}, vol, patch_size=(16, 16, 16), num_classes=2,
        overlap=0.5, window_batch=window_batch,
    )
    np.testing.assert_array_equal(np.asarray(labels), (vol > 0).astype(np.uint8))


def test_expand_window_size_budget_and_divisibility():
    from runet_tpu.infer.sliding_window import expand_window_size

    patch = (128, 128, 128)
    vol = (256, 256, 384)
    win = expand_window_size(vol, patch, budget_ratio=8.0)
    assert all(w % 32 == 0 for w in win)
    assert np.prod(win) <= 8.0 * np.prod(patch)
    assert all(w >= p for w, p in zip(win, patch))
    # Must have actually grown: the budget fits ~2.6x of the volume's axes.
    assert np.prod(win) > np.prod(patch)
    # Never exceeds the volume rounded up to 32.
    assert all(w <= -(-v // 32) * 32 for w, v in zip(win, vol))
    # Volume inside the budget: window covers it fully (degenerates to one
    # window == padded volume).
    win_small = expand_window_size((130, 130, 130), patch, budget_ratio=8.0)
    assert win_small == (160, 160, 160)


def test_super_window_fallback_matches_dense_oracle():
    """Forced past the single-pass path, super-windows must still reproduce
    the dense decision exactly (seams between big windows included)."""
    rng = np.random.default_rng(7)
    vol = rng.normal(size=(20, 20, 52)).astype(np.float32)
    labels = sliding_window_predict(
        _oracle_model(), {}, vol, patch_size=(16, 16, 16), num_classes=2,
        overlap=0.5,
        single_pass_ratio=2.0,  # 20*20*52 > 2*16³ → fallback engages
        expand_windows=True,
    )
    np.testing.assert_array_equal(np.asarray(labels), (vol > 0).astype(np.uint8))
    # And with expansion disabled (plain patch windows) — same answer.
    labels2 = sliding_window_predict(
        _oracle_model(), {}, vol, patch_size=(16, 16, 16), num_classes=2,
        overlap=0.5, single_pass_ratio=2.0, expand_windows=False,
    )
    np.testing.assert_array_equal(np.asarray(labels2), (vol > 0).astype(np.uint8))


def test_sliding_window_volume_smaller_than_patch():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(10, 12, 8)).astype(np.float32)
    labels = sliding_window_predict(
        _oracle_model(), {}, vol, patch_size=(16, 16, 16), num_classes=2,
    )
    assert labels.shape == (10, 12, 8)
    np.testing.assert_array_equal(np.asarray(labels), (vol > 0).astype(np.uint8))


def test_sliding_window_with_real_unet():
    cfg = ModelConfig(num_classes=2, base_features=4, num_levels=2, compute_dtype="float32")
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (16, 16, 16))

    def apply_fn(p, w):
        return model.apply({"params": p}, w)

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(20, 24, 18)).astype(np.float32)
    labels, probs = sliding_window_predict(
        apply_fn, params, vol, patch_size=(16, 16, 16), num_classes=2,
        return_probs=True,
    )
    assert labels.shape == vol.shape
    assert probs.shape == vol.shape + (2,)
    p = np.asarray(probs)
    # Corners have ~1e-9 gaussian weight vs the 1e-12 div-guard: allow 5e-3.
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=5e-3)


# ---------------- postprocess ----------------


def test_label_components_basic():
    m = np.zeros((8, 8, 8), np.uint8)
    m[:2, :2, :2] = 1
    m[5:, 5:, 5:] = 1
    lab, n = label_components(m)
    assert n == 2
    assert len(np.unique(lab[m > 0])) == 2
    assert (lab[m == 0] == 0).all()


def test_label_components_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(4)
    m = (rng.uniform(size=(20, 18, 16)) < 0.3).astype(np.uint8)
    lab, n = label_components(m)
    slab, sn = ndimage.label(m)
    assert n == sn
    # Same partition (label values may differ): check bijection.
    pairs = set(zip(lab.ravel().tolist(), slab.ravel().tolist()))
    assert len(pairs) == sn + 1  # one pair per component + background


def test_keep_largest_components():
    seg = np.zeros((16, 16, 16), np.uint8)
    seg[:6, :6, :6] = 1  # big
    seg[8:10, 8:10, 8:10] = 1  # small
    seg[12:13, 12:13, 12:13] = 2  # tiny spurious tumor island
    out = keep_largest_components(seg, max_components=1)
    assert (out[:6, :6, :6] == 1).all()
    assert (out[8:10, 8:10, 8:10] == 0).all()
    assert (out[12:13, 12:13, 12:13] == 0).all()


def test_keep_largest_in_overlapping_boxes():
    """A component kept via one box must not lose voxels to an overlapping
    box's independent write-back (boxes are union-merged first)."""
    from runet_tpu.infer.postprocess import keep_largest_components_in_boxes

    seg = np.zeros((12, 4, 4), np.uint8)
    seg[2:6] = 1  # big component X, spans the box overlap
    seg[8:10] = 1  # smaller component Y
    boxes = [
        (np.array([0, 0, 0]), np.array([7, 4, 4])),
        (np.array([5, 0, 0]), np.array([12, 4, 4])),  # overlaps [5:7]
    ]
    out = keep_largest_components_in_boxes(seg, boxes, max_components=1)
    assert (out[2:6] == 1).all(), "kept component lost voxels in overlap"
    assert (out[8:10] == 0).all()


def test_component_bounding_boxes():
    m = np.zeros((20, 20, 20), np.uint8)
    m[2:6, 3:7, 4:8] = 1
    m[12:18, 12:18, 12:18] = 1
    boxes = component_bounding_boxes(m, max_components=2, min_voxels=1)
    assert len(boxes) == 2
    lo, hi = boxes[0]  # largest first
    np.testing.assert_array_equal(lo, [12, 12, 12])
    np.testing.assert_array_equal(hi, [18, 18, 18])


def test_merge_boxes_face_adjacent():
    """Exactly face-adjacent boxes merge (a component crossing the shared
    face must be ranked once, not as two fragments)."""
    import numpy as np

    from runet_tpu.infer.postprocess import _merge_overlapping_boxes

    merged = _merge_overlapping_boxes(
        [(np.array([0, 0, 0]), np.array([10, 10, 10])),
         (np.array([10, 0, 0]), np.array([20, 10, 10]))]
    )
    assert len(merged) == 1
    np.testing.assert_array_equal(merged[0][0], [0, 0, 0])
    np.testing.assert_array_equal(merged[0][1], [20, 10, 10])


def test_keep_in_boxes_fuzz_matches_global_oracle():
    """The vectorized/native box-scoped path must equal global
    keep_largest_components when the boxes jointly cover all foreground
    (randomized speckle: thousands of components exercises the LUT kill and
    the argpartition global ranking)."""
    from runet_tpu.infer.postprocess import keep_largest_components_in_boxes

    rng = np.random.default_rng(11)
    for trial in range(3):
        seg = np.zeros((40, 36, 32), np.uint8)
        speck = rng.uniform(size=(18, 16, 14)) < 0.35
        seg[2:20, 2:18, 2:16][speck] = 1
        speck2 = rng.uniform(size=(16, 14, 12)) < 0.35
        seg[22:38, 20:34, 18:30][speck2] = 2
        boxes = [
            (np.array([0, 0, 0]), np.array([21, 19, 17])),
            (np.array([21, 19, 17]), np.array([40, 36, 32])),
        ]
        for k in (1, 2, 5):
            got = keep_largest_components_in_boxes(seg, boxes, max_components=k)
            want = keep_largest_components(seg, max_components=k)
            np.testing.assert_array_equal(got, want)
        # input untouched (whole-volume box aliasing guard)
        whole = [(np.array([0, 0, 0]), np.array(seg.shape))]
        before = seg.copy()
        _ = keep_largest_components_in_boxes(seg, whole, max_components=1)
        np.testing.assert_array_equal(seg, before)


def test_keep_in_boxes_fused_native_matches_fallback(monkeypatch):
    """The fused keep_largest_in_boxes_3d path (runs built in place on the
    canvas, global rank, killed-run writes) must match the numpy/int32-label
    fallback chain bit-for-bit on multi-class speckle with overlapping boxes;
    inplace=True must mutate the input to the same result."""
    import runet_tpu.utils.native as nat
    from runet_tpu.infer.postprocess import keep_largest_components_in_boxes

    if not nat.native_keep_largest_in_boxes(
        np.zeros((1, 1, 1), np.uint8), np.zeros((0, 6), np.int64), 1
    ):
        import pytest

        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(3)
    for trial in range(4):
        shape = tuple(int(s) for s in rng.integers(18, 48, 3))
        seg = (rng.random(shape) < 0.2).astype(np.uint8) * rng.integers(
            1, 4, shape
        ).astype(np.uint8)
        boxes = []
        for _ in range(int(rng.integers(1, 4))):
            lo = rng.integers(0, np.asarray(shape) - 4)
            hi = np.minimum(lo + rng.integers(4, 24, 3), shape)
            boxes.append((lo, hi))
        k = int(rng.integers(1, 4))
        got = keep_largest_components_in_boxes(
            seg, [(l.copy(), h.copy()) for l, h in boxes], max_components=k
        )
        inp = seg.copy()
        got_ip = keep_largest_components_in_boxes(
            inp,
            [(l.copy(), h.copy()) for l, h in boxes],
            max_components=k,
            inplace=True,
        )
        assert got_ip is inp
        monkeypatch.setattr(nat, "_has_boxes", False)
        want = keep_largest_components_in_boxes(
            seg, [(l.copy(), h.copy()) for l, h in boxes], max_components=k
        )
        monkeypatch.undo()
        # Size ties may be broken differently; accept either only when the
        # kept-voxel count matches exactly (a tie swap), else require equal.
        if not np.array_equal(got, want):
            assert (got > 0).sum() == (want > 0).sum(), "non-tie mismatch"
        np.testing.assert_array_equal(got_ip, got)


def test_component_bounding_boxes_native_matches_argwhere():
    """native component_stats_3d bboxes == the argwhere fallback."""
    from runet_tpu.infer.postprocess import label_components
    from runet_tpu.utils.native import native_component_stats

    rng = np.random.default_rng(7)
    m = (rng.uniform(size=(24, 20, 16)) < 0.3).astype(np.uint8)
    labels, n = label_components(m)
    stats = native_component_stats(labels, n)
    if stats is None:
        import pytest

        pytest.skip("native extension unavailable")
    sizes, boxes = stats
    counts = np.bincount(labels.ravel(), minlength=n + 1)[1:]
    np.testing.assert_array_equal(sizes, counts)
    for c in range(n):
        coords = np.argwhere(labels == c + 1)
        np.testing.assert_array_equal(boxes[c, :3], coords.min(axis=0))
        np.testing.assert_array_equal(boxes[c, 3:], coords.max(axis=0) + 1)
