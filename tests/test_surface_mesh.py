"""Tests for eval/surface.py (boundary metrics, volumetry) and eval/mesh.py
(marching-tetrahedra surface extraction + STL/OBJ writers)."""

import numpy as np
import pytest

from runet_tpu.eval.mesh import (
    extract_surface,
    labelmap_to_meshes,
    mesh_stats,
    read_stl,
    write_obj,
    write_stl,
)
from runet_tpu.eval.surface import surface_distances, surface_metrics, volumetry


def _ball(shape, center, r):
    idx = np.indices(shape).astype(np.float64)
    d2 = sum((idx[i] - center[i]) ** 2 for i in range(3))
    return d2 <= r * r


# ---------------------------------------------------------------- surface


def test_identical_masks_are_perfect():
    m = _ball((24, 24, 24), (12, 12, 12), 7)
    sm = surface_metrics(m, m, spacing=(1, 1, 1), tolerance_mm=1.0)
    assert sm == {"hd95": 0.0, "assd": 0.0, "nsd": 1.0}


def test_single_voxel_distance_respects_spacing():
    a = np.zeros((12, 12, 12), bool)
    b = np.zeros((12, 12, 12), bool)
    a[5, 5, 2] = True
    b[5, 5, 8] = True  # 6 voxels apart along z
    iso = surface_metrics(a, b, spacing=(1, 1, 1))
    aniso = surface_metrics(a, b, spacing=(1, 1, 2.5))
    assert iso["hd95"] == pytest.approx(6.0)
    assert iso["assd"] == pytest.approx(6.0)
    assert aniso["hd95"] == pytest.approx(15.0)
    assert iso["nsd"] == 0.0  # default 2 mm tolerance < 6 mm


def test_empty_mask_conventions():
    e = np.zeros((8, 8, 8), bool)
    f = e.copy()
    f[4, 4, 4] = True
    both = surface_metrics(e, e.copy())
    assert both == {"hd95": 0.0, "assd": 0.0, "nsd": 1.0}
    one = surface_metrics(e, f)
    assert np.isinf(one["hd95"]) and np.isinf(one["assd"]) and one["nsd"] == 0.0


def test_unit_shift_bounds_and_nsd():
    gt = np.zeros((20, 20, 20), bool)
    gt[4:14, 4:14, 4:14] = True
    pred = np.roll(gt, 1, axis=0)
    sm = surface_metrics(pred, gt, spacing=(1, 1, 1), tolerance_mm=1.0)
    assert 0 < sm["hd95"] <= 1.0 + 1e-9
    assert 0 < sm["assd"] <= 1.0
    assert sm["nsd"] == pytest.approx(1.0)


def test_surface_distances_symmetric_samples():
    a = _ball((24, 24, 24), (12, 12, 12), 6)
    b = _ball((24, 24, 24), (12, 12, 12), 8)
    d_ab, d_ba = surface_distances(a, b, spacing=(1, 1, 1))
    # concentric spheres: every surface-to-surface distance ~ 2 voxels
    assert d_ab.mean() == pytest.approx(2.0, abs=0.5)
    assert d_ba.mean() == pytest.approx(2.0, abs=0.5)


def test_volumetry_counts_times_voxel_volume():
    labels = np.zeros((10, 10, 10), np.uint8)
    labels[:2] = 1  # 200 voxels
    labels[9, 9, :5] = 2  # 5 voxels
    v = volumetry(labels, spacing=(1.0, 2.0, 0.5), num_classes=3)
    assert v["volume_ml_c1"] == pytest.approx(200 * 1.0 / 1000)
    assert v["volume_ml_c2"] == pytest.approx(5 * 1.0 / 1000)


def test_evaluate_prediction_optional_surface_block():
    from runet_tpu.eval.evaluate import evaluate_prediction

    gt = np.zeros((16, 16, 16), np.uint8)
    gt[4:10, 4:10, 4:10] = 1
    row = evaluate_prediction(gt, gt, 2, spacing=(1, 1, 1), surface=True)
    assert row["dice_c1"] == pytest.approx(1.0)
    assert row["volume_ml_c1"] == pytest.approx(216 / 1000)
    assert row["hd95_c1"] == 0.0 and row["nsd_c1"] == 1.0
    # without spacing: legacy keys only
    legacy = evaluate_prediction(gt, gt, 2)
    assert "volume_ml_c1" not in legacy and "hd95_c1" not in legacy


# ------------------------------------------------------------------- mesh


def _sphere_mesh(r=9.0, shape=(32, 32, 32), smooth=2):
    m = _ball(shape, (16, 16, 16), r).astype(np.float32)
    from scipy import ndimage

    for _ in range(smooth):
        m = ndimage.uniform_filter(m, size=3, mode="constant")
    return extract_surface(m, level=0.5)


def test_sphere_mesh_matches_analytic_area_and_volume():
    r = 9.0
    verts, faces = _sphere_mesh(r)
    s = mesh_stats(verts, faces)
    assert s["volume"] == pytest.approx(4 / 3 * np.pi * r**3, rel=0.06)
    assert s["area"] == pytest.approx(4 * np.pi * r**2, rel=0.08)
    assert s["n_faces"] > 100


def test_mesh_is_watertight_and_genus_zero():
    verts, faces = _sphere_mesh()
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1
    )
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()  # every edge shared by exactly two faces
    V, E, F = len(verts), len(uniq), len(faces)
    assert V - E + F == 2  # Euler characteristic of a sphere


def test_consistent_outward_orientation():
    # Positive enclosed volume requires globally consistent winding; a single
    # flipped triangle would subtract its cone volume.
    verts, faces = _sphere_mesh()
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    center = verts.mean(axis=0)
    n = np.cross(b - a, c - a)
    outward = np.einsum("ij,ij->i", n, (a + b + c) / 3 - center)
    assert (outward > 0).all()


def test_binary_cube_no_smoothing():
    m = np.zeros((12, 12, 12), np.float32)
    m[4:8, 4:8, 4:8] = 1.0
    verts, faces = extract_surface(m, level=0.5)
    s = mesh_stats(verts, faces)
    assert s["volume"] == pytest.approx(4.0**3, rel=0.12)
    assert verts.min() >= 3.0 and verts.max() <= 8.0


def test_affine_maps_to_physical_space():
    m = np.zeros((12, 12, 12), np.float32)
    m[4:8, 4:8, 4:8] = 1.0
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = [10.0, 0.0, -5.0]
    v0, f0 = extract_surface(m, 0.5)
    v1, f1 = extract_surface(m, 0.5, affine=affine)
    assert mesh_stats(v1, f1)["volume"] == pytest.approx(
        8 * mesh_stats(v0, f0)["volume"], rel=1e-6
    )
    assert np.allclose(v1.mean(axis=0), v0.mean(axis=0) * 2 + [10, 0, -5], atol=1e-4)


def test_mirrored_affine_keeps_outward_orientation():
    m = np.zeros((12, 12, 12), np.float32)
    m[4:8, 4:8, 4:8] = 1.0
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])  # reflection, det < 0
    verts, faces = extract_surface(m, 0.5, affine=affine)
    assert mesh_stats(verts, faces)["volume"] > 0


def test_empty_field_yields_empty_mesh():
    verts, faces = extract_surface(np.zeros((8, 8, 8), np.float32), 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_stl_round_trip(tmp_path):
    verts, faces = _sphere_mesh()
    p = write_stl(tmp_path / "k.stl", verts, faces)
    tri = read_stl(p)
    assert tri.shape == (len(faces), 3, 3)
    assert np.allclose(np.sort(tri.reshape(-1, 3), axis=0),
                       np.sort(verts[faces].reshape(-1, 3), axis=0), atol=1e-5)


def test_obj_writer(tmp_path):
    verts, faces = _sphere_mesh()
    p = write_obj(tmp_path / "k.obj", verts, faces)
    lines = p.read_text().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(verts)
    assert sum(l.startswith("f ") for l in lines) == len(faces)


def test_labelmap_to_meshes_per_class():
    labels = np.zeros((24, 24, 24), np.uint8)
    labels[_ball((24, 24, 24), (8, 12, 12), 5)] = 1
    labels[_ball((24, 24, 24), (17, 12, 12), 3)] = 2
    meshes = labelmap_to_meshes(labels, classes=[1, 2], smooth_iters=1)
    v1 = mesh_stats(*meshes[1])["volume"]
    v2 = mesh_stats(*meshes[2])["volume"]
    assert v1 > v2 > 0
    # box smoothing pulls the iso-surface of small convex blobs inward;
    # bound the class-2 ball between half and 1.1x its voxel count
    n2 = int((labels == 2).sum())
    assert 0.5 * n2 < v2 < 1.1 * n2


# ---------------------------------------------------------------- clDice


def _tube(shape=(40, 16, 16), x0=4, x1=36, c=(8, 8), r=2.5):
    m = np.zeros(shape, bool)
    yy, zz = np.mgrid[: shape[1], : shape[2]]
    disk = (yy - c[0]) ** 2 + (zz - c[1]) ** 2 <= r * r
    m[x0:x1] = disk
    return m


def test_cldice_identical_and_empty():
    from runet_tpu.eval.surface import cl_dice

    t = _tube()
    assert cl_dice(t, t) == 1.0
    e = np.zeros_like(t)
    assert cl_dice(e, e) == 1.0
    assert cl_dice(e, t) == 0.0 and cl_dice(t, e) == 0.0


def test_cldice_thickness_invariant_but_dice_is_not():
    """A vessel segmented too thick: voxel Dice drops hard, centerline Dice
    stays high — the reason clDice exists for artery/vein classes."""
    from scipy import ndimage

    from runet_tpu.eval.surface import cl_dice
    from runet_tpu.train.losses import hard_dice_per_class

    gt = _tube(r=1.5)
    pred = ndimage.binary_dilation(gt, iterations=2)  # same centerline, fat
    dice = float(
        hard_dice_per_class(pred.astype(np.int32), gt.astype(np.int32), 2)[1]
    )
    cld = cl_dice(pred, gt)
    assert dice < 0.6
    assert cld > 0.9
    assert cld > dice + 0.3


def test_cldice_penalizes_missing_branch():
    """Dropping a whole branch of equal caliber halves topology
    sensitivity; a spurious extra branch halves topology precision."""
    from runet_tpu.eval.surface import cl_dice

    main = _tube((40, 24, 16), c=(6, 8))
    branch = _tube((40, 24, 16), c=(17, 8))
    gt = main | branch
    assert 0.4 < cl_dice(main, gt) < 0.75  # missing branch
    assert 0.4 < cl_dice(gt, main) < 0.75  # hallucinated branch


def test_morphological_skeleton_of_thin_line_is_itself():
    from runet_tpu.eval.surface import morphological_skeleton

    m = np.zeros((20, 9, 9), bool)
    m[2:18, 4, 4] = True
    s = morphological_skeleton(m)
    assert (s == m).all()


def test_evaluate_prediction_surface_includes_cldice():
    from runet_tpu.eval.evaluate import evaluate_prediction

    gt = np.zeros((24, 24, 24), np.uint8)
    gt[4:20, 10:14, 10:14] = 1
    row = evaluate_prediction(
        gt, gt, 2, spacing=(1, 1, 1), surface=True, cldice_classes=(1,)
    )
    assert row["cldice_c1"] == 1.0
    # default gating: clDice only for vessel classes (>= 3) — a 2-class
    # model gets none (bulky-organ skeletons are slow and meaningless)
    default = evaluate_prediction(gt, gt, 2, spacing=(1, 1, 1), surface=True)
    assert "cldice_c1" not in default


def test_labelmap_to_meshes_thin_structure_never_empty():
    """A 2-voxel-thick vessel drops below the 0.5 iso-level after box
    smoothing; adaptive fallback must still produce a surface."""
    labels = np.zeros((30, 12, 12), np.uint8)
    labels[4:26, 5:7, 5:7] = 3  # 2x2 cross-section "artery"
    meshes = labelmap_to_meshes(labels, classes=[3], smooth_iters=2)
    verts, faces = meshes[3]
    assert len(faces) > 0
    n = int((labels == 3).sum())
    assert 0.4 * n < mesh_stats(verts, faces)["volume"] < 1.3 * n


def test_labelmap_to_meshes_partial_thinning_loss_triggers_fallback():
    """A thin vessel WITH a thick bulge: smoothing keeps the bulge above the
    iso-level (mesh non-empty), so an emptiness-only fallback would silently
    export a blob missing ~90% of the vessel. The coverage check must back
    off smoothing until most of the structure survives."""
    labels = np.zeros((40, 14, 14), np.uint8)
    labels[2:38, 6:8, 6:8] = 3       # long 2x2 vessel
    labels[18:24, 4:10, 4:10] = 3    # 6x6x6 bulge (survives smoothing)
    meshes = labelmap_to_meshes(labels, classes=[3], smooth_iters=2)
    verts, faces = meshes[3]
    n = int((labels == 3).sum())
    vol = mesh_stats(verts, faces)["volume"]
    assert vol > 0.5 * n  # the whole vessel, not just the bulge (~60% of n)
    # and the surface spans the vessel's length, not only the bulge extent
    assert verts[:, 0].max() - verts[:, 0].min() > 30


def test_labelmap_to_meshes_crop_offset_composes_with_affine():
    """Meshing is cropped to the class bbox; vertices must still land at the
    structure's WORLD position (crop offset composed into the affine)."""
    labels = np.zeros((40, 40, 40), np.uint8)
    labels[28:34, 30:36, 20:26] = 1  # far from the origin corner
    affine = np.array(
        [[0.0, 0.0, 2.0, 5.0],
         [0.0, -1.5, 0.0, 7.0],
         [1.0, 0.0, 0.0, -3.0],
         [0.0, 0.0, 0.0, 1.0]]
    )
    verts, faces = labelmap_to_meshes(labels, [1], affine=affine, smooth_iters=1)[1]
    center_vox = np.array([30.5, 32.5, 22.5])
    expected = affine[:3, :3] @ center_vox + affine[:3, 3]
    np.testing.assert_allclose(verts.mean(axis=0), expected, atol=1.0)
    # world-frame volume = voxel count x |det| (smoothing shrink bounded)
    vol = mesh_stats(verts, faces)["volume"]
    n = int(labels.sum()) * abs(np.linalg.det(affine[:3, :3]))
    assert 0.5 * n < vol < 1.2 * n


def test_evaluate_prediction_cldice_without_surface():
    """--cldice must work without --surface: an explicitly requested metric
    is computed, not silently dropped."""
    from runet_tpu.eval.evaluate import evaluate_prediction

    gt = np.zeros((24, 24, 24), np.uint8)
    gt[4:20, 10:14, 10:14] = 3
    row = evaluate_prediction(gt, gt, 4, spacing=(1, 1, 1), cldice_classes=(3,))
    assert row["cldice_c3"] == 1.0
    assert "hd95_c3" not in row  # surface metrics stay off
    # and entirely absent when neither surface nor cldice asked
    assert "cldice_c3" not in evaluate_prediction(gt, gt, 4, spacing=(1, 1, 1))


def test_finite_mean_and_json_sanitize():
    """One empty-prediction case (inf hd95) must not poison the summary mean,
    and artifacts must serialize as valid RFC-8259 JSON (no Infinity token)."""
    import json

    from runet_tpu.eval.evaluate import finite_mean, json_sanitize

    assert finite_mean([1.0, 3.0, float("inf")]) == 2.0
    assert finite_mean([float("inf"), float("nan")]) == float("inf")
    blob = json.dumps(json_sanitize({"hd95": float("inf"), "rows": [1.0, float("nan")]}))
    assert "Infinity" not in blob and "NaN" not in blob
    assert json.loads(blob) == {"hd95": None, "rows": [1.0, None]}
