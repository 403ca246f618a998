"""Dataset fingerprinting (data/fingerprint.py): derived preprocess params
must reflect the data, and the emitted plan JSON must round-trip through
``get_config`` (the ``--config plan.json`` workflow)."""

import json

import numpy as np

from runet_tpu.config import Config, get_config
from runet_tpu.data.fingerprint import (
    fingerprint_dataset,
    plan_json,
    suggest_preprocess,
)
from runet_tpu.data.phantom import write_phantom_dataset


def test_fingerprint_reflects_dataset(tmp_path):
    write_phantom_dataset(
        tmp_path, num_cases=3, shape=(40, 40, 28), spacing=(1.0, 1.0, 2.0),
        num_classes=3,
    )
    fp = fingerprint_dataset(tmp_path)
    assert fp["num_cases"] == 3 and fp["num_labeled"] == 3
    assert fp["spacing_median"] == [1.0, 1.0, 2.0]
    assert fp["num_classes_incl_bg"] == 3
    # phantom: classes 1 (kidney) and 2 (tumor), tumor inside kidney => both
    # fractions positive, kidney larger.
    fr = fp["class_voxel_fraction"]
    assert fr["1"] > fr["2"] > 0
    lo, hi = fp["hu_window"]
    assert lo < hi
    mean, std = fp["hu_stats"]
    assert lo <= mean <= hi and std > 0
    # window bounds live inside the foreground HU range of the data
    # (phantom intensities are bounded; percentiles cannot escape them).
    pp = suggest_preprocess(fp)
    assert pp.spacing == (1.0, 1.0, 2.0)
    assert pp.hu_window == (lo, hi) and pp.hu_stats == (mean, std)


def test_fingerprint_subsampling_caps(tmp_path):
    """Tiny per-case/pool caps still produce a valid fingerprint (the
    re-subsampling path executes)."""
    write_phantom_dataset(tmp_path, num_cases=2, shape=(32, 32, 24))
    fp = fingerprint_dataset(
        tmp_path, fg_sample_per_case=500, pooled_cap=600
    )
    assert fp["hu_fg_samples"] <= 600 + 500  # pool re-capped between cases
    assert fp["hu_window"][0] < fp["hu_window"][1]


def test_plan_json_roundtrips_through_get_config(tmp_path):
    write_phantom_dataset(tmp_path / "d", num_cases=2, shape=(32, 32, 24),
                          spacing=(1.5, 1.5, 1.5))
    fp = fingerprint_dataset(tmp_path / "d")
    doc = tmp_path / "plan.json"
    doc.write_text(plan_json(fp))
    cfg = get_config(str(doc))
    assert isinstance(cfg, Config)
    assert cfg.preprocess.spacing == (1.5, 1.5, 1.5)
    assert cfg.preprocess.hu_window == tuple(fp["hu_window"])


def test_cli_plan_merges_preset(tmp_path, capsys):
    """plan --config fine_kits merges the derived preprocess into the preset
    and overrides num_classes when the dataset disagrees (5-class phantom vs
    the preset's 3)."""
    from runet_tpu.cli import main

    write_phantom_dataset(tmp_path / "d", num_cases=1, shape=(40, 40, 28),
                          spacing=(1.0, 1.0, 1.0), num_classes=5)
    out = tmp_path / "plan.json"
    rc = main(["plan", "--data", str(tmp_path / "d"), "--config", "fine_kits",
               "--out", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert "fingerprint" in doc
    cfg = get_config(str(out))
    assert cfg.model.num_classes == 5  # overridden from the preset's 3
    # preset's non-preprocess sections survive the merge
    ref = get_config("fine_kits")
    assert cfg.train.patch_size == ref.train.patch_size
    assert cfg.preprocess.spacing == (1.0, 1.0, 1.0)
