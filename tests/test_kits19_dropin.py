"""Real-KiTS19 drop-in readiness (VERDICT r3 item 8; SURVEY.md §0 standing
instruction).

No KiTS19 data ships on this machine, so this test SKIPS cleanly today.
The moment a real KiTS19 layout (``case_XXXXX/imaging.nii.gz`` +
``segmentation.nii.gz``) appears — mounted at ``$KITS19_ROOT`` or one of
the conventional paths below — it executes the full drop-in path without
any code changes: index → fingerprint → plan → train smoke → cascade
predict → eval. That makes SURVEY §0's "re-verify on real data if a mount
ever appears" instruction self-executing instead of a doc note.
"""

import os
from pathlib import Path

import numpy as np
import pytest

CANDIDATE_ROOTS = [
    os.environ.get("KITS19_ROOT", ""),
    "/root/data/kits19",
    "/root/kits19/data",
    "/data/kits19",
    "/root/reference/data",
]


def _find_kits19() -> Path | None:
    for root in CANDIDATE_ROOTS:
        if not root:
            continue
        p = Path(root)
        if not p.is_dir():
            continue
        cases = sorted(p.glob("case_*"))
        if cases and (cases[0] / "imaging.nii.gz").exists():
            return p
    return None


KITS19 = _find_kits19()

pytestmark = pytest.mark.skipif(
    KITS19 is None,
    reason="no real KiTS19 mount (set KITS19_ROOT to a dir of "
    "case_XXXXX/imaging.nii.gz); phantom-based coverage runs elsewhere",
)


def test_kits19_index_fingerprint_plan(tmp_path):
    import dataclasses
    import json

    from runet_tpu.data.dataset import index_cases
    from runet_tpu.data.fingerprint import (
        fingerprint_dataset,
        plan_json,
        suggest_preprocess,
    )

    recs = index_cases(KITS19)
    assert recs, f"no case_* dirs under {KITS19}"

    fp = fingerprint_dataset(KITS19, limit=5)
    plan = json.loads(plan_json(fp))
    assert "fingerprint" in plan
    pp = suggest_preprocess(fp)
    assert all(s > 0 for s in pp.spacing)
    # KiTS19 voxels are sub-3mm in-plane; a wildly off suggestion means the
    # NIfTI affine/spacing parse broke on real headers.
    assert all(0.1 < s < 8.0 for s in pp.spacing), pp
    assert dataclasses.asdict(pp)  # round-trippable


def test_kits19_train_smoke_and_cascade_predict(tmp_path):
    import dataclasses

    import jax

    from runet_tpu.config import get_config
    from runet_tpu.data.dataset import index_cases
    from runet_tpu.eval.evaluate import evaluate_prediction
    from runet_tpu.infer.cascade import ModelBundle, predict_case
    from runet_tpu.io.nifti import load_volume
    from runet_tpu.models.unet3d import UNet3D
    from runet_tpu.train.loop import train

    recs = index_cases(KITS19)[:2]

    def smoke_cfg(preset):
        cfg = get_config(preset)
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, base_features=8, num_levels=3),
            train=dataclasses.replace(
                cfg.train, patch_size=(64, 64, 64), batch_size=1, steps=20,
                warmup_steps=2, val_every=10**9, val_full_every=0,
                ckpt_every=10**9,
            ),
        )

    bundles = {}
    for preset in ("coarse", "fine_kits"):
        cfg = smoke_cfg(preset)
        # train() consumes the KiTS19 layout directly — the real drop-in.
        state, aux = train(
            cfg, data_root=KITS19, out_dir=tmp_path / f"run_{preset}",
            max_steps=cfg.train.steps, log_every=10,
        )
        assert np.isfinite(float(aux["loss"]))
        model = UNet3D(cfg.model)
        bundles[preset] = ModelBundle(
            apply_fn=lambda p, w, _m=model: _m.apply({"params": p}, w),
            params=jax.device_get(state.params),
            num_classes=cfg.model.num_classes,
            preprocess=cfg.preprocess,
            infer=cfg.infer,
        )

    vol = load_volume(recs[0].image_path)
    pred = predict_case(
        bundles["coarse"], bundles["fine_kits"], vol.data, vol.spacing,
        get_config("fine_kits").cascade,
    )
    assert pred.shape == vol.data.shape
    # 20-step models make no quality promise; the drop-in claim is that the
    # real-data path RUNS end to end and produces a sane label volume.
    assert pred.max() < bundles["fine_kits"].num_classes
    seg = load_volume(recs[0].label_path)
    m = evaluate_prediction(pred, seg.data.astype(np.uint8), 3)
    assert np.isfinite(m["kidney_composite"])
