"""CLI end-to-end + visualization tests (SURVEY.md L9, §2.1)."""

import json

import numpy as np
import pytest

from runet_tpu.cli import main
from runet_tpu.data.phantom import make_phantom


def test_cli_phantom_train_predict_evaluate(tmp_path, capsys, monkeypatch):
    data = tmp_path / "data"
    main(["phantom", "--out", str(data), "--cases", "2", "--shape", "40", "40", "24"])
    out = capsys.readouterr().out
    assert "wrote 2 cases" in out

    # Tiny fine model training via CLI config override: patch the preset.
    import runet_tpu.config as C

    def tiny():
        return C.Config(
            name="fine_kits",
            model=C.ModelConfig(num_classes=3, base_features=4, num_levels=2, compute_dtype="float32"),
            preprocess=C.PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
            train=C.TrainConfig(
                patch_size=(16, 16, 16), batch_size=2, steps=4, warmup_steps=0,
                val_every=4, ckpt_every=4, augment=False,
            ),
            infer=C.InferConfig(patch_size=(16, 16, 16)),
        )

    monkeypatch.setitem(C.PRESETS, "fine_kits", tiny)
    run = tmp_path / "run"
    main(["train", "--config", "fine_kits", "--data", str(data), "--out", str(run)])
    assert (run / "ckpt").exists()

    preds = tmp_path / "preds"
    main(["predict", "--data", str(data), "--fine", str(run), "--out", str(preds)])
    capsys.readouterr()
    assert (preds / "case_00000.nii.gz").exists()
    from runet_tpu.io.nifti import load_volume

    pred = load_volume(preds / "case_00000.nii.gz")
    assert pred.shape == (40, 40, 24)

    main(["evaluate", "--data", str(data), "--fine", str(run), "--surface"])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert "summary" in lines[-1]
    assert "dice_fg_mean" in lines[-1]["summary"]
    # --surface adds boundary metrics + volumetry per foreground class
    assert "hd95_c1" in lines[0] and "volume_ml_c1" in lines[0]


def test_cli_serve_once(tmp_path, capsys):
    """serve --once drains a watch folder: labels NIfTI + JSON report (+ STL
    when --mesh-classes), idempotent on re-run, unreadable files skipped."""
    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    run = tmp_path / "run"
    main(["phantom", "--out", str(data), "--cases", "2", "--shape", "32", "32", "24"])
    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=4,
                          val_every=2, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=4, log_every=2)
    capsys.readouterr()

    watch = tmp_path / "incoming"
    watch.mkdir()
    import shutil

    for case_dir in sorted(data.iterdir()):
        img = case_dir / "imaging.nii.gz"
        if img.exists():
            shutil.copy(img, watch / f"{case_dir.name}.nii.gz")
    (watch / "broken.nii.gz").write_bytes(b"not a nifti")

    out = tmp_path / "served"
    main([
        "serve", "--watch", str(watch), "--out", str(out), "--fine", str(run),
        "--once", "--mesh-classes", "1",
    ])
    txt = capsys.readouterr()
    assert (out / "case_00000.nii.gz").exists()
    assert (out / "case_00001.nii.gz").exists()
    assert not (out / "broken.nii.gz").exists()
    assert "broken" in txt.err  # unreadable file reported, not fatal
    rep = json.loads((out / "case_00000.json").read_text())
    assert rep["case_id"] == "case_00000" and rep["latency_s"] > 0
    assert "volume_ml_c1" in rep and (out / "case_00000_c1.stl").exists()
    # the emitted labelmap must be a READABLE .nii.gz (the temp-then-rename
    # write once produced gzip-named uncompressed payloads)
    from runet_tpu.io.nifti import load_volume

    served = load_volume(out / "case_00000.nii.gz")
    assert served.data.shape == (32, 32, 24)

    # idempotent: second --once pass reprocesses nothing
    mtime = (out / "case_00000.nii.gz").stat().st_mtime_ns
    main([
        "serve", "--watch", str(watch), "--out", str(out), "--fine", str(run),
        "--once",
    ])
    capsys.readouterr()
    assert (out / "case_00000.nii.gz").stat().st_mtime_ns == mtime


def test_cli_serve_isolates_predict_failures(tmp_path, capsys, monkeypatch):
    """A case that parses but fails prediction gets a .failed.json marker
    and never blocks later cases or re-runs (delete the marker to retry)."""
    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    run = tmp_path / "run"
    main(["phantom", "--out", str(data), "--cases", "2", "--shape", "32", "32", "24"])
    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=2,
                          val_every=2, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=2, log_every=2)
    capsys.readouterr()

    watch = tmp_path / "incoming"
    watch.mkdir()
    import shutil

    for case_dir in sorted(data.iterdir()):
        img = case_dir / "imaging.nii.gz"
        if img.exists():
            shutil.copy(img, watch / f"{case_dir.name}.nii.gz")

    import runet_tpu.infer.cascade as cascade_mod

    real = cascade_mod.predict_volume
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("synthetic predict failure")
        return real(*a, **kw)

    monkeypatch.setattr(cascade_mod, "predict_volume", flaky)
    out = tmp_path / "served"
    rc = main(["serve", "--watch", str(watch), "--out", str(out), "--fine", str(run),
               "--once"])
    err = capsys.readouterr().err
    assert rc == 1  # batch mode reports the failure to the caller
    assert "FAILED" in err
    assert (out / "case_00000.failed.json").exists()
    assert not (out / "case_00000.nii.gz").exists()
    assert (out / "case_00001.nii.gz").exists()  # later case unaffected

    # failed case is not retried while the marker stands
    rc = main(["serve", "--watch", str(watch), "--out", str(out), "--fine", str(run),
               "--once"])
    capsys.readouterr()
    assert calls["n"] == 2  # only the two original attempts
    assert rc == 0  # nothing failed THIS run
    # operator deletes the marker -> retried and (unpatched count>1) succeeds
    (out / "case_00000.failed.json").unlink()
    rc = main(["serve", "--watch", str(watch), "--out", str(out), "--fine", str(run),
               "--once"])
    capsys.readouterr()
    assert rc == 0
    assert (out / "case_00000.nii.gz").exists()


def test_cli_curves(tmp_path, capsys):
    pytest.importorskip("matplotlib")
    run = tmp_path / "run"
    run.mkdir()
    lines = []
    for s in range(0, 100, 10):
        lines.append(json.dumps({"step": s, "wall_s": s * 0.2, "loss": 2.0 / (s + 1),
                                 "imgs_per_s": 4.0}))
        if s % 20 == 0:
            lines.append(json.dumps({"step": s, "wall_s": s * 0.2,
                                     "val_dice": min(0.9, s / 100)}))
    (run / "metrics.jsonl").write_text("\n".join(lines) + "\n")
    main(["curves", "--run", str(run)])
    assert "curves.png" in capsys.readouterr().out
    assert (run / "curves.png").stat().st_size > 5000


def test_cli_mesh_export(tmp_path, capsys):
    """mesh subcommand: labelmap NIfTI -> per-class STL in world mm."""
    from runet_tpu.eval.mesh import read_stl
    from runet_tpu.io.nifti import save_volume

    _img, seg = make_phantom((32, 32, 24), num_classes=3, seed=1)
    lab = tmp_path / "case.nii.gz"
    save_volume(lab, seg.astype(np.uint8), spacing=(1.0, 1.0, 2.0))
    out = tmp_path / "meshes"
    main(["mesh", "--labels", str(lab), "--out", str(out), "--classes", "1,2"])
    txt = capsys.readouterr().out
    assert "class 1" in txt and "class 2" in txt
    tri = read_stl(out / "case_c1.stl")
    assert len(tri) > 10
    # z spacing 2.0 carried through the affine: world z ~= 2x voxel z
    zmax_voxel = np.argwhere(seg == 1)[:, 2].max()
    assert tri[..., 2].max() == pytest.approx(2.0 * zmax_voxel, abs=4.0)


def test_visualize_panel(tmp_path):
    pytest.importorskip("matplotlib")
    from runet_tpu.eval.visualize import overlay_slice, save_case_panel

    img, seg = make_phantom((32, 32, 24), num_classes=3, seed=0)
    rgb = overlay_slice(img, seg, 2, 12)
    assert rgb.shape == (32, 32, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    p = save_case_panel(tmp_path / "panel.png", img, labels=seg, pred=seg, title="t")
    assert p.exists() and p.stat().st_size > 1000


def test_export_and_predict_from_npz(tmp_path):
    """export writes a serving .npz; predict loads it in place of a run dir
    and produces identical output."""
    import numpy as np

    from runet_tpu.cli import main
    from runet_tpu.io.nifti import load_volume

    data = tmp_path / "data"
    run = tmp_path / "run"
    main([
        "phantom", "--out", str(data), "--cases", "1",
        "--shape", "32", "32", "24", "--classes", "3",
    ])
    import dataclasses
    import json

    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.train.loop import train

    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=4,
                          val_every=2, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=4, log_every=2)

    npz = tmp_path / "model.npz"
    main(["export", "--run", str(run), "--out", str(npz)])
    assert npz.exists()

    out_a = tmp_path / "preds_run"
    out_b = tmp_path / "preds_npz"
    main(["predict", "--data", str(data), "--fine", str(run), "--out", str(out_a)])
    main(["predict", "--data", str(data), "--fine", str(npz), "--out", str(out_b)])
    (case,) = sorted(out_a.glob("*.nii.gz"))
    (case_b,) = sorted(out_b.glob("*.nii.gz"))
    np.testing.assert_array_equal(
        np.asarray(load_volume(case).data), np.asarray(load_volume(case_b).data)
    )


def test_export_average_weights(tmp_path):
    """export --average K writes the element-wise mean of the best-K
    retained checkpoints (SWA-style; utils/export.py)."""
    import numpy as np

    from runet_tpu.cli import main
    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.models.unet3d import UNet3D, init_params
    from runet_tpu.train.checkpoint import CheckpointManager
    from runet_tpu.train.loop import train
    from runet_tpu.train.state import create_train_state
    from runet_tpu.utils.export import load_params_npz

    data = tmp_path / "data"
    run = tmp_path / "run"
    main([
        "phantom", "--out", str(data), "--cases", "1",
        "--shape", "32", "32", "24", "--classes", "3",
    ])
    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=4,
                          val_every=2, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=4, log_every=2)

    npz = tmp_path / "avg.npz"
    main(["export", "--run", str(run), "--out", str(npz), "--average", "2"])
    got, _cfg_json = load_params_npz(npz)

    import jax

    model = UNet3D(cfg.model)
    state = create_train_state(
        model, init_params(model, jax.random.key(0), (16, 16, 16)), cfg.train
    )
    ckpt = CheckpointManager(run / "ckpt")
    steps = ckpt.best_steps(2)
    assert len(steps) == 2
    trees = [
        jax.device_get(ckpt.restore(state, step=s).params) for s in steps
    ]
    want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *trees)
    for g, w in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_predict_probs_out(tmp_path):
    """--probs-out writes f16 probabilities at the preprocessed grid whose
    argmax matches the label volume there (predict_volume return_probs)."""
    import numpy as np

    from runet_tpu.cli import main
    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    run = tmp_path / "run"
    main([
        "phantom", "--out", str(data), "--cases", "1",
        "--shape", "32", "32", "24", "--classes", "3",
    ])
    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=2,
                          val_every=2, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=2, log_every=2)

    out = tmp_path / "preds"
    probs = tmp_path / "probs"
    main([
        "predict", "--data", str(data), "--fine", str(run),
        "--out", str(out), "--probs-out", str(probs),
    ])
    (pz,) = sorted(probs.glob("*_probs.npz"))
    z = np.load(pz)
    assert z["probs"].dtype == np.float16
    assert z["probs"].shape[-1] == 3
    s = z["probs"].sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=2e-2)  # f16 prob simplex
    assert tuple(z["native_shape"]) == (32, 32, 24)

    # cascade + probs is rejected
    import pytest

    with pytest.raises(SystemExit, match="probs-out"):
        main([
            "predict", "--data", str(data), "--fine", str(run),
            "--coarse", str(run), "--out", str(out),
            "--probs-out", str(probs),
        ])


def test_export_stablehlo_roundtrip(tmp_path):
    """export --stablehlo writes a portable jax.export artifact whose
    deserialized call matches the in-process pure-XLA forward exactly, and
    whose module contains no TPU-Mosaic custom calls (utils/export.py
    export_stablehlo)."""
    import numpy as np

    from runet_tpu.cli import main
    from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig
    from runet_tpu.train.loop import train

    data = tmp_path / "data"
    run = tmp_path / "run"
    main([
        "phantom", "--out", str(data), "--cases", "1",
        "--shape", "32", "32", "24", "--classes", "3",
    ])
    cfg = Config(
        model=ModelConfig(num_classes=3, base_features=4, num_levels=2),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(patch_size=(16, 16, 16), batch_size=1, steps=2,
                          val_every=10, ckpt_every=2, warmup_steps=0),
    )
    train(cfg, data_root=data, out_dir=run, max_steps=2, log_every=2)

    npz = tmp_path / "model.npz"
    shlo = tmp_path / "fwd.stablehlo"
    main([
        "export", "--run", str(run), "--out", str(npz),
        "--stablehlo", str(shlo), "--patch", "16", "16", "16",
    ])
    assert shlo.exists() and shlo.stat().st_size > 1000

    import dataclasses

    from jax import export as jexport

    from runet_tpu.models.unet3d import UNet3D
    from runet_tpu.utils.export import load_params_npz

    exp = jexport.deserialize(shlo.read_bytes())
    assert "mosaic" not in exp.mlir_module().lower()  # portable: no Pallas
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    got = np.asarray(exp.call(x))

    import jax

    params, _cfg_json = load_params_npz(npz)
    model = UNet3D(dataclasses.replace(cfg.model, fused_blocks=False))
    # Compare against the JITTED forward: the export serializes the jit
    # program, and eager-vs-jit differ at bf16 reassociation level (~3e-2
    # on logits), which is not an export defect.
    want = np.asarray(jax.jit(lambda v: model.apply({"params": params}, v))(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (1, 16, 16, 16, 3)
