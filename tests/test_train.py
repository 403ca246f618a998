"""Training subsystem tests (SURVEY.md §4.3, §4.5)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.config import Config, ModelConfig, PreprocessConfig, TrainConfig, get_config
from runet_tpu.data.phantom import write_phantom_dataset
from runet_tpu.models.unet3d import UNet3D, init_params
from runet_tpu.train.checkpoint import CheckpointManager
from runet_tpu.train.loop import train
from runet_tpu.train.state import create_train_state, make_lr_schedule, make_train_step


def tiny_config(tmp=None, **tr):
    train_kw = dict(
        patch_size=(16, 16, 16),
        batch_size=2,
        steps=30,
        lr=1e-2,
        warmup_steps=5,
        val_every=30,
        ckpt_every=30,
        augment=False,
        weight_decay=0.0,
    )
    train_kw.update(tr)
    return Config(
        name="tiny",
        model=ModelConfig(num_classes=3, base_features=8, num_levels=2, compute_dtype="float32"),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=TrainConfig(**train_kw),
    )


def test_lr_schedule_shapes():
    cfg = TrainConfig(lr=1e-3, warmup_steps=10, steps=100, lr_schedule="poly")
    s = make_lr_schedule(cfg)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(100)) < 1e-4


def test_overfit_single_patch():
    # SURVEY §4.3: loss -> ~0 overfitting one patch.
    cfg = ModelConfig(num_classes=2, base_features=8, num_levels=2, compute_dtype="float32")
    tcfg = TrainConfig(lr=3e-3, warmup_steps=0, lr_schedule="const", weight_decay=0.0)
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    state = create_train_state(model, params, tcfg)
    step = make_train_step(model)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    labels = np.zeros((1, 16, 16, 16), np.int32)
    labels[0, 4:12, 4:12, 4:12] = 1
    labels = jnp.asarray(labels)

    losses = []
    for _ in range(120):
        state, aux = step(state, images, labels)
        losses.append(float(aux["loss"]))
    assert losses[-1] < 0.15, f"did not overfit: {losses[::20]}"
    assert losses[-1] < losses[0] * 0.2


def test_train_loop_end_to_end(tmp_path):
    write_phantom_dataset(tmp_path / "data", num_cases=2, shape=(48, 48, 32))
    cfg = tiny_config()
    state, aux = train(
        cfg,
        data_root=tmp_path / "data",
        out_dir=tmp_path / "run",
        max_steps=12,
        log_every=6,
    )
    assert int(state.step) == 12
    assert np.isfinite(float(aux["loss"]))
    # Metrics JSONL written with throughput + val dice.
    lines = [json.loads(l) for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert any("imgs_per_s" in l for l in lines)
    assert any("val_dice" in l for l in lines)
    # Config serialized.
    assert (tmp_path / "run" / "config.json").exists()
    rt = Config.from_json((tmp_path / "run" / "config.json").read_text())
    assert rt.train.patch_size == (16, 16, 16)
    # Checkpoint written and restorable.
    ckpt = CheckpointManager(tmp_path / "run" / "ckpt")
    assert ckpt.latest_step() == 12


def test_train_resume(tmp_path):
    write_phantom_dataset(tmp_path / "data", num_cases=1, shape=(40, 40, 24))
    cfg = tiny_config()
    train(cfg, data_root=tmp_path / "data", out_dir=tmp_path / "run", max_steps=6, log_every=3)
    state, _ = train(
        cfg,
        data_root=tmp_path / "data",
        out_dir=tmp_path / "run",
        max_steps=10,
        resume=True,
        log_every=5,
    )
    assert int(state.step) == 10


def test_keep_best_tracks_full_volume_dice(tmp_path, monkeypatch):
    """With val_full_every set, best-checkpoint selection keys on the
    full-volume Dice — NOT the noisy patch estimate (VERDICT r1 weak #5)."""
    import runet_tpu.train.loop as loop_mod

    write_phantom_dataset(tmp_path / "data", num_cases=2, shape=(48, 48, 32))

    # Scripted metrics that disagree: patch val keeps rising (would pick the
    # LAST step), full val peaks at the FIRST full-val step.
    patch_vals = iter([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    full_vals = iter([0.9, 0.5, 0.4])
    monkeypatch.setattr(
        loop_mod, "validate_patches",
        lambda *a, **k: (next(patch_vals), np.zeros(3)),
    )
    monkeypatch.setattr(
        loop_mod, "validate_full", lambda *a, **k: next(full_vals)
    )

    cfg = tiny_config(val_every=2, val_full_every=2, ckpt_every=100)
    train(
        cfg,
        data_root=tmp_path / "data",
        out_dir=tmp_path / "run",
        max_steps=6,
        log_every=6,
    )
    ckpt = CheckpointManager(tmp_path / "run" / "ckpt")
    # Full-val Dice was highest (0.9) at step 2; patch val was highest at 6.
    assert ckpt.best_step() == 2
    lines = [
        json.loads(l)
        for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val_full_dice" in l for l in lines)


def test_validate_full_runs_real_sliding_window(tmp_path):
    """validate_full end-to-end on a real (tiny) case: finite score in [0,1]."""
    from runet_tpu.config import InferConfig
    from runet_tpu.data.dataset import prepare_dataset
    from runet_tpu.train.loop import validate_full

    write_phantom_dataset(tmp_path / "data", num_cases=1, shape=(40, 40, 24))
    cfg = tiny_config()
    cases = prepare_dataset(tmp_path / "data", cfg.preprocess)
    model = UNet3D(cfg.model)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    icfg = InferConfig(patch_size=(16, 16, 16), single_pass_ratio=8.0)
    score = validate_full(model, params, cases, icfg, cfg.model.num_classes)
    assert 0.0 <= score <= 1.0


def test_config_presets_cover_baseline():
    # BASELINE.json configs 1-5.
    assert get_config("coarse").model.num_classes == 2
    assert get_config("fine_kits").model.num_classes == 3
    assert get_config("cascade").name == "cascade"
    assert get_config("renal_anatomy").model.num_classes == 5
    assert get_config("dp_full").train.batch_size >= 8


def test_presets_enable_full_volume_keep_best():
    """Every shipping preset keys keep-best to full-volume Dice (VERDICT r2
    item 3): val_full_every set and a valid multiple of val_every."""
    for name in ("coarse", "fine_kits", "cascade", "renal_anatomy", "dp_full"):
        cfg = get_config(name)
        assert cfg.train.val_full_every > 0, name
        assert cfg.train.val_full_every % cfg.train.val_every == 0, name


def test_preset_path_runs_full_volume_keep_best(tmp_path):
    """Drive train() through a preset (not a hand-built config): the preset's
    val_full_every wiring must reach validate_full and stamp the best
    checkpoint with the full-volume score. Geometry/cadence scaled down for
    the CPU host, val_full_every/val_every ratio taken from the preset."""
    import dataclasses

    write_phantom_dataset(tmp_path / "data", num_cases=2, shape=(48, 48, 32))
    cfg = get_config("fine_kits")
    ratio = cfg.train.val_full_every // cfg.train.val_every
    assert ratio >= 1
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, base_features=8, num_levels=2, compute_dtype="float32",
            fused_blocks=False,
        ),
        preprocess=PreprocessConfig(spacing=(2.0, 2.0, 2.0), hu_stats=None),
        train=dataclasses.replace(
            cfg.train, patch_size=(16, 16, 16), batch_size=2, grad_accum=1,
            steps=2 * ratio, warmup_steps=0, val_every=2,
            val_full_every=2 * ratio, augment=False,
        ),
        infer=dataclasses.replace(cfg.infer, patch_size=(16, 16, 16)),
    )
    train(cfg, data_root=tmp_path / "data", out_dir=tmp_path / "run",
          log_every=2 * ratio)
    ckpt = CheckpointManager(tmp_path / "run" / "ckpt")
    assert ckpt.best_step() == 2 * ratio  # best stamped by the full val
    lines = [
        json.loads(l)
        for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("val_full_dice" in l for l in lines)


def test_train_step_no_unusable_donation_warning():
    """The compact-dtype batch must NOT be donated (its upcast makes the
    donation unusable and XLA warns every step) — state only (VERDICT r2
    item 7)."""
    import warnings

    cfg = ModelConfig(num_classes=2, base_features=4, num_levels=2,
                      compute_dtype="float32")
    tcfg = TrainConfig(warmup_steps=0, lr_schedule="const", augment=True)
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), (16, 16, 16))
    state = create_train_state(model, params, tcfg)
    step = make_train_step(model, augment=True)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float16)
    labels = rng.integers(0, 2, size=(1, 16, 16, 16)).astype(np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any donation warning -> failure
        state, aux = step(state, jnp.asarray(images), jnp.asarray(labels),
                          jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))


def test_val_full_every_must_be_multiple_of_val_every():
    import dataclasses

    import pytest

    from runet_tpu.config import Config, ModelConfig, TrainConfig
    from runet_tpu.train.loop import train

    cfg = Config(
        model=ModelConfig(num_classes=2, base_features=4, num_levels=2),
        train=TrainConfig(val_every=1000, val_full_every=1024),
    )
    with pytest.raises(ValueError, match="multiple"):
        train(cfg, cases=[], out_dir="/tmp/should_not_exist_run")


def test_val_every_zero_disables_validation(tmp_path):
    """val_every=0 means 'never validate' (like val_full_every=0), not a
    ZeroDivisionError mid-run; periodic checkpointing still works."""
    write_phantom_dataset(tmp_path / "data", num_cases=1, shape=(40, 40, 24))
    cfg = tiny_config(val_every=0, ckpt_every=4)
    state, aux = train(
        cfg, data_root=tmp_path / "data", out_dir=tmp_path / "run",
        max_steps=8, log_every=4,
    )
    assert int(state.step) == 8
    lines = [
        json.loads(l)
        for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert not any("val_dice" in l for l in lines)
    ckpt = CheckpointManager(tmp_path / "run" / "ckpt")
    assert ckpt.latest_step() == 8

    # val_full_every without val_every is a config error, not a hang/LCM.
    import pytest

    bad = tiny_config(val_every=0, val_full_every=8)
    with pytest.raises(ValueError, match="val_every"):
        train(bad, data_root=tmp_path / "data", out_dir=tmp_path / "run2",
              max_steps=8)
