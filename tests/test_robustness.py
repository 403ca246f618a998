"""Edge-case coverage: big-endian NIfTI, config round-trip, keep-best."""

import struct

import numpy as np

import jax

from runet_tpu.config import Config, get_config
from runet_tpu.io.nifti import load_volume, save_volume


def test_nifti_big_endian(tmp_path):
    # Hand-build a tiny big-endian header + payload.
    data = np.arange(8, dtype=">i2").reshape(2, 2, 2)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)  # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.5, 1.5, 3.0, 0, 0, 0, 0)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">f", hdr, 112, 1.0)
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "be.nii"
    p.write_bytes(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
    vol = load_volume(p)
    assert vol.spacing == (1.5, 1.5, 3.0)
    np.testing.assert_array_equal(vol.data, np.arange(8).reshape(2, 2, 2))


def test_nifti_nonfinite_scl_slope_means_no_scaling(tmp_path):
    # nibabel semantics: non-finite scl_slope/inter → no scaling (not NaN data).
    data = np.arange(8, dtype=">i2").reshape(2, 2, 2)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)  # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.5, 1.5, 3.0, 0, 0, 0, 0)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">f", hdr, 112, float("nan"))  # scl_slope = NaN
    struct.pack_into(">f", hdr, 116, float("nan"))  # scl_inter = NaN
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "nanslope.nii"
    p.write_bytes(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
    vol = load_volume(p)
    assert np.isfinite(vol.data).all()
    np.testing.assert_array_equal(vol.data, np.arange(8).reshape(2, 2, 2))


def test_nifti_zero_slope_ignores_intercept(tmp_path):
    # NIfTI convention: scl_slope == 0 means "no scaling stored"; the
    # intercept must be ignored too, not applied alone.
    data = np.arange(8, dtype="<i2").reshape(2, 2, 2)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)  # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 0.0)  # scl_slope = 0
    struct.pack_into("<f", hdr, 116, 5.0)  # scl_inter = 5 (must be ignored)
    hdr[344:348] = b"n+1\x00"
    p = tmp_path / "zeroslope.nii"
    p.write_bytes(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
    vol = load_volume(p)
    np.testing.assert_array_equal(vol.data, np.arange(8).reshape(2, 2, 2))


def test_metrics_logger_nan_is_valid_json(tmp_path):
    """A diverged run's NaN/inf loss must not corrupt metrics.jsonl —
    json.dumps would emit the non-RFC NaN token strict parsers reject."""
    import json

    from runet_tpu.train.metrics import MetricsLogger

    logger = MetricsLogger(tmp_path)
    logger.log(1, loss=float("nan"), dice=float("inf"), ok=0.5, tag="a")
    logger.close()
    line = (tmp_path / "metrics.jsonl").read_text().strip()
    rec = json.loads(line)  # parse=strict: would fail on bare NaN
    assert rec["loss"] is None and rec["dice"] is None
    assert rec["ok"] == 0.5 and rec["tag"] == "a"


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    try:
        load_volume(p)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_config_json_roundtrip_all_presets():
    for name in ("coarse", "fine_kits", "cascade", "renal_anatomy", "dp_full"):
        cfg = get_config(name)
        rt = Config.from_json(cfg.to_json())
        assert rt == cfg, name


def test_checkpoint_keep_best(tmp_path):
    from runet_tpu.config import ModelConfig, TrainConfig
    from runet_tpu.models.unet3d import UNet3D, init_params
    from runet_tpu.train.checkpoint import CheckpointManager
    from runet_tpu.train.state import create_train_state

    model = UNet3D(ModelConfig(num_classes=2, base_features=4, num_levels=2, compute_dtype="float32"))
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    state = create_train_state(model, params, TrainConfig())
    mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
    mgr.save(1, jax.device_get(state), metrics={"val_dice": 0.5})
    mgr.wait()
    mgr.save(2, jax.device_get(state), metrics={"val_dice": 0.9})
    mgr.wait()
    mgr.save(3, jax.device_get(state), metrics={"val_dice": 0.7})
    mgr.wait()
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2  # keep-best on val_dice
    restored = mgr.restore(state, step=mgr.best_step())
    assert int(restored.step) == int(state.step)
    mgr.close()


def test_checkpoint_periodic_saves_survive_keep_best(tmp_path):
    """Round-1 bug: periodic (metrics=None) saves were GC'd immediately by the
    best-K policy, so crash-resume lost up to val_every steps. The latest-N
    arm must retain them."""
    from runet_tpu.config import ModelConfig, TrainConfig
    from runet_tpu.models.unet3d import UNet3D, init_params
    from runet_tpu.train.checkpoint import CheckpointManager
    from runet_tpu.train.state import create_train_state

    model = UNet3D(ModelConfig(num_classes=2, base_features=4, num_levels=2, compute_dtype="float32"))
    params = init_params(model, jax.random.key(0), (8, 8, 8))
    state = create_train_state(model, params, TrainConfig())
    host = jax.device_get(state)
    mgr = CheckpointManager(tmp_path / "ckpt", keep=2, latest_keep=2)
    # Two validated checkpoints fill the best-K ladder...
    mgr.save(1, host, metrics={"val_dice": 0.8})
    mgr.wait()
    mgr.save(2, host, metrics={"val_dice": 0.9})
    mgr.wait()
    # ...then periodic saves land after them and must remain the latest.
    mgr.save(3, host, metrics=None)
    mgr.wait()
    mgr.save(4, host, metrics=None)
    mgr.wait()
    assert mgr.latest_step() == 4, "periodic save was garbage-collected"
    assert mgr.best_step() == 2  # best ignores metric-less periodic saves
    restored = mgr.restore(state, step=4)
    assert int(restored.step) == int(state.step)
    # Older periodic saves beyond latest_keep are allowed to be dropped, but
    # the best validated checkpoints must survive.
    mgr.save(5, host, metrics=None)
    mgr.wait()
    steps = set(mgr._mgr.all_steps())
    assert {1, 2} <= steps  # best-K arm retains validated ckpts
    assert 5 in steps
    mgr.close()


def test_get_config_accepts_json_file(tmp_path):
    """--config also takes a path to a Config JSON (the run-dir config.json
    format): edit + re-train workflows need no code changes."""
    import pytest

    cfg = get_config("coarse")
    p = tmp_path / "my.json"
    p.write_text(cfg.to_json())
    loaded = get_config(str(p))
    assert loaded == cfg
    with pytest.raises(KeyError, match="unknown preset"):
        get_config("nope_not_a_preset")
