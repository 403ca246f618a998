"""bench.py params-cache contract (VERDICT r3 item 1a).

The trained-params fingerprint is an ALLOWLIST of numerics-bearing config
fields: adding a new inference-routing field to any config dataclass must
NEVER invalidate the cache/artifact (the old denylist invalidated three
rounds running — roi_batch, transfer_quant, transfer_quant4 — and the last
one killed the round-3 driver bench mid-retrain)."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from runet_tpu.config import (
    CascadeConfig,
    InferConfig,
    ModelConfig,
    PreprocessConfig,
    TrainConfig,
    get_config,
)


def fp(cfg):
    return bench._numerics_fingerprint(cfg)


@pytest.mark.parametrize("preset", ["coarse", "fine_kits"])
def test_inference_routing_fields_do_not_invalidate(preset):
    """Every knob that routes inference around a trained model — transfer
    quantization, TTA, ROI bucketing/batching, remat, spatial sharding —
    must leave the fingerprint unchanged."""
    cfg = get_config(preset)
    base = fp(cfg)

    variants = [
        dataclasses.replace(
            cfg, preprocess=dataclasses.replace(
                cfg.preprocess,
                transfer_quant=not cfg.preprocess.transfer_quant)),
        dataclasses.replace(
            cfg, preprocess=dataclasses.replace(
                cfg.preprocess,
                transfer_quant4=not cfg.preprocess.transfer_quant4)),
        dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, tta=True,
                                           single_pass_ratio=0.0)),
        dataclasses.replace(
            cfg, cascade=dataclasses.replace(cfg.cascade, roi_batch=7,
                                             roi_bucket=64)),
        dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True,
                                           spatial_axis="space")),
    ]
    for v in variants:
        assert fp(v) == base, f"fingerprint moved for {v}"


@pytest.mark.parametrize("preset", ["coarse", "fine_kits"])
def test_new_config_fields_do_not_invalidate(preset):
    """The regression that killed BENCH_r03: a NEW field added to a config
    dataclass. Simulate with extended sub-config types carrying an extra
    field — the allowlist must not see them."""
    cfg = get_config(preset)
    base = fp(cfg)

    ext_pp = dataclasses.make_dataclass(
        "ExtPreprocessConfig", [("future_knob", int, dataclasses.field(default=3))],
        bases=(PreprocessConfig,), frozen=True,
    )
    ext_cas = dataclasses.make_dataclass(
        "ExtCascadeConfig", [("future_knob", str, dataclasses.field(default="x"))],
        bases=(CascadeConfig,), frozen=True,
    )
    ext_inf = dataclasses.make_dataclass(
        "ExtInferConfig", [("future_knob", float, dataclasses.field(default=0.5))],
        bases=(InferConfig,), frozen=True,
    )
    v = dataclasses.replace(
        cfg,
        preprocess=ext_pp(**dataclasses.asdict(cfg.preprocess)),
        cascade=ext_cas(**dataclasses.asdict(cfg.cascade)),
        infer=ext_inf(**dataclasses.asdict(cfg.infer)),
    )
    assert fp(v) == base


def test_numerics_fields_do_invalidate():
    """Sanity: fields that change what training produces must move it."""
    cfg = get_config("fine_kits")
    base = fp(cfg)
    assert fp(dataclasses.replace(
        cfg, preprocess=dataclasses.replace(cfg.preprocess, spacing=(1, 1, 1)))
    ) != base
    assert fp(dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, base_features=16))) != base
    assert fp(dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fg_prob=0.9))) != base
    assert fp(dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=123))) != base


def test_bench_overridden_fields_do_not_invalidate():
    """bench trains with its OWN steps/lr/batch overrides; the preset values
    those overrides replace are irrelevant to the cached params."""
    cfg = get_config("fine_kits")
    base = fp(cfg)
    v = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=999999, lr=5.0, batch_size=64,
            warmup_steps=1, val_every=7, ckpt_every=7, val_full_every=7),
    )
    assert fp(v) == base


def test_fingerprint_distinguishes_presets():
    assert fp(get_config("coarse")) != fp(get_config("fine_kits"))


def test_artifact_roundtrip_and_stale_rejection(tmp_path, monkeypatch):
    """f16 artifact save → load returns the tree as f32 within f16 rounding;
    a fingerprint mismatch is rejected, not silently served."""
    params = {
        "enc": {"conv": {"kernel": np.random.RandomState(0)
                         .randn(3, 3, 3, 1, 8).astype(np.float32)}},
        "head": {"bias": np.zeros((3,), np.float32)},
    }
    p = tmp_path / "bench_params_fine_kits.npz"
    bench._save_params("fine_kits", params, path=p, dtype=np.float16)

    want = bench._numerics_fingerprint(get_config("fine_kits"))
    loaded = bench._read_params_npz(p, want)
    assert loaded is not None
    k = loaded["enc"]["conv"]["kernel"]
    assert k.dtype == np.float32
    np.testing.assert_allclose(k, params["enc"]["conv"]["kernel"],
                               rtol=1e-3, atol=1e-4)

    assert bench._read_params_npz(p, "000000000000") is None

    # _load_params prefers the repo artifact and falls back cleanly.
    monkeypatch.setattr(bench, "ARTIFACT_DIR", tmp_path)
    got = bench._load_params("fine_kits")
    assert got is not None and "head" in got
