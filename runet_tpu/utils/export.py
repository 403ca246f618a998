"""Flat-file model export for serving (SURVEY.md L9 deployment adjunct).

Orbax checkpoints are the training-time format (async, keep-best, resume);
deployment wants a single self-contained artifact. ``export_bundle`` writes
one ``.npz`` holding the flattened param tree plus the full run config JSON,
loadable anywhere numpy exists — no Orbax, no run directory.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_CFG_KEY = "__config_json__"


def save_params_npz(path: str | Path, params, config_json: str | None = None) -> Path:
    """Write a flattened param tree (+ optional config JSON) to one .npz."""
    from flax.traverse_util import flatten_dict

    path = Path(path)
    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(params).items()}
    if config_json is not None:
        flat[_CFG_KEY] = np.frombuffer(config_json.encode(), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)
    return path


def load_params_npz(path: str | Path):
    """Returns (params pytree, config_json | None)."""
    from flax.traverse_util import unflatten_dict

    z = np.load(Path(path))
    cfg = None
    flat = {}
    for k in z.files:
        if k == _CFG_KEY:
            cfg = z[k].tobytes().decode()
        else:
            flat[tuple(k.split("/"))] = z[k]
    return unflatten_dict(flat), cfg


def export_run(run_dir: str | Path, out_path: str | Path, average: int = 1) -> Path:
    """Export a training run's BEST checkpoint to a serving .npz.

    ``average > 1``: export the element-wise MEAN of the best-``average``
    retained checkpoints' params instead ([DOMAIN] SWA-style weight
    averaging — late checkpoints share a loss basin, and the model has no
    running norm statistics to invalidate: InstanceNorm is per-sample).
    Distinct from ``infer/ensemble.py`` (K forwards, averaged probs):
    averaging costs nothing at serving time.
    """
    import jax

    from runet_tpu.config import Config
    from runet_tpu.models.unet3d import UNet3D, init_params
    from runet_tpu.train.checkpoint import CheckpointManager
    from runet_tpu.train.state import create_train_state

    run_dir = Path(run_dir)
    cfg_json = (run_dir / "config.json").read_text()
    cfg = Config.from_json(cfg_json)
    model = UNet3D(cfg.model)
    params = init_params(model, jax.random.key(0), cfg.train.patch_size)
    state = create_train_state(model, params, cfg.train)
    ckpt = CheckpointManager(run_dir / "ckpt")
    if average > 1:
        steps = ckpt.best_steps(average)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {run_dir / 'ckpt'}")
        acc = None
        for s in steps:
            p = jax.device_get(ckpt.restore(state, step=s).params)
            acc = p if acc is None else jax.tree_util.tree_map(np.add, acc, p)
        mean = jax.tree_util.tree_map(
            lambda a: (a / len(steps)).astype(a.dtype), acc
        )
        return save_params_npz(out_path, mean, cfg_json)
    # Explicit None check: a best step of 0 is falsy but must still win
    # over the latest checkpoint.
    step = ckpt.best_step()
    if step is None:
        step = ckpt.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir / 'ckpt'}")
    state = ckpt.restore(state, step=step)
    return save_params_npz(out_path, jax.device_get(state.params), cfg_json)


def export_stablehlo(
    out_path: str | Path,
    model_cfg,
    params,
    patch_size: tuple[int, int, int],
    batch: int = 1,
) -> Path:
    """Serialize the model forward as a portable StableHLO artifact
    (``jax.export``), params baked in as module constants — one file any
    PJRT/StableHLO consumer (IREE, TF serving bridges, a C++ PJRT loader)
    can execute without Python, flax, or this repo.

    Deliberately exports the PURE-XLA model variant: the fused Pallas
    blocks lower to TPU-Mosaic custom calls, which are not portable
    StableHLO (and jax.export refuses them without an unsafe opt-in). The
    XLA path shares the same checkpoint param tree, so the export is
    numerics-equivalent at kernel tolerance. Input: ``(batch, *patch_size,
    in_channels)`` f32, HU-normalized as in preprocess; output: class
    logits at the same grid.
    """
    import dataclasses

    import jax
    from jax import export as jexport

    from runet_tpu.models.unet3d import UNet3D

    cfg = dataclasses.replace(model_cfg, fused_blocks=False)
    model = UNet3D(cfg)

    def fwd(x):
        return model.apply({"params": params}, x)

    spec = jax.ShapeDtypeStruct(
        (batch, *patch_size, model_cfg.in_channels), np.float32
    )
    exp = jexport.export(jax.jit(fwd))(spec)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(exp.serialize())
    return out_path
