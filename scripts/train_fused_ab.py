"""A/B harness behind the ``fused_blocks_train`` default (VERDICT r3 weak
#5: the 255-vs-343 ms decision cited a "/tmp/ab_train.py protocol" that was
not in the repo — this is that harness, reconstructed and checked in).

Protocol (same process, alternating order to split tunnel drift from the
effect): the PRODUCTION dispatched train step (train/state.py
make_train_step, augment ON, PatchLoader inputs) at a preset's geometry,
fused Pallas blocks ON vs OFF in the training model
(ModelConfig.fused_blocks_train), N steps timed after a 3-step warmup,
two rounds each. Reports ms/step medians; the preset default should match
the winner.

Run on the TPU host:   python scripts/train_fused_ab.py [preset]
CPU smoke (tiny):      python scripts/train_fused_ab.py fine_kits 32 smoke
Writes TRAIN_FUSED_AB.json at the repo root (chip mode only).
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "fine_kits"
PATCH = int(sys.argv[2]) if len(sys.argv) > 2 else None
SMOKE = "smoke" in sys.argv[1:]

if not SMOKE:  # chip mode: fail fast if the tunnel is dead
    from runet_tpu.utils.health import probe_backend

    _ok, _detail = probe_backend(tries=2)
    if not _ok:
        sys.exit(f"TPU backend unreachable ({_detail}); not starting")
else:
    import jax

    jax.config.update("jax_platforms", "cpu")

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from runet_tpu.config import get_config  # noqa: E402
from runet_tpu.data.dataset import prepare_dataset  # noqa: E402
from runet_tpu.data.pipeline import PatchLoader  # noqa: E402
from runet_tpu.models.unet3d import create_train_model, init_params  # noqa: E402
from runet_tpu.train.state import create_train_state, make_train_step  # noqa: E402
from runet_tpu.utils.timing import device_sync  # noqa: E402


def measure(fused: bool, cfg, cases, n_steps: int) -> float:
    mcfg = dataclasses.replace(cfg.model, fused_blocks_train=fused)
    model = create_train_model(mcfg)
    params = init_params(model, jax.random.key(0), cfg.train.patch_size)
    state = create_train_state(model, params, cfg.train)
    step = make_train_step(model, augment=True)
    loader = PatchLoader(
        cases, batch_size=cfg.train.batch_size,
        patch_size=cfg.train.patch_size, fg_prob=cfg.train.fg_prob, seed=0,
    )
    key = jax.random.key(1)
    try:
        for i in range(3):  # compile + first-exec
            im, lb = next(loader)
            state, aux = step(state, im, lb, jax.random.fold_in(key, i))
        device_sync(aux["loss"])
        t0 = time.monotonic()
        for i in range(n_steps):
            im, lb = next(loader)
            state, aux = step(state, im, lb, jax.random.fold_in(key, 3 + i))
        device_sync(aux["loss"])
        return (time.monotonic() - t0) / n_steps * 1000
    finally:
        loader.close()


def main():
    cfg = get_config(PRESET)
    if PATCH:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, patch_size=(PATCH,) * 3)
        )
    if SMOKE:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, base_features=8, num_levels=3),
        )
    data_root = bench.ensure_train_data()
    cases = prepare_dataset(data_root, cfg.preprocess)
    n = 2 if SMOKE else 12

    rows = {}
    # Alternating rounds: fused/xla/fused/xla — tunnel drift shows up as
    # round-to-round spread, the effect as the fused-vs-xla gap within
    # rounds.
    for rnd in (1, 2):
        for fused in (True, False):
            k = f"{'fused' if fused else 'xla'}_round{rnd}_ms"
            rows[k] = round(measure(fused, cfg, cases, n), 1)
            print(f"{k}: {rows[k]}", file=sys.stderr)

    fused_med = float(np.median([rows["fused_round1_ms"], rows["fused_round2_ms"]]))
    xla_med = float(np.median([rows["xla_round1_ms"], rows["xla_round2_ms"]]))
    out = {
        "preset": PRESET,
        "patch": list(cfg.train.patch_size),
        "batch": cfg.train.batch_size,
        "steps_per_round": n,
        "device": str(jax.devices()[0]),
        **rows,
        "fused_median_ms": round(fused_med, 1),
        "xla_median_ms": round(xla_med, 1),
        "fused_wins": fused_med < xla_med,
        "preset_default_fused": cfg.model.fused_blocks_train,
    }
    if not SMOKE:
        Path("TRAIN_FUSED_AB.json").write_text(json.dumps(out, indent=1))
        print("wrote TRAIN_FUSED_AB.json", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
