"""DP scaling sanity on the fake 8-device CPU mesh (VERDICT r2 item 5;
BASELINE config 5 evidence).

One physical TPU chip exists on this machine, so data-parallel SCALING can
only be sanity-checked on the fake CPU mesh: per-device batch held constant
while the device count grows 1→8. On this 1-core host all device "compute"
serializes, so ideal scaling is wall ∝ n_devices; the reported efficiency
``(n · t_1) / t_n`` isolates the OVERHEAD the DP machinery adds (sharding,
gradient all-reduce, GSPMD partitioning) — ≈1.0 means the collectives cost
~nothing on top of the serialized compute, which is the property that
transfers to a real slice where compute is truly parallel.

Writes DP_SCALING.json at the repo root. Run:
    python scripts/dp_scaling.py
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from runet_tpu.config import ModelConfig, TrainConfig  # noqa: E402
from runet_tpu.models.unet3d import UNet3D, init_params  # noqa: E402
from runet_tpu.parallel import comm  # noqa: E402
from runet_tpu.train.state import create_train_state, make_train_step  # noqa: E402

PATCH = (16, 16, 16)
PER_DEVICE_BATCH = 1
WARM, TIMED = 2, 4


def time_n_devices(n: int) -> float:
    cfg = ModelConfig(
        num_classes=3, base_features=8, num_levels=2, compute_dtype="float32",
        fused_blocks=False,
    )
    tcfg = TrainConfig(
        patch_size=PATCH, batch_size=n * PER_DEVICE_BATCH, warmup_steps=0,
        lr=1e-3, lr_schedule="const", augment=False,
    )
    model = UNet3D(cfg)
    params = init_params(model, jax.random.key(0), PATCH)
    state = create_train_state(model, params, tcfg)
    mesh = comm.make_mesh(n)
    state = comm.replicate(mesh, state)
    step = make_train_step(model, augment=False)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(n * PER_DEVICE_BATCH, *PATCH, 1)).astype(np.float16)
    labels = rng.integers(0, 3, size=(n * PER_DEVICE_BATCH, *PATCH)).astype(np.uint8)
    images, labels = comm.shard_batch(mesh, (images, labels))

    for _ in range(WARM):
        state, aux = step(state, images, labels)
    jax.block_until_ready(aux["loss"])
    t0 = time.monotonic()
    for _ in range(TIMED):
        state, aux = step(state, images, labels)
    jax.block_until_ready(aux["loss"])
    return (time.monotonic() - t0) / TIMED


def main():
    rows = []
    t1 = None
    for n in (1, 2, 4, 8):
        t = time_n_devices(n)
        if n == 1:
            t1 = t
        rows.append(
            {
                "devices": n,
                "global_batch": n * PER_DEVICE_BATCH,
                "step_ms": round(t * 1000, 1),
                # serialized-compute ideal is t1*n on a 1-core host
                "overhead_vs_serialized_ideal": round(t / (t1 * n), 3),
            }
        )
        print(rows[-1], flush=True)
    out = {
        "protocol": (
            "fake CPU mesh, 1-core host: per-device batch fixed at "
            f"{PER_DEVICE_BATCH}x{'x'.join(map(str, PATCH))}; ideal wall is "
            "t_1 * n (compute serializes); overhead ratio ~1.0 => DP "
            "sharding + psum add ~no cost over the compute itself"
        ),
        "patch": list(PATCH),
        "per_device_batch": PER_DEVICE_BATCH,
        "rows": rows,
    }
    Path(__file__).resolve().parent.parent.joinpath("DP_SCALING.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print("wrote DP_SCALING.json")


if __name__ == "__main__":
    main()
