"""A/B decision run for the 4-bit COARSE-stage upload packing
(PreprocessConfig.transfer_quant4): the coarse strided upload is ~2.6 MB of
uint8 at the bench geometry (~70 ms at the ~36 MB/s tunnel); 4-bit lanes
halve it. Only the coarse stage is a candidate — its output is a foreground
box with margin slack, so 16 levels over the HU window cannot move a box
edge by more than the quantization noise, while the fine stage keeps the
~1.5 HU/step uint8 encoding for tumor-grade contrast.

Measures sequential predict_case latency (per-phase: coarse_predict is the
stage that should move), pipelined throughput, and phantom Dice (must be
unchanged vs uint8) — uint8 vs uint8+quant4-coarse, alternating two rounds
in one process to split tunnel drift from the effect.

Run on the TPU host: python scripts/quant4_ab.py
Writes QUANT4_AB.json at the repo root.
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from runet_tpu.utils.health import probe_backend  # noqa: E402

_ok, _detail = probe_backend(tries=2)
if not _ok:
    sys.exit(f"TPU backend unreachable ({_detail}); not starting")

from runet_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from runet_tpu.eval.evaluate import evaluate_prediction  # noqa: E402
from runet_tpu.infer.cascade import predict_case, predict_cases  # noqa: E402
from runet_tpu.infer.warmup import warmup_cases  # noqa: E402
from runet_tpu.utils.timing import PhaseTimer  # noqa: E402


def with_quant4(coarse, q4: bool):
    return dataclasses.replace(
        coarse,
        preprocess=dataclasses.replace(coarse.preprocess, transfer_quant4=q4),
    )


def measure(coarse, fine, cascade_cfg, cases, segs, sp, label):
    warmup_cases(coarse, fine, [(img, sp) for img, _ in cases],
                 cascade_cfg, workers=2)
    seq, coarse_ms, dices = [], [], []
    for rep in range(2):
        for ci, (img, _seg) in enumerate(cases):
            t = PhaseTimer()
            t0 = time.monotonic()
            pred = predict_case(coarse, fine, img, sp, cascade_cfg, timer=t)
            seq.append(time.monotonic() - t0)
            coarse_ms.append(t.as_dict().get("coarse_predict", 0.0) * 1000)
            if rep == 0:
                m = evaluate_prediction(pred, segs[ci], 3)
                dices.append((round(m["dice_c1"], 4), round(m["dice_c2"], 4)))
    n_pipe = 9
    pipe_cases = [(cases[i % len(cases)][0], sp) for i in range(n_pipe)]
    t0 = time.monotonic()
    for _ in predict_cases(coarse, fine, pipe_cases, cascade_cfg, workers=2):
        pass
    pipe_spv = (time.monotonic() - t0) / n_pipe
    row = {
        "seq_median_s": round(float(np.median(seq)), 3),
        "seq_all_s": [round(t, 3) for t in seq],
        "coarse_predict_median_ms": round(float(np.median(coarse_ms)), 1),
        "pipelined_spv_s": round(pipe_spv, 3),
        "pipelined_vpm": round(60.0 / pipe_spv, 2),
        "dice_c1_c2_per_case": dices,
    }
    print(f"{label}: {row}", file=sys.stderr)
    return row


def main():
    import bench

    # Same dataset-ensure bench.main uses: a fresh host (no prior bench run)
    # must not fail mid-script on a missing /tmp dataset (ADVICE r3).
    data_root = bench.ensure_train_data()
    cases = [bench.make_case(seed=s) for s in bench.CASE_SEEDS]
    segs = [seg for _img, seg in cases]
    coarse, _ = bench.trained_bundle("coarse", data_root)
    fine, fine_cfg = bench.trained_bundle("fine_kits", data_root)
    sp = bench.CASE_SPACING

    out = {"device": str(jax.devices()[0]), "case_shape": list(bench.CASE_SHAPE)}
    out["uint8"] = measure(with_quant4(coarse, False), fine,
                           fine_cfg.cascade, cases, segs, sp, "uint8")
    out["quant4"] = measure(with_quant4(coarse, True), fine,
                            fine_cfg.cascade, cases, segs, sp, "quant4")
    out["uint8_round2"] = measure(with_quant4(coarse, False), fine,
                                  fine_cfg.cascade, cases, segs, sp, "uint8_round2")
    out["quant4_round2"] = measure(with_quant4(coarse, True), fine,
                                   fine_cfg.cascade, cases, segs, sp, "quant4_round2")

    Path("QUANT4_AB.json").write_text(json.dumps(out, indent=1))
    print("wrote QUANT4_AB.json", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
