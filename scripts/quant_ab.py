"""A/B decision run for uint8 transfer quantization (PreprocessConfig.
transfer_quant): sequential predict_case latency and pipelined predict_cases
throughput, f16 vs uint8 uploads, in ONE process (same tunnel state) on the
bench phantoms. ROI_PIECES.json attributes ~370-470 ms/case to uploads at
~36 MB/s; quantization halves those bytes — this measures what that buys
end to end.

Run on the TPU host: python scripts/quant_ab.py
Writes QUANT_AB.json at the repo root.
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

from runet_tpu.infer.cascade import predict_case, predict_cases  # noqa: E402
from runet_tpu.infer.warmup import warmup_cases  # noqa: E402


def with_quant(bundle, quant: bool):
    return dataclasses.replace(
        bundle, preprocess=dataclasses.replace(bundle.preprocess, transfer_quant=quant)
    )


def measure(coarse, fine, cascade_cfg, cases, sp, label):
    warmup_cases(coarse, fine, [(img, sp) for img, _ in cases],
                 cascade_cfg, workers=2)
    seq = []
    for _ in range(2):
        for img, _seg in cases:
            t0 = time.monotonic()
            predict_case(coarse, fine, img, sp, cascade_cfg)
            seq.append(time.monotonic() - t0)
    n_pipe = 9
    pipe_cases = [(cases[i % len(cases)][0], sp) for i in range(n_pipe)]
    t0 = time.monotonic()
    for _ in predict_cases(coarse, fine, pipe_cases, cascade_cfg, workers=2):
        pass
    pipe_spv = (time.monotonic() - t0) / n_pipe
    row = {
        "seq_median_s": round(float(np.median(seq)), 3),
        "seq_all_s": [round(t, 3) for t in seq],
        "pipelined_spv_s": round(pipe_spv, 3),
        "pipelined_vpm": round(60.0 / pipe_spv, 2),
    }
    print(f"{label}: {row}", file=sys.stderr)
    return row


def main():
    import bench

    data_root = Path("/tmp/runet_bench_train_data")
    cases = [bench.make_case(seed=s) for s in bench.CASE_SEEDS]
    coarse, _ = bench.trained_bundle("coarse", data_root)
    fine, fine_cfg = bench.trained_bundle("fine_kits", data_root)
    sp = bench.CASE_SPACING

    out = {"device": str(jax.devices()[0]), "case_shape": list(bench.CASE_SHAPE)}
    # f16 first, uint8 second; alternate a second round to split tunnel
    # drift from the effect.
    out["f16"] = measure(with_quant(coarse, False), with_quant(fine, False),
                         fine_cfg.cascade, cases, sp, "f16")
    out["uint8"] = measure(with_quant(coarse, True), with_quant(fine, True),
                           fine_cfg.cascade, cases, sp, "uint8")
    out["f16_round2"] = measure(with_quant(coarse, False), with_quant(fine, False),
                                fine_cfg.cascade, cases, sp, "f16_round2")
    out["uint8_round2"] = measure(with_quant(coarse, True), with_quant(fine, True),
                                  fine_cfg.cascade, cases, sp, "uint8_round2")

    Path("QUANT_AB.json").write_text(json.dumps(out, indent=1))
    print("wrote QUANT_AB.json", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
