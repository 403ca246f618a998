"""Per-phase attribution of cascade serving time (SURVEY.md §5.1).

The pipelined serving path runs at ~0.58-0.72 s/volume on chip
(BENCH_r03_insession.json) and is device-bound (workers 2/3/4 measured
equal). To know where the next serving win is, this script attributes one
sequential `predict_case` across its PhaseTimer phases:

  coarse_preprocess   host striding + bucket-pad (pure host)
  coarse_predict      strided upload + one fused coarse program dispatch
  coarse_boxes        packed-mask fetch (forces coarse execution) + CC boxes
  roi_dispatch        ROI staging + fine program dispatches (async)
  roi_fetch_paste     packed-label fetches (forces ROI programs) + paste
  postprocess_cc      native-grid connected components (host)

Phases without a device fetch measure dispatch wall time; the fetch phases
absorb queued device execution — so read (coarse_predict+coarse_boxes) as
the coarse stage cost and (roi_dispatch+roi_fetch_paste) as the fine stage
cost. Cycles the bench's three phantom geometries; reports per-phase median
over N iterations per case plus the modal ROI-bucket population.

Run on the TPU host (after `python bench.py` has populated the /tmp param
caches — setup reuses them):  python scripts/cascade_profile.py
Writes CASCADE_PROFILE.json at the repo root.

CPU smoke mode (tiny shapes, no artifact):  python scripts/cascade_profile.py smoke
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMOKE = len(sys.argv) > 1 and sys.argv[1] == "smoke"

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

import numpy as np  # noqa: E402

from runet_tpu.infer.cascade import predict_case  # noqa: E402
from runet_tpu.infer.warmup import warmup_cases  # noqa: E402
from runet_tpu.utils.timing import PhaseTimer  # noqa: E402

PHASES = (
    "coarse_preprocess", "coarse_predict", "coarse_boxes",
    "roi_dispatch", "roi_fetch_paste", "postprocess_cc",
)


def main():
    import bench

    if SMOKE:
        bench.CASE_SHAPE = (96, 96, 48)
        bench.TRAIN_STEPS = 2
        bench.CASE_SEEDS = (0,)
        # Never touch the chip bench's /tmp caches from smoke mode: a
        # 2-step smoke retrain would overwrite the 240-step params cache.
        bench._params_cache = lambda name: Path(
            f"/tmp/runet_cascade_prof_smoke_params_{name}.npz"
        )

    data_root = Path(
        "/tmp/runet_cascade_prof_smoke_data" if SMOKE
        else "/tmp/runet_bench_train_data"
    )
    if not data_root.exists():
        from runet_tpu.data.phantom import write_phantom_dataset

        write_phantom_dataset(
            data_root, num_cases=2, shape=(96, 96, 48) if SMOKE else (256, 256, 120),
            spacing=bench.CASE_SPACING, num_classes=3,
        )
    cases = [bench.make_case(seed=s) for s in bench.CASE_SEEDS]
    coarse, _ = bench.trained_bundle("coarse", data_root)
    fine, fine_cfg = bench.trained_bundle("fine_kits", data_root)

    warmup_cases(
        coarse, fine, [(img, bench.CASE_SPACING) for img, _ in cases],
        fine_cfg.cascade, workers=2,
    )

    iters = 1 if SMOKE else 4
    per_case = []
    for ci, (img, _seg) in enumerate(cases):
        runs = []
        for _ in range(iters):
            t = PhaseTimer()
            t0 = time.monotonic()
            predict_case(coarse, fine, img, bench.CASE_SPACING,
                         fine_cfg.cascade, timer=t)
            total = time.monotonic() - t0
            d = t.as_dict()
            d["total"] = round(total, 4)
            runs.append(d)
        med = {
            k: round(float(np.median([r.get(k, 0.0) for r in runs])) * 1000, 1)
            for k in (*PHASES, "total")
        }
        med["unattributed_ms"] = round(
            med["total"] - sum(med[p] for p in PHASES), 1
        )
        per_case.append({"case": ci, "iters": iters, "median_ms": med})
        print(f"case {ci}: {med}", file=sys.stderr)

    # ---- deep pass: piecewise ROI attribution (one iter per case) ----
    # Wrap the ROI program entry points to SYNC each dispatch (kills the
    # pipelining predict_case normally gets — this is a measurement mode)
    # so device execution, fetch bytes, and host paste can be separated.
    import runet_tpu.infer.cascade as casc
    from runet_tpu.utils.timing import device_sync

    deep = []
    orig1, origb = casc._roi_program, casc._roi_program_batch

    def wrap1(apply_fn, params, crop, padded, *a):
        t0 = time.monotonic()
        dev = orig1(apply_fn, params, crop, padded, *a)
        device_sync(dev)
        deep.append({"kind": "roi_b1", "padded": list(padded),
                     "crop": list(crop.shape),
                     "exec_ms": round((time.monotonic() - t0) * 1000, 1)})
        return dev

    def wrapb(apply_fn, params, crops, padded, *a):
        t0 = time.monotonic()
        dev = origb(apply_fn, params, crops, padded, *a)
        device_sync(dev)
        deep.append({"kind": f"roi_b{crops.shape[0]}", "padded": list(padded),
                     "crop": list(crops.shape[1:]),
                     "exec_ms": round((time.monotonic() - t0) * 1000, 1)})
        return dev

    deep_cases = []
    try:
        casc._roi_program, casc._roi_program_batch = wrap1, wrapb
        for ci, (img, _seg) in enumerate(cases):
            # Two iterations, keep the LAST: the first synced exec of a
            # program through the tunnel can absorb minutes of shared-infra
            # first-execution queueing even after warmup_cases (the round-3
            # dirty regeneration recorded 15.7 s for a 417 ms dispatch and
            # would have misdirected the next optimization round — VERDICT
            # r3 weak #3). The throwaway pass eats that; the kept pass
            # measures steady-state execution.
            for _warm in range(2):
                deep.clear()
                t = PhaseTimer()
                predict_case(coarse, fine, img, bench.CASE_SPACING,
                             fine_cfg.cascade, timer=t)
            d = t.as_dict()
            # With every ROI exec synced inside roi_dispatch, the residual
            # roi_fetch_paste phase is pure transfer + unpack + paste.
            deep_cases.append({
                "case": ci,
                "roi_dispatches": list(deep),
                "roi_exec_ms_total": round(sum(r["exec_ms"] for r in deep), 1),
                "residual_fetch_paste_ms": round(d.get("roi_fetch_paste", 0.0) * 1000, 1),
                "coarse_predict_ms": round(d.get("coarse_predict", 0.0) * 1000, 1),
                "postprocess_cc_ms": round(d.get("postprocess_cc", 0.0) * 1000, 1),
            })
            print(f"deep case {ci}: {deep_cases[-1]}", file=sys.stderr)
    finally:
        casc._roi_program, casc._roi_program_batch = orig1, origb

    import jax

    out = {
        "device": str(jax.devices()[0]),
        "case_shape": list(bench.CASE_SHAPE),
        "protocol": (
            "sequential predict_case with PhaseTimer; per-phase median over "
            f"{iters} iters per geometry; fetchless phases are dispatch wall "
            "time, fetch phases absorb queued device execution (see module "
            "docstring)"
        ),
        "cases": per_case,
        "deep": deep_cases,
    }
    if not SMOKE:
        Path("CASCADE_PROFILE.json").write_text(json.dumps(out, indent=1))
        print("wrote CASCADE_PROFILE.json", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
