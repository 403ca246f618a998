"""Regenerate the committed bench params artifacts (VERDICT r3 item 1b).

``artifacts/bench_params_{coarse,fine_kits}.npz`` are the briefly-trained
phantom params every ``bench.py`` run loads — committed to the repo so a
driver bench NEVER retrains (round 3's driver artifact died rc=124 while
retraining 240 steps × 2 stages after a config field invalidated the /tmp
cache). Stored f16: half the repo bytes; |param| ≪ f16 max and inference
computes in bf16, whose 7-bit mantissa is coarser than f16's 10.

Run after any change that moves the numerics fingerprint
(bench.NUMERICS_FIELDS / NUMERICS_REV):

    python scripts/make_bench_params.py            # retrain if needed
    python scripts/make_bench_params.py --trust-cache  # re-stamp /tmp cache

``--trust-cache``: adopt /tmp/runet_bench_params_*.npz IGNORING its stored
fingerprint — only valid when the cache is known to be trained with the
CURRENT numerics (e.g. the fingerprint function itself changed, not the
numerics). The artifact is re-stamped with the current fingerprint.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import bench  # noqa: E402

# renal_anatomy added in round 5: the committed 5-class params back its own
# cascade quality gate (tests/test_bench_quality.py), per VERDICT r4 item 4.
PRESETS = ("coarse", "fine_kits", "renal_anatomy")


def main(argv):
    trust_cache = "--trust-cache" in argv
    bench.ARTIFACT_DIR.mkdir(exist_ok=True)
    from flax.traverse_util import unflatten_dict

    from runet_tpu.config import get_config

    for preset in PRESETS:
        fp = bench._numerics_fingerprint(get_config(preset))
        params = bench._load_params(preset)
        src = "artifact/cache (fingerprint-valid)"
        if params is None and trust_cache and bench._params_cache(preset).exists():
            z = np.load(bench._params_cache(preset))
            params = unflatten_dict(
                {
                    tuple(k.split("/")): np.asarray(z[k], np.float32)
                    for k in z.files
                    if k != "__fingerprint__"
                }
            )
            src = "/tmp cache (UNCHECKED, --trust-cache)"
        if params is None:
            print(f"{preset}: no valid params; training {bench.TRAIN_STEPS} "
                  "steps on the phantom set...", file=sys.stderr)
            bundle, _ = bench.trained_bundle(preset, None)  # preset-matched data
            import jax

            params = jax.device_get(bundle.params)
            src = "fresh training run"
        out = bench._artifact_path(preset)
        bench._save_params(preset, params, path=out, dtype=np.float16)
        mb = out.stat().st_size / 1e6
        print(f"{preset}: wrote {out} ({mb:.1f} MB, fp {fp}) from {src}",
              file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:])
