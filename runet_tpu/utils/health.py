"""Backend health probing (ops tooling; no reference analog — TPU-pod
serving needs it because ``jax.devices()`` through a dead PJRT tunnel
blocks forever in C++ with no deadline, hanging any process that calls it).

``probe_backend`` runs the device query in a SUBPROCESS with a timeout so
the caller can fail fast with a diagnosis. Used by ``bench.py`` before any
work and by ``python -m runet_tpu doctor``.
"""

from __future__ import annotations

import subprocess
import sys


def probe_backend(timeout_s: int = 300, tries: int = 3) -> tuple[bool, str]:
    """Returns (reachable, detail). ``detail`` is the first device string on
    success, the failure reason otherwise. Each try runs ``jax.devices()``
    in a fresh subprocess bounded by ``timeout_s``."""
    # The axon plugin ignores the JAX_PLATFORMS env var (this image pins the
    # platform in site config); apply it via jax.config so a CPU-forced
    # environment (tests) probes CPU while production probes the TPU.
    snippet = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print(jax.devices()[0])\n"
    )
    last = "no attempts"
    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", snippet],
                timeout=timeout_s, capture_output=True, text=True,
            )
            if r.returncode == 0:
                return True, r.stdout.strip().splitlines()[-1]
            tail = (r.stderr or "").strip().splitlines()[-1:] or ["no output"]
            last = f"probe {i + 1}/{tries} exited {r.returncode}: {tail[0]}"
        except subprocess.TimeoutExpired:
            last = f"probe {i + 1}/{tries} timed out after {timeout_s}s (tunnel unresponsive)"
        print(f"health: {last}", file=sys.stderr, flush=True)
    return False, last


def doctor_report(probe_timeout_s: int = 300) -> dict:
    """Environment + backend health snapshot (``doctor`` CLI)."""
    import os

    import jax

    report: dict = {
        "jax_version": jax.__version__,
        "env": {
            k: os.environ.get(k)
            for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_TPU_GEN")
            if os.environ.get(k) is not None
        },
    }
    ok, detail = probe_backend(timeout_s=probe_timeout_s, tries=1)
    report["backend_reachable"] = ok
    report["backend_detail"] = detail
    if ok:
        # Safe to query in-process now; also exercise one tiny dispatch so
        # "reachable" means "can run programs", not just "answers devices()".
        import time

        import jax.numpy as jnp
        import numpy as np

        devs = jax.devices()
        report["devices"] = [str(d) for d in devs]
        t0 = time.monotonic()
        y = jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128)))
        np.asarray(y)
        report["tiny_dispatch_s"] = round(time.monotonic() - t0, 3)
    from runet_tpu.utils.cache import _DEFAULT_DIR

    report["compilation_cache"] = {
        "dir": _DEFAULT_DIR,
        "entries": len(os.listdir(_DEFAULT_DIR)) if os.path.isdir(_DEFAULT_DIR) else 0,
    }
    return report
