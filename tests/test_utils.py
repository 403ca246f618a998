import numpy as np

import jax.numpy as jnp

from runet_tpu.utils.latency import pipelined_ms
from runet_tpu.utils.profiling import annotate, trace
from runet_tpu.utils.timing import PhaseTimer, device_sync


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b", sync=jnp.ones(4)):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"}
    assert d["a"] >= 0


def test_phase_timer_disabled_is_noop():
    t = PhaseTimer(enabled=False)
    with t.phase("x"):
        pass
    assert t.as_dict() == {}


def test_device_sync_handles_trees():
    device_sync([jnp.ones(3), (jnp.zeros(2), np.ones(2))])


def test_pipelined_ms_runs():
    import jax

    f = jax.jit(lambda x: x + 1)
    ms = pipelined_ms(f, (jnp.ones(16),), n=3, warmup=1)
    assert ms >= 0


def test_pipelined_ms_warmup_zero():
    import jax

    f = jax.jit(lambda x: x * 2)
    ms = pipelined_ms(f, (jnp.ones(8),), n=2, warmup=0)
    assert ms >= 0


def test_profiling_contexts_noop_safe(tmp_path):
    with trace(tmp_path):
        with annotate("span"):
            x = jnp.ones(8) * 2
    assert float(x.sum()) == 16.0


def test_sanitize_catches_tracer_leak_and_restores():
    import jax
    import jax.numpy as jnp
    from runet_tpu.utils.debug import sanitize

    leaked = []
    prev = jax.config.jax_check_tracer_leaks

    def leaky(x):
        leaked.append(x)  # tracer escapes the trace
        return x * 2

    import pytest
    with sanitize(debug_nans=False):
        with pytest.raises(Exception, match="[Ll]eak"):
            jax.jit(leaky)(jnp.ones((2,)))
    assert jax.config.jax_check_tracer_leaks == prev


def test_sanitize_catches_nan():
    import jax
    import jax.numpy as jnp
    import pytest
    from runet_tpu.utils.debug import sanitize

    with sanitize(tracer_leaks=False):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.zeros((2,)) - 1.0).block_until_ready()


def test_audit_donation_flags_donated_buffers():
    import jax
    import jax.numpy as jnp
    from runet_tpu.utils.debug import audit_donation

    f = jax.jit(lambda x: x + 1, donate_argnums=(0,))
    x = jnp.ones((128, 128))
    y = f(x)
    donated, fresh = audit_donation(x, y)
    assert donated is True
    assert fresh is False


def test_probe_backend_and_doctor():
    """health.probe_backend succeeds on the CPU backend (subprocess inherits
    the conftest's JAX_PLATFORMS=cpu), fails cleanly on a tiny timeout, and
    doctor_report carries the ops-relevant keys."""
    from runet_tpu.utils.health import doctor_report, probe_backend

    ok, detail = probe_backend(timeout_s=120, tries=1)
    assert ok, detail
    assert detail  # device string, e.g. TFRT_CPU_0

    ok, detail = probe_backend(timeout_s=0.01, tries=1)
    assert not ok and "timed out" in detail

    report = doctor_report(probe_timeout_s=120)
    assert report["backend_reachable"] is True
    assert report["devices"]
    assert report["tiny_dispatch_s"] >= 0
    assert "dir" in report["compilation_cache"]


def test_cli_doctor_runs():
    from runet_tpu.cli import main

    assert main(["doctor", "--timeout", "120"]) == 0


def test_scanned_ms_keeps_computation_alive():
    """The `*0` carry-folding idiom in the device-loop timing protocol must
    keep the measured computation live — if XLA ever starts folding float
    `x*0` (it must not: NaN/Inf semantics), every scanned_ms row would
    silently measure a no-op. Guard with a conv-vs-identity ratio."""
    import jax
    import jax.numpy as jnp

    from runet_tpu.utils.latency import scanned_ms

    w = jax.random.normal(jax.random.key(0), (3, 3, 1, 8), jnp.float32)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)

    def conv_step(v):
        y = jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return v + (jnp.mean(y) * 0).astype(v.dtype)

    t_conv = scanned_ms(conv_step, x, iters=8, reps=2)
    t_id = scanned_ms(lambda v: v + 0.0, x, iters=8, reps=2)
    assert t_conv > 3 * max(t_id, 1e-4), (t_conv, t_id)


def test_bench_dead_tunnel_emits_error_json(monkeypatch, capsys):
    """bench.py against an unreachable backend must still print ONE
    machine-readable JSON line (value 0 + error field) before exiting 1 —
    an empty BENCH_r*.json reads as a silent failure to the driver."""
    import json as _json
    import sys as _sys
    from pathlib import Path

    import pytest as _pytest

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    import runet_tpu.utils.health as health

    monkeypatch.setattr(
        health, "probe_backend",
        lambda timeout_s=300, tries=3: (False, "probe timed out (test)"),
    )
    with _pytest.raises(SystemExit) as exc:
        bench._probe_device()
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    payload = _json.loads(out[-1])
    assert payload["metric"] == "cascade_volumes_per_min"
    assert payload["value"] == 0
    assert "unreachable" in payload["error"]
