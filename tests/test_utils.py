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
