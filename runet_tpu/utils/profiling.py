"""jax.profiler integration (SURVEY.md §5.1).

``trace(dir)`` wraps a region in a TensorBoard-compatible profiler trace;
``annotate(name)`` adds named spans visible in the trace viewer. Falls back
to no-ops if the profiler is unavailable on the backend (the axon tunnel
does not always support device tracing — PhaseTimer / latency.py are the
reliable alternatives there).
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path


@contextmanager
def trace(log_dir: str | Path = "/tmp/runet_profile"):
    import jax

    started = False
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextmanager
def annotate(name: str):
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
