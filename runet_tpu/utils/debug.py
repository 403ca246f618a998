"""Debug / sanitizer mode (SURVEY.md §5.2).

JAX is functional, so the classic race/memory sanitizers have no analog;
the real hazards in this codebase are:

- **tracer leaks** — a traced value escaping ``jit`` into Python state
  (caught by ``jax_check_tracer_leaks``),
- **silent NaN/Inf** — e.g. out-of-range label gathers on TPU
  (caught by ``jax_debug_nans``),
- **donated-buffer reuse** — reading an array after passing it to a
  ``donate_argnums`` call (``audit_donation`` below makes this loud).

``sanitize()`` is a context manager enabling the checks for a scoped block
(they slow tracing/execution, so production paths leave them off). The CLI
exposes it via ``--debug`` (cli.py).
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def sanitize(tracer_leaks: bool = True, debug_nans: bool = True):
    """Scoped sanitizer mode: tracer-leak detection + NaN checking.

    ``jax_check_tracer_leaks`` makes ``jit`` raise if a tracer outlives its
    trace (the JAX analog of a use-after-free); ``jax_debug_nans`` re-runs
    ops producing NaN un-jitted and raises at the source op. Both are
    trace/compile-time costs — wrap the suspect region only.
    """
    import jax

    prev_leaks = jax.config.jax_check_tracer_leaks
    prev_nans = jax.config.jax_debug_nans
    try:
        if tracer_leaks:
            jax.config.update("jax_check_tracer_leaks", True)
        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        yield
    finally:
        jax.config.update("jax_check_tracer_leaks", prev_leaks)
        jax.config.update("jax_debug_nans", prev_nans)


def audit_donation(*arrays) -> list[bool]:
    """Report which arrays have been donated (their buffers deleted).

    Reading a donated array raises deep inside XLA with a confusing error;
    call this after a ``donate_argnums`` step in tests/debug sessions to
    assert the donation contract explicitly. Returns one bool per array
    (True = buffer gone / unsafe to read).
    """
    out = []
    for a in arrays:
        deleted = False
        try:
            deleted = bool(a.is_deleted())
        except AttributeError:
            deleted = False
        out.append(deleted)
    return out
