"""Honest latency measurement through the axon tunnel (SURVEY.md §5.1).

``block_until_ready`` does not sync through the tunnel, and single-call
timing is dominated by RPC round-trips. The reliable protocol: enqueue N
identical calls back-to-back, force completion with one final one-element
fetch, divide. Used by model-variant benchmarking and perf work.
"""

from __future__ import annotations

import time

import numpy as np


def pipelined_ms(fn, args: tuple, n: int = 20, warmup: int = 2) -> float:
    """Mean per-call latency in ms of fn(*args), pipelined."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        _force(out)
    t0 = time.monotonic()
    outs = [fn(*args) for _ in range(n)]
    _force(outs[-1])
    for o in outs:
        _force(o)
    return (time.monotonic() - t0) / n * 1000.0


def chained_ms(fn, args: tuple, n: int = 20, warmup: int = 2) -> float:
    """Per-call latency with the RTT amortized across the whole chain.

    ``pipelined_ms`` forces every output (one ~38 ms tunnel round-trip per
    call), so it floors at the RTT and cannot resolve sub-RTT kernels.
    Device execution is in-order per stream, so fetching ONE element of the
    LAST output forces the entire chain: total = n·compute + 1·RTT. Use this
    for kernels/ops; use pipelined_ms when per-call host latency (incl. the
    fetch) is itself the quantity of interest.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        _force(out)
    t0 = time.monotonic()
    outs = [fn(*args) for _ in range(n)]
    _force(outs[-1])
    return (time.monotonic() - t0) / n * 1000.0


def scanned_ms(step, x0, iters: int = 30, reps: int = 3) -> float:
    """Device-loop timing: min per-iteration ms of ``step`` (x -> x) chained
    ``iters`` times inside ONE jitted ``lax.scan``.

    ``chained_ms`` amortizes the tunnel RTT but still pays per-call host
    dispatch (~1 ms/call through the tunnel) — sub-millisecond kernels are
    invisible to it: at level-2 U-Net geometry it reported 3.2 ms for an XLA
    conv whose true device time is 0.73 ms (round 3, KERNEL_BENCH.json
    protocol note). The scan keeps the whole chain on device, so dispatch is
    paid once per ``reps`` and the per-iteration quotient is device time.
    ``step`` must be shape-preserving and data-dependent on its input so XLA
    cannot parallelize or DCE iterations; fold auxiliary outputs into the
    carry (e.g. ``y + (s * 0).astype(y.dtype)``) to keep them live.
    """
    import jax

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None, length=iters)
        return y

    y = chain(x0)
    np.asarray(y.ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        y = chain(x0)
        np.asarray(y.ravel()[0])
        best = min(best, (time.monotonic() - t0) * 1000.0 / iters)
    return best


def _force(out) -> None:
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            np.asarray(leaf.ravel()[0])
            return
