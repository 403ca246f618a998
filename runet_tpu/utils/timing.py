"""Phase timing utilities (SURVEY.md §5.1 tracing/profiling).

Through the axon PJRT tunnel ``block_until_ready`` does not actually wait
for device execution (measured); the only reliable sync is a data fetch.
``device_sync`` fetches one element, forcing execution of the producing
program while transferring ~nothing.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np


def device_sync(x) -> None:
    """Force execution of the program producing x (fetch one element)."""
    import jax

    if isinstance(x, (list, tuple)):
        for item in x:
            device_sync(item)
        return
    if isinstance(x, jax.Array):
        np.asarray(x.ravel()[0])


class PhaseTimer:
    """Accumulates wall-clock per named phase; used by predict_case and the
    benchmark harness to attribute cascade time."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.phases: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.monotonic()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.phases[name] = self.phases.get(name, 0.0) + time.monotonic() - t0

    def as_dict(self) -> dict[str, float]:
        return {k: round(v, 4) for k, v in self.phases.items()}
