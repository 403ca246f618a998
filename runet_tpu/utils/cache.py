"""Persistent XLA compilation cache (SURVEY.md §5.1 adjunct).

First compile of the 128³ U-Net programs costs ~20 s on v5e; enabling the
disk cache makes every later process start (CLI, bench, driver runs) hit
warm compiles. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only
