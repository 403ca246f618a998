"""Orbax checkpoint/resume (SURVEY.md §5.4).

Reference: ``torch.save(state_dict)`` best-val checkpoints (provenance
[DOMAIN]). Rebuild: async Orbax saves of the full train state (params, opt
state, step), periodic + keep-best on validation Dice, with mid-run resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 3, best_metric: str = "val_dice"):
        self.directory = Path(directory).absolute()
        self.best_metric = best_metric
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=(lambda m: float(m.get(best_metric, -1.0))) if best_metric else None,
            best_mode="max",
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, abstract_state: Any, step: int | None = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
