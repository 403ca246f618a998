"""Orbax checkpoint/resume (SURVEY.md §5.4).

Reference: ``torch.save(state_dict)`` best-val checkpoints (provenance
[DOMAIN]). Rebuild: async Orbax saves of the full train state (params, opt
state, step), with a dual retention policy:

- **best-K** on validation Dice (checkpoints saved with ``metrics``), and
- **latest-N** regardless of metrics, so periodic crash-resume saves are
  never garbage-collected by the best-K policy (round-1 bug: periodic saves
  carried a sentinel ``val_dice=-1.0`` and were deleted immediately once K
  validated checkpoints existed, silently losing up to ``val_every`` steps
  on crash-resume).

Periodic saves must pass ``metrics=None`` — they are then retained by the
LatestN arm only and never compete on the best-K ladder.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp
# Public re-export path (orbax reorganizes _src internals routinely).
from orbax.checkpoint import checkpoint_managers as _pp


class CheckpointManager:
    def __init__(
        self,
        directory: str | Path,
        keep: int = 3,
        best_metric: str = "val_dice",
        latest_keep: int = 2,
    ):
        self.directory = Path(directory).absolute()
        self.best_metric = best_metric
        best_fn = lambda m: float(m.get(best_metric, -1.0))  # noqa: E731
        policies = [_pp.LatestN(n=latest_keep)]
        if best_metric:
            policies.append(
                _pp.BestN(
                    get_metric_fn=best_fn,
                    reverse=False,  # ascending sort; last `keep` = highest
                    n=keep,
                    keep_checkpoints_without_metrics=False,  # LatestN covers them
                )
            )
        options = ocp.CheckpointManagerOptions(
            best_fn=best_fn if best_metric else None,
            best_mode="max",
            create=True,
            enable_async_checkpointing=True,
            preservation_policy=_pp.AnyPreservationPolicy(policies),
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        """Save; ``metrics=None`` marks a periodic (latest-N-only) save."""
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=(
                {k: float(v) for k, v in metrics.items()} if metrics is not None else None
            ),
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

    def best_steps(self, k: int) -> list[int]:
        """Up to ``k`` retained steps, best metric first (steps without the
        metric — periodic latest-N saves — rank last, latest first), for
        checkpoint weight averaging (utils/export.py)."""
        scored = []
        for step in self._mgr.all_steps():
            m = self._mgr.metrics(step)
            score = float(m.get(self.best_metric, float("-inf"))) if m else float("-inf")
            scored.append((score, step))
        scored.sort(key=lambda t: (t[0], t[1]), reverse=True)
        return [s for _, s in scored[:k]]

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
