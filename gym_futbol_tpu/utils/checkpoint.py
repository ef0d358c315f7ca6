"""Checkpoint/resume via orbax (SURVEY.md §5).

The reference has no checkpointing beyond stable-baselines' saved
policies. Here the whole :class:`~gym_futbol_tpu.ppo.RunnerState` —
params, optimizer state, AND the batched env state (a pytree, so
trivially snapshottable) — round-trips through orbax, making host
restarts cheap and exact: training resumes mid-episode.
"""

from __future__ import annotations

import os
from typing import Any

import jax


class Checkpointer:
    """Thin orbax wrapper keyed by training iteration."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: Any, step: int) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, template: Any) -> tuple[Any | None, int]:
        """Restore the newest checkpoint shaped like ``template``.
        Returns (state | None, step)."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return None, 0
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "shape")
            else x,
            template,
        )
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step

    def wait(self) -> None:
        self._mgr.wait_until_finished()
