"""Checkpoint/resume via Orbax.

Reference counterpart: tf.estimator automatic checkpoints in `model_dir`,
EMA shadow variables saved alongside raw weights, eval/export restoring EMA
values (SURVEY.md §5 "Checkpoint / resume"). Crash recovery = resume from the
last checkpoint, identical semantics here via `CheckpointManager` with
`save_interval_steps` + `max_to_keep`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

from multiposenet_tpu.train.steps import TrainState


class CheckpointManager:
    """Thin wrapper: saves/restores {params, ema_params, opt_state,
    batch_stats, step} as one composite."""

    def __init__(
        self,
        directory: str | Path,
        save_interval_steps: int = 1000,
        max_to_keep: int = 3,
    ):
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if self._mgr.latest_step() == step:
            return False  # interval save already wrote this step
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def should_save(self, step: int) -> bool:
        """Host-side interval check so the training loop only pays the
        device→host state fetch on steps Orbax would actually persist."""
        return bool(self._mgr.should_save(step))

    def restore(self, template: TrainState) -> tuple[TrainState, int]:
        """Restore the latest checkpoint into the template's structure.
        Returns (state, step); (template, 0) if none exists."""
        step = self._mgr.latest_step()
        if step is None:
            return template, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return restored, step

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
