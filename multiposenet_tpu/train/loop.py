"""Training loop: data-parallel over the ICI mesh, checkpoint/resume,
JSONL metrics.

Reference counterpart: `train.py:main` wiring tf.estimator's
`train_and_evaluate` (SURVEY.md §3.2). The loop here: build mesh → create or
restore TrainState → iterate loader batches (host threads) → jitted
DP-sharded train step → periodic metric logging (JSONL, SURVEY.md §5
"Metrics / logging") and Orbax checkpoints.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Iterator

import jax
import jax.numpy as jnp

from multiposenet_tpu.config import Config
from multiposenet_tpu.parallel import mesh as mesh_lib
from multiposenet_tpu.train import steps as steps_lib
from multiposenet_tpu.train.checkpoints import CheckpointManager


def train(
    config: Config,
    batches: Iterator[dict],
    num_steps: int | None = None,
    mesh=None,
    log_fn: Callable[[dict], None] | None = None,
    checkpoint: bool = True,
) -> steps_lib.TrainState:
    """Run training; returns the final TrainState (replicated)."""
    t = config.train
    num_steps = num_steps if num_steps is not None else t.num_steps
    mesh = mesh or mesh_lib.make_mesh_for_batch(t.batch_size)
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)

    state = steps_lib.create_train_state(
        config, jax.random.PRNGKey(t.seed)
    )
    start_step = 0
    mgr = None
    if checkpoint:
        mgr = CheckpointManager(
            t.checkpoint_dir, t.save_interval_steps, t.max_to_keep
        )
        state, start_step = mgr.restore(state)

    state = mesh_lib.replicate(state, mesh)
    # NOTE: no donate_argnums — buffer donation triggers INVALID_ARGUMENT
    # TPU backend errors on the axon PJRT plugin (verified 2026-08-16) and
    # wedges the device for the process. Re-enable once the plugin supports
    # aliased buffers; the state is small (~5M params) so the memory cost
    # of not donating is negligible.
    train_step = jax.jit(
        steps_lib.make_train_step(config),
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
    )

    metrics_path = Path(t.checkpoint_dir) / "metrics.jsonl"
    metrics_path.parent.mkdir(parents=True, exist_ok=True)
    t_last = time.time()
    step = start_step
    with metrics_path.open("a") as metrics_file:
        for batch in batches:
            if step >= num_steps:
                break
            batch = mesh_lib.shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, mesh
            )
            state, metrics = train_step(state, batch)
            step += 1
            if step % t.log_interval_steps == 0 or step == num_steps:
                metrics = {
                    k: float(v) for k, v in
                    jax.device_get(metrics).items()
                }
                now = time.time()
                metrics.update(
                    step=step,
                    images_per_sec=(
                        t.log_interval_steps * t.batch_size
                        / max(now - t_last, 1e-9)
                    ),
                )
                t_last = now
                metrics_file.write(json.dumps(metrics) + "\n")
                metrics_file.flush()
                if log_fn:
                    log_fn(metrics)
            # Fetching the full TrainState to host every step serializes
            # dispatch through the axon tunnel — only pay it on steps the
            # manager will actually persist.
            if mgr is not None and mgr.should_save(step):
                mgr.save(jax.device_get(state))
        if mgr is not None:
            mgr.save(jax.device_get(state), force=True)
            mgr.wait()
            mgr.close()
    return state
