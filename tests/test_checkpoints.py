"""Orbax checkpoint save/restore round-trip (SURVEY.md §5 checkpoint/resume)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import Config, ModelConfig, TrainConfig
from multiposenet_tpu.train import steps as steps_lib
from multiposenet_tpu.train.checkpoints import CheckpointManager


def test_save_restore_roundtrip():
    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        train=TrainConfig(image_size=64, num_steps=10, warmup_steps=2),
    )
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, save_interval_steps=1, max_to_keep=2)
        assert mgr.save(jax.device_get(state), force=True)
        mgr.wait()
        assert mgr.latest_step() == 7

        template = steps_lib.create_train_state(cfg, jax.random.PRNGKey(1))
        restored, step = mgr.restore(template)
        assert step == 7
        assert int(restored.step) == 7
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()


def test_restore_without_checkpoint_returns_template():
    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        train=TrainConfig(image_size=64),
    )
    template = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        restored, step = mgr.restore(template)
        assert step == 0
        assert restored is template
        mgr.close()
