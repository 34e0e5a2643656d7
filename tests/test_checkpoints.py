"""Orbax checkpoint save/restore round-trip (SURVEY.md §5 checkpoint/resume)."""

import pytest

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import Config, ModelConfig, TrainConfig
from multiposenet_tpu.train import steps as steps_lib
from multiposenet_tpu.train.checkpoints import CheckpointManager


@pytest.mark.slow  # main-trainer orbax roundtrip; PRN resume roundtrip stays fast
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
    # Minimal widths/size: this test only needs SOME train-state template
    # (the restore fast-path is pure bookkeeping), so keep its one-time
    # init compile as cheap as possible for the fast tier.
    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=16,
                          head_channels=16),
        train=TrainConfig(image_size=32),
    )
    template = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        restored, step = mgr.restore(template)
        assert step == 0
        assert restored is template
        mgr.close()


def test_prn_checkpoint_resume(tmp_path):
    """PRN trainer saves/resumes via Orbax like the main trainer."""
    from multiposenet_tpu.config import (Config, ModelConfig, PRNConfig,
                                         TrainConfig)
    from multiposenet_tpu.data.loader import batch_iterator
    from multiposenet_tpu.data.synthetic import make_dataset
    from multiposenet_tpu.train import prn_train

    cfg = Config(
        model=ModelConfig(backbone_width=0.25),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32,
                      max_persons=4),
        train=TrainConfig(image_size=64, batch_size=2, seed=0),
    )
    records = make_dataset(8, img_h=64, img_w=64, seed=0)

    def batches():
        return batch_iterator(records, 2, 64, 4, train=True, augment=False)

    d = str(tmp_path / "prn_ckpt")
    s1 = prn_train.train_prn(cfg, batches(), num_steps=4,
                             checkpoint_dir=d, save_interval_steps=2)
    assert int(s1.step) == 4
    # Resume: 4 steps already done, target 6 → exactly 2 more.
    s2 = prn_train.train_prn(cfg, batches(), num_steps=6,
                             checkpoint_dir=d, save_interval_steps=2)
    assert int(s2.step) == 6
