"""PRN trainer: synthesized-heatmap CE training must raise assignment
accuracy well above chance on crowded synthetic scenes (BASELINE.json:10
stresses ≥8-person images)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import Config, ModelConfig, PRNConfig, TrainConfig
from multiposenet_tpu.data.loader import make_batch
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.train import prn_train


def cfg_small():
    return Config(
        model=ModelConfig(backbone_width=0.25),
        prn=PRNConfig(crop_height=28, crop_width=18, hidden_units=256,
                      max_persons=10),
        train=TrainConfig(image_size=128, batch_size=4, seed=0),
    )


def crowded_batches(cfg, n_batches, batch_size, seed=0):
    records = make_dataset(
        64, img_h=128, img_w=128, min_persons=8, max_persons=10, seed=seed
    )
    rng = np.random.RandomState(seed)
    for i in range(n_batches):
        idx = rng.choice(len(records), batch_size, replace=False)
        yield make_batch(
            [records[j] for j in idx], cfg.train.image_size,
            cfg.prn.max_persons, train=False,
        )


def test_crop_cell_targets_roundtrip():
    """A keypoint at a crop cell's sampling position maps to that cell."""
    box = jnp.asarray([[16.0, 24.0, 80.0, 72.0]])  # input pixels
    stride = 4
    ch, cw = 28, 18
    # Pick cell (5, 7); its sampled heatmap coords:
    y0, x0 = 16 / stride, 24 / stride
    bh, bw = (80 - 16) / stride, (72 - 24) / stride
    hy = y0 + (5 + 0.5) * bh / ch - 0.5
    hx = x0 + (7 + 0.5) * bw / cw - 0.5
    kp = jnp.zeros((1, 17, 3)).at[0, 3].set(
        jnp.asarray([hx * stride, hy * stride, 2.0])
    )
    cell, weight = prn_train.crop_cell_targets(kp, box, ch, cw, stride)
    assert weight[0, 3] == 1.0
    assert int(cell[0, 3]) == 7 * ch + 5  # column-major flat
    # Invisible keypoints carry zero weight.
    assert weight[0, 0] == 0.0


@pytest.mark.slow  # PRN training; smoke gate trains a PRN end-to-end (fast)
def test_prn_training_improves_accuracy():
    cfg = cfg_small()
    state = prn_train.create_prn_state(cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(prn_train.make_prn_train_step(cfg))

    # Fixtures v2 (occlusion + truncation) make 8-10-person discrimination
    # genuinely hard: measured batch-accuracy trajectory 0.05 → 0.58 over
    # 150 steps (vs 90 steps to >0.5 on v1). Per-batch accuracy is noisy
    # at batch_size=4, so the floor is on the trailing-10 mean.
    first_acc, accs = None, []
    for i, batch in enumerate(crowded_batches(cfg, 150, 4)):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        if i == 0:
            first_acc = float(metrics["prn_accuracy"])
        accs.append(float(metrics["prn_accuracy"]))
    last_loss = float(metrics["prn_loss"])
    tail_acc = float(np.mean(accs[-10:]))
    assert np.isfinite(last_loss)
    assert tail_acc > first_acc + 0.2, (first_acc, tail_acc)
    assert tail_acc > 0.4, tail_acc


@pytest.mark.slow  # default-off knob loss path
def test_window_jitter_loss_path():
    """prn.window_jitter: jittered windows give a finite, different loss
    from the exact-GT-window path, and jitter=0 with an rng is identical
    to the reference no-rng path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.train.prn_train import (
        create_prn_state, make_prn, prn_loss_fn,
    )

    from multiposenet_tpu.config import (
        Config, ModelConfig, PRNConfig, TrainConfig,
    )

    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        prn=PRNConfig(crop_height=8, crop_width=6, hidden_units=32,
                      max_persons=3),
        train=TrainConfig(image_size=64, batch_size=2, num_steps=1),
    )
    prn = make_prn(cfg)
    state = create_prn_state(cfg, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(42)
    batch = {
        "keypoints": jnp.zeros((2, 3, 17, 3)).at[..., :2].set(20.0)
        .at[..., 2].set(2.0),
        "boxes": jnp.tile(jnp.asarray([8.0, 8.0, 40.0, 40.0]), (2, 3, 1)),
        "valid": jnp.ones((2, 3), bool),
        "iscrowd": jnp.zeros((2, 3), bool),
    }
    base, _ = prn_loss_fn(prn, state.params, batch, cfg)
    base_rng, _ = prn_loss_fn(prn, state.params, batch, cfg, rng)
    assert float(base) == float(base_rng)  # jitter=0: rng is inert

    jcfg = cfg.replace(prn=dataclasses.replace(cfg.prn, window_jitter=0.1))
    jit_loss, metrics = prn_loss_fn(prn, state.params, batch, jcfg, rng)
    assert jnp.isfinite(jit_loss)
    assert float(jit_loss) != float(base)  # windows actually moved
