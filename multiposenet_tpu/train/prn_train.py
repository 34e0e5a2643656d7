"""PRN training on GT boxes with heatmaps synthesized from GT keypoints.

Reference counterpart: `train_prn.py` (SURVEY.md §3.3): "input: GT person
boxes + heatmaps SYNTHESIZED from GT keypoints (Gaussian at each keypoint of
ALL persons in the box crop — teaches PRN to pick the right person's peaks)
→ crop/resize to fixed grid → prn() forward → softmax-CE vs one-hot GT grid
→ Adam → small ckpt."

TPU-first: heatmap synthesis, crop-resize (interpolation-matrix matmuls),
the PRN forward, and the CE loss all run inside one jitted step over padded
[B, P] person slots with a validity/visibility weight mask — no per-box
Python loop.
"""

from __future__ import annotations

import functools
from typing import Any, Iterator

import flax.struct
import jax
import jax.numpy as jnp
import optax

from multiposenet_tpu.config import Config
from multiposenet_tpu.data import targets as targets_lib
from multiposenet_tpu.models.prn import PRN
from multiposenet_tpu.ops import prn_ops


@flax.struct.dataclass
class PRNTrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_prn(config: Config) -> PRN:
    return PRN(
        crop_height=config.prn.crop_height,
        crop_width=config.prn.crop_width,
        num_keypoints=config.model.num_keypoints,
        hidden_units=config.prn.hidden_units,
    )


def crop_cell_targets(
    keypoints: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
    stride: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-person GT keypoints → nearest crop-grid cell indices + weights.

    keypoints[P, 17, 3] in input pixels, boxes[P, 4] in input pixels.
    Returns (cell[P, 17] flattened crop index, weight[P, 17] 1.0 where the
    keypoint is visible AND lands inside the box crop).
    Inverts the sampling convention of prn_ops.interp_matrix:
        cell i samples y = y0 + (i + 0.5) * bh / ch - 0.5
        ⇒  i = (y - y0 + 0.5) * ch / bh - 0.5.
    The flat index is COLUMN-major (j * crop_height + i), matching the
    channel-major PRN layout (ops/prn_ops.to_channel_major).
    """
    y0 = boxes[:, 0:1] / stride
    x0 = boxes[:, 1:2] / stride
    bh = jnp.maximum((boxes[:, 2:3] - boxes[:, 0:1]) / stride, 1e-3)
    bw = jnp.maximum((boxes[:, 3:4] - boxes[:, 1:2]) / stride, 1e-3)
    ky = keypoints[..., 1] / stride
    kx = keypoints[..., 0] / stride

    fi = (ky - y0 + 0.5) * crop_height / bh - 0.5
    fj = (kx - x0 + 0.5) * crop_width / bw - 0.5
    i = jnp.clip(jnp.round(fi), 0, crop_height - 1).astype(jnp.int32)
    j = jnp.clip(jnp.round(fj), 0, crop_width - 1).astype(jnp.int32)
    inside = (
        (fi >= -0.5) & (fi <= crop_height - 0.5)
        & (fj >= -0.5) & (fj <= crop_width - 0.5)
    )
    weight = ((keypoints[..., 2] > 0) & inside).astype(jnp.float32)
    return j * crop_height + i, weight


def prn_loss_fn(
    prn: PRN,
    params: Any,
    batch: dict,
    config: Config,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Softmax-CE of the PRN output vs the one-hot GT grid, masked."""
    m = config.model
    p_cfg = config.prn
    s = config.train.image_size
    stride = m.output_stride
    hm_h = hm_w = s // stride

    # Heatmaps synthesized from ALL persons' GT keypoints (on device).
    hms = targets_lib.batched_keypoint_heatmaps(
        batch["keypoints"], hm_h, hm_w, stride
    )  # [B, H, W, K]
    boxes = batch["boxes"]
    if p_cfg.window_jitter > 0.0 and rng is not None:
        # Train/test window mismatch fix (config.prn.window_jitter): the
        # inference windows are noisy detector boxes, not exact GT boxes.
        # Move each edge by Uniform(±jitter × side); the cell targets
        # below derive from the SAME jittered box, and keypoints pushed
        # outside the window are masked by crop_cell_targets' `inside`.
        j = p_cfg.window_jitter
        y0, x0, y1, x1 = (boxes[..., i] for i in range(4))
        u = jax.random.uniform(rng, boxes.shape, minval=-j, maxval=j)
        h = (y1 - y0)[..., None]
        w = (x1 - x0)[..., None]
        deltas = u * jnp.concatenate(
            [h, w, h, w], axis=-1
        )
        boxes = boxes + deltas
    # Same crop margin as inference (predictor._prn_assign) so the PRN
    # trains on the geometry it will see.
    boxes = prn_ops.expand_boxes(boxes, p_cfg.crop_margin)
    hm_boxes = boxes / stride
    crops = prn_ops.batched_crop_heatmaps(
        hms, hm_boxes, p_cfg.crop_height, p_cfg.crop_width
    )  # [B, P, cw, ch, K]
    b, p = crops.shape[:2]
    crops_km = prn_ops.to_channel_major(crops, m.num_keypoints)

    logits = prn.apply(
        params, crops_km, return_logits=True
    )  # [B*P, K, hw] — hw column-major (j * ch + i)
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    cell, weight = jax.vmap(
        lambda k, bx: crop_cell_targets(
            k, bx, p_cfg.crop_height, p_cfg.crop_width, stride
        )
    )(batch["keypoints"], boxes)  # [B, P, 17] each
    cell = cell.reshape(b * p, m.num_keypoints)
    weight = weight.reshape(b * p, m.num_keypoints)
    person_ok = (batch["valid"] & ~batch["iscrowd"]).reshape(b * p)
    weight = weight * person_ok[:, None]

    picked = jnp.take_along_axis(
        log_probs, cell[..., None], axis=-1
    )[..., 0]  # [B*P, 17]
    ce = -(picked * weight).sum() / jnp.maximum(weight.sum(), 1.0)

    # Assignment accuracy: argmax cell == GT cell.
    pred_cell = jnp.argmax(logits, axis=-1)
    acc = ((pred_cell == cell) * weight).sum() / jnp.maximum(
        weight.sum(), 1.0
    )
    return ce, {"prn_loss": ce, "prn_accuracy": acc}


def create_prn_state(config: Config, rng: jax.Array) -> PRNTrainState:
    prn = make_prn(config)
    dummy = jnp.zeros(
        (1, config.model.num_keypoints,
         config.prn.crop_height * config.prn.crop_width),
        jnp.float32,
    )
    params = prn.init(rng, dummy)
    tx = optax.adam(1e-3)
    return PRNTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def make_prn_train_step(config: Config):
    prn = make_prn(config)
    tx = optax.adam(1e-3)
    # Per-step jitter stream, independent of the init key and
    # deterministic under checkpoint/resume (folds in state.step).
    base_rng = jax.random.PRNGKey(config.train.seed + 1)

    def step(state: PRNTrainState, batch: dict):
        rng = jax.random.fold_in(base_rng, state.step)
        grads, metrics = jax.grad(
            lambda prm: prn_loss_fn(prn, prm, batch, config, rng),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return (
            PRNTrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            metrics,
        )

    return step


def train_prn(
    config: Config,
    batches: Iterator[dict],
    num_steps: int,
    log_fn=None,
    checkpoint_dir: str | None = None,
    save_interval_steps: int = 500,
    max_to_keep: int = 2,
) -> PRNTrainState:
    """Standalone PRN training (the reference's separate train_prn.py,
    which saves "a small ckpt" — here optional Orbax checkpoint/resume
    via the same manager the main trainer uses)."""
    state = create_prn_state(config, jax.random.PRNGKey(config.train.seed))
    mgr = None
    done = 0
    if checkpoint_dir:
        from multiposenet_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir, save_interval_steps,
                                max_to_keep)
        state, done = mgr.restore(state)
    step_fn = jax.jit(make_prn_train_step(config))
    # Check BEFORE pulling a batch — a fully-resumed run must not consume
    # (or block on) the iterator at all (ADVICE r2).
    it = iter(batches)
    while done < num_steps:
        batch = next(it, None)
        if batch is None:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        done += 1
        if log_fn and done % 50 == 0:
            log_fn({k: float(v) for k, v in metrics.items()} | {
                "step": done
            })
        if mgr and mgr.should_save(done):
            mgr.save(jax.device_get(state))
    if mgr:
        mgr.save(jax.device_get(state), force=True)
        mgr.wait()
        mgr.close()
    return state
