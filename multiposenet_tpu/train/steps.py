"""Jitted train/eval steps with on-device target generation and EMA.

Reference counterpart: `model_fn(features, labels, mode, params)` + the
MonitoredTrainingSession loop (SURVEY.md §3.2): forward → masked losses →
Adam with schedule → ExponentialMovingAverage of weights (the author's
invariant: eval/export uses EMA). Here the whole step — including Gaussian
heatmap target generation and anchor labeling, which the reference did on
host tf.data threads — is ONE jitted XLA program; under a data mesh the
gradient all-reduce rides ICI automatically (SURVEY.md §5 collectives:
"(a) gradient all-reduce in training").
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from multiposenet_tpu.config import Config
from multiposenet_tpu.data import targets as targets_lib
from multiposenet_tpu.models.posenet import MultiPoseNet
from multiposenet_tpu.ops import boxes as boxes_lib
from multiposenet_tpu.ops.anchors import all_anchors
from multiposenet_tpu.ops.detection import (
    flatten_iou_outputs,
    flatten_outputs,
)
from multiposenet_tpu.train import losses as losses_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any


def make_learning_rate(config: Config) -> optax.Schedule:
    """Linear warmup → cosine decay (reference used piecewise/cosine)."""
    t = config.train
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=t.learning_rate,
        warmup_steps=t.warmup_steps,
        decay_steps=max(t.num_steps, t.warmup_steps + 1),
        end_value=t.end_learning_rate,
    )


def make_optimizer(config: Config) -> optax.GradientTransformation:
    t = config.train
    return optax.chain(
        optax.clip_by_global_norm(t.gradient_clip_norm),
        optax.adamw(
            make_learning_rate(config), weight_decay=t.weight_decay
        ),
    )


def create_train_state(
    config: Config, rng: jax.Array, model: MultiPoseNet | None = None
) -> TrainState:
    model = model or MultiPoseNet(config=config, with_detector=True)
    dummy = jnp.zeros(
        (1, config.train.image_size, config.train.image_size, 3),
        jnp.float32,
    )
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=params,
        opt_state=tx.init(params),
    )


def _device_targets(batch: dict, config: Config):
    """Raw padded annotations → heatmap/seg/mask/anchor targets, on device."""
    m = config.model
    s = config.train.image_size
    hm_h = hm_w = s // m.output_stride
    person = batch["valid"] & ~batch["iscrowd"]

    heatmaps = targets_lib.batched_keypoint_heatmaps(
        batch["keypoints"], hm_h, hm_w, m.output_stride
    )
    # Mask the heatmap loss inside crowd regions AND around persons with no
    # labeled keypoints ("loss masks for unannotated/crowd regions",
    # SURVEY.md §2 Input pipeline) — such persons have real peaks the GT
    # can't represent. They still supervise the detector and seg aux head.
    unlabeled = ~(batch["keypoints"][..., 2] > 0).any(axis=-1)
    mask = jax.vmap(
        lambda b, f: targets_lib.loss_mask(b, f, hm_h, hm_w, m.output_stride)
    )(batch["boxes"], batch["valid"] & (batch["iscrowd"] | unlabeled))
    seg = jax.vmap(
        lambda b, f: targets_lib.segmentation_target(
            b, f, hm_h, hm_w, m.output_stride
        )
    )(batch["boxes"], person)
    if "exclude_cov" in batch:
        # Real segmentation-derived coverage (data/masks.py; persons
        # without a segmentation already contributed their box rectangle
        # on the host, so the coverage maps are complete): soft-weight the
        # heatmap loss by (1 - crowd/unlabeled coverage) and use the
        # person coverage as the aux seg target. Images without real
        # masks (has_mask=False) keep the box-union fallback from above.
        hm_flag = batch["has_mask"][:, None, None, None]
        mask = jnp.where(
            hm_flag, 1.0 - batch["exclude_cov"][..., None], mask
        )
        seg = jnp.where(hm_flag, batch["person_cov"][..., None], seg)

    anchors = jnp.asarray(all_anchors(s, config.detector))
    cls_t, box_t, _ = targets_lib.batched_label_anchors(
        anchors, batch["boxes"], person,
        config.detector.match_high, config.detector.match_low,
    )
    return heatmaps, mask, seg, cls_t, box_t


def compute_losses(
    model_out: dict, batch: dict, config: Config
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """All training losses from model outputs + raw batch annotations."""
    t = config.train
    d = config.detector
    heatmaps_t, mask, seg_t, cls_t, box_t = _device_targets(batch, config)

    hm_loss = losses_lib.masked_heatmap_mse(
        model_out["heatmaps"], heatmaps_t, mask
    )
    total = t.heatmap_loss_weight * hm_loss
    metrics = {"heatmap_loss": hm_loss}

    if "segmentation" in model_out:
        seg_loss = losses_lib.segmentation_bce(
            model_out["segmentation"], seg_t, mask
        )
        total = total + t.segmentation_loss_weight * seg_loss
        metrics["segmentation_loss"] = seg_loss

    if "detector" in model_out:
        logits, deltas = flatten_outputs(
            model_out["detector"], d.min_level, d.max_level
        )
        cls_loss = losses_lib.focal_loss(
            logits.astype(jnp.float32), cls_t, d.focal_alpha, d.focal_gamma
        )
        pred_boxes = tgt_boxes = None
        if d.box_loss == "giou" or d.iou_head:
            anchors = jnp.asarray(all_anchors(t.image_size, d))
            pred_boxes = boxes_lib.decode(deltas.astype(jnp.float32), anchors)
            tgt_boxes = boxes_lib.decode(box_t, anchors)
        if d.box_loss == "giou":
            box_loss = losses_lib.box_giou_loss(pred_boxes, tgt_boxes, cls_t)
            det_loss = cls_loss + d.giou_loss_weight * box_loss
        else:
            box_loss = losses_lib.box_huber_loss(
                deltas.astype(jnp.float32), box_t, cls_t
            )
            det_loss = cls_loss + d.box_loss_weight * box_loss
        metrics.update(
            cls_loss=cls_loss, box_loss=box_loss
        )
        if d.iou_head:
            iou_logits = flatten_iou_outputs(
                model_out["detector"], d.min_level, d.max_level
            ).astype(jnp.float32)
            iou_loss = losses_lib.iou_pred_loss(
                iou_logits, pred_boxes, tgt_boxes, cls_t
            )
            det_loss = det_loss + d.iou_loss_weight * iou_loss
            metrics["iou_pred_loss"] = iou_loss
        total = total + t.detector_loss_weight * det_loss
        metrics["detector_loss"] = det_loss
    metrics["total_loss"] = total
    return total, metrics


def make_train_step(config: Config, model: MultiPoseNet | None = None):
    """Returns jittable train_step(state, batch) -> (state, metrics).

    `batch` is the loader's dict; images arrive uint8 and are normalized on
    device (fused input path). Shard batch leaves over the data mesh and
    replicate the state — XLA inserts the gradient psum over ICI.
    """
    model = model or MultiPoseNet(config=config, with_detector=True)
    tx = make_optimizer(config)
    ema_decay = config.train.ema_decay

    def train_step(state: TrainState, batch: dict):
        from multiposenet_tpu.ops.image import normalize

        images = (batch["images"].astype(jnp.float32)
                  if config.model.fold_input_norm
                  else normalize(batch["images"]))

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            total, metrics = compute_losses(out, batch, config)
            return total, (metrics, mutated["batch_stats"])

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        # EMA with the reference's warmup ramp (tf.train.
        # ExponentialMovingAverage with num_updates): early steps use a
        # small effective decay so the average tracks training instead of
        # staying anchored at the random init — with a flat 0.999, a
        # 600-step run's EMA still weights the init 0.55.
        step = state.step.astype(jnp.float32) + 1.0
        eff_decay = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * eff_decay + p * (1.0 - eff_decay),
            state.ema_params,
            new_params,
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(config: Config, model: MultiPoseNet | None = None):
    """Eval forward + losses using EMA params (the reference's invariant:
    eval uses EMA weights)."""
    model = model or MultiPoseNet(config=config, with_detector=True)

    def eval_step(state: TrainState, batch: dict):
        from multiposenet_tpu.ops.image import normalize

        images = (batch["images"].astype(jnp.float32)
                  if config.model.fold_input_norm
                  else normalize(batch["images"]))
        out = model.apply(
            {"params": state.ema_params,
             "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        _, metrics = compute_losses(out, batch, config)
        return out, metrics

    return eval_step
