"""Detector post-processing: head outputs → person boxes (fixed shapes).

Reference counterpart: box decoding + per-image NMS after the RetinaNet-style
person head (SURVEY.md §2 "Person detector head" row; §3.4 inference step
"sess.run(detector: boxes, scores) + NMS"). Everything here is batched,
fixed-shape, and jit-compatible so it fuses into the single inference XLA
program (BASELINE.json north star).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import DetectorConfig
from multiposenet_tpu.ops import boxes as box_ops
from multiposenet_tpu.ops.anchors import all_anchors
from multiposenet_tpu.ops.nms import batched_nms


class Detections(NamedTuple):
    """Fixed-size per-image person detections.

    boxes:  [B, D, 4] (y0, x0, y1, x1) in input-image pixels.
    scores: [B, D] sigmoid person confidence (0 for invalid slots).
    valid:  [B, D] bool.
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray


def flatten_outputs(
    detector_out: dict[str, dict[str, jnp.ndarray]],
    min_level: int,
    max_level: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level {cls[B,H,W,A], box[B,H,W,A*4]} → (cls[B,N], box[B,N,4]).

    Flattening order (level-major, row-major spatial, anchor index) matches
    `ops.anchors.all_anchors`.
    """
    cls_list, box_list = [], []
    for level in range(min_level, max_level + 1):
        out = detector_out[f"P{level}"]
        cls = out["cls"]
        box = out["box"]
        b = cls.shape[0]
        cls_list.append(cls.reshape(b, -1))
        box_list.append(box.reshape(b, -1, 4))
    return (
        jnp.concatenate(cls_list, axis=1),
        jnp.concatenate(box_list, axis=1),
    )


def flatten_iou_outputs(
    detector_out: dict[str, dict[str, jnp.ndarray]],
    min_level: int,
    max_level: int,
) -> jnp.ndarray:
    """Per-level iou[B, H, W, A] logits → [B, N], same order as
    `flatten_outputs` (present only with DetectorConfig.iou_head)."""
    return jnp.concatenate(
        [
            detector_out[f"P{level}"]["iou"].reshape(
                detector_out[f"P{level}"]["iou"].shape[0], -1
            )
            for level in range(min_level, max_level + 1)
        ],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("config", "image_size")
)
def postprocess_detections(
    detector_out: dict[str, dict[str, jnp.ndarray]],
    image_size: int,
    config: DetectorConfig = DetectorConfig(),
) -> Detections:
    """Joint decode + top-k + NMS for a batch of detector head outputs."""
    logits, deltas = flatten_outputs(
        detector_out, config.min_level, config.max_level
    )
    logits = logits.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    anchors = jnp.asarray(all_anchors(image_size, config))

    # IoU-aware scoring (config.iou_head): the ranking score becomes
    # sigmoid(cls) * sigmoid(iou)^p so the best-LOCALIZED candidate wins
    # NMS. log-space keeps the top-k operand monotone with that product:
    # log_sigmoid(cls) + p * log_sigmoid(iou).
    if config.iou_head and "iou" in detector_out[f"P{config.min_level}"]:
        iou_logits = flatten_iou_outputs(
            detector_out, config.min_level, config.max_level
        ).astype(jnp.float32)
        rank = (jax.nn.log_sigmoid(logits)
                + config.iou_score_power * jax.nn.log_sigmoid(iou_logits))
    else:
        rank = logits

    # Pre-NMS top-k on the ranking operand (monotonic with the final
    # score). The exact top_k sort over ~49k anchors costs ~6 ms at bs=64
    # on v5e; the bucketed approx_max_k halves that and only perturbs
    # membership at the pool tail, which NMS (max_detections << k) never
    # reaches.
    k = min(config.pre_nms_top_k, rank.shape[1])
    if config.approx_top_k:
        top_rank, top_idx = jax.lax.approx_max_k(rank, k)
    else:
        top_rank, top_idx = jax.lax.top_k(rank, k)  # [B, k]
    top_deltas = jnp.take_along_axis(
        deltas, top_idx[..., None], axis=1
    )
    top_anchors = anchors[top_idx]  # [B, k, 4]

    decoded = box_ops.decode(top_deltas, top_anchors)
    decoded = box_ops.clip_to_image(
        decoded, float(image_size), float(image_size)
    )
    if rank is logits:
        scores = jax.nn.sigmoid(top_rank)
    else:
        # top_rank is the log of the combined score.
        scores = jnp.exp(top_rank)
    # Zero out candidates below the score threshold before NMS. With
    # iou_head on, the threshold applies to the COMBINED score
    # sigmoid(cls)*sigmoid(iou)^p — systematically lower than cls alone
    # (about half at the zero-init neutral iou bias), so enabling the knob
    # implicitly tightens the pre-NMS cut; retune score_threshold when
    # flipping iou_head (ADVICE r4). Thresholding the combined score is
    # deliberate: it is the quantity NMS ranks and the caller consumes.
    scores = jnp.where(scores >= config.score_threshold, scores, 0.0)

    out_boxes, out_scores, valid = batched_nms(
        decoded, scores, config.max_detections, config.nms_iou_threshold,
        config.nms_vote_iou, config.soft_nms_sigma,
    )
    valid = valid & (out_scores > 0.0)
    return Detections(
        boxes=out_boxes, scores=out_scores, valid=valid
    )
