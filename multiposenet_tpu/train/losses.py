"""Training losses: masked heatmap MSE, segmentation BCE, focal + huber
detection losses.

Reference counterpart: the loss block inside `model_fn` (SURVEY.md §2
"Heatmap losses" row: masked L2 between predicted and GT heatmaps, loss
masks zeroing unlabeled/crowd regions, optional segmentation sigmoid-CE) and
the RetinaNet focal/box losses of the person detector (§2 "Person detector
head" row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_heatmap_mse(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean squared error over unmasked heatmap cells.

    pred/target [B, H, W, K]; mask [B, H, W, 1] with 0 inside crowd regions.
    """
    se = (pred - target) ** 2 * mask
    denom = jnp.maximum(jnp.sum(mask) * pred.shape[-1], 1.0)
    return jnp.sum(se) / denom


def segmentation_bce(
    logits: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Sigmoid cross-entropy for the auxiliary person-segmentation output."""
    ce = optax.sigmoid_binary_cross_entropy(logits, target) * mask
    return jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1.0)


def focal_loss(
    logits: jnp.ndarray,
    cls_target: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Sigmoid focal loss over anchors; cls_target in {1, 0, -1=ignore}.

    logits/cls_target [B, N]. Normalized by the number of positive anchors
    (RetinaNet convention).
    """
    y = jnp.clip(cls_target, 0.0, 1.0)
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, y)
    p_t = p * y + (1.0 - p) * (1.0 - y)
    alpha_t = alpha * y + (1.0 - alpha) * (1.0 - y)
    fl = alpha_t * (1.0 - p_t) ** gamma * ce
    not_ignored = cls_target >= 0.0
    fl = jnp.where(not_ignored, fl, 0.0)
    num_pos = jnp.maximum(jnp.sum(cls_target == 1.0), 1.0)
    return jnp.sum(fl) / num_pos


def _elementwise_giou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU between aligned box arrays [..., 4] (y0, x0, y1, x1)."""
    iy0 = jnp.maximum(a[..., 0], b[..., 0])
    ix0 = jnp.maximum(a[..., 1], b[..., 1])
    iy1 = jnp.minimum(a[..., 2], b[..., 2])
    ix1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(
        a[..., 3] - a[..., 1], 0.0
    )
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0.0
    )
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-8)
    hy0 = jnp.minimum(a[..., 0], b[..., 0])
    hx0 = jnp.minimum(a[..., 1], b[..., 1])
    hy1 = jnp.maximum(a[..., 2], b[..., 2])
    hx1 = jnp.maximum(a[..., 3], b[..., 3])
    hull = jnp.maximum(hy1 - hy0, 0.0) * jnp.maximum(hx1 - hx0, 0.0)
    return iou - (hull - union) / jnp.maximum(hull, 1e-8)


def box_giou_loss(
    pred_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    cls_target: jnp.ndarray,
) -> jnp.ndarray:
    """Mean (1 - GIoU) over positive anchors, on DECODED boxes.

    Unlike the per-coordinate Huber on deltas, GIoU optimizes the overlap
    the evaluator and NMS actually score, and couples the four coordinates
    (a center error trades off against a size error). pred/target
    [B, N, 4] decoded (y0, x0, y1, x1); cls_target [B, N].
    """
    pos = cls_target == 1.0
    g = _elementwise_giou(pred_boxes, target_boxes)
    loss = jnp.where(pos, 1.0 - g, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(pos), 1.0)


def iou_pred_loss(
    iou_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    cls_target: jnp.ndarray,
) -> jnp.ndarray:
    """IoU-aware scoring head loss (DetectorConfig.iou_head).

    BCE between sigmoid(iou_logits) and the ACTUAL IoU of each positive
    anchor's decoded box vs its matched GT (target stop-gradded: the iou
    head learns to estimate the regressor, not to move it). Positives
    only, normalized by positive count. iou_logits [B, N], boxes
    [B, N, 4], cls_target [B, N] in {1, 0, -1}.
    """
    iy0 = jnp.maximum(pred_boxes[..., 0], target_boxes[..., 0])
    ix0 = jnp.maximum(pred_boxes[..., 1], target_boxes[..., 1])
    iy1 = jnp.minimum(pred_boxes[..., 2], target_boxes[..., 2])
    ix1 = jnp.minimum(pred_boxes[..., 3], target_boxes[..., 3])
    inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
    area_p = jnp.maximum(
        pred_boxes[..., 2] - pred_boxes[..., 0], 0.0
    ) * jnp.maximum(pred_boxes[..., 3] - pred_boxes[..., 1], 0.0)
    area_t = jnp.maximum(
        target_boxes[..., 2] - target_boxes[..., 0], 0.0
    ) * jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 0.0)
    iou = inter / jnp.maximum(area_p + area_t - inter, 1e-8)
    iou = jax.lax.stop_gradient(jnp.clip(iou, 0.0, 1.0))

    pos = cls_target == 1.0
    bce = optax.sigmoid_binary_cross_entropy(iou_logits, iou)
    bce = jnp.where(pos, bce, 0.0)
    return jnp.sum(bce) / jnp.maximum(jnp.sum(pos), 1.0)


def box_huber_loss(
    pred_deltas: jnp.ndarray,
    target_deltas: jnp.ndarray,
    cls_target: jnp.ndarray,
    delta: float = 0.1,
) -> jnp.ndarray:
    """Huber loss on box regression, positives only, per-coordinate mean.

    pred/target [B, N, 4], cls_target [B, N]."""
    pos = (cls_target == 1.0)[..., None]
    err = optax.losses.huber_loss(pred_deltas, target_deltas, delta=delta)
    err = jnp.where(pos, err, 0.0)
    num = jnp.maximum(jnp.sum(pos) * 4.0, 1.0)
    return jnp.sum(err) / num
