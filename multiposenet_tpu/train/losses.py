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
