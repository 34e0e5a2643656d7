"""Training target generation: Gaussian keypoint heatmaps, loss masks,
segmentation mask, detector anchor labels.

Reference counterpart: `get_heatmaps()` + loss-mask generation inside the
tf.data input pipeline (SURVEY.md §2 "Input pipeline" row: "generate
per-keypoint Gaussian target heatmaps at output stride (4) + loss masks for
unannotated/crowd regions") and anchor assignment for the detector head.

TPU-first design: targets are generated ON DEVICE inside the jitted train
step from padded raw annotations (keypoints[B, P, 17, 3], boxes[B, P, 4]) —
a few fused VPU broadcasts over the 128x128 grid — instead of the
reference's host-side per-image Python. This keeps the host input path to
"decode JPEG + pad annotations" only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keypoint_heatmaps(
    keypoints: jnp.ndarray,
    hm_height: int,
    hm_width: int,
    stride: int,
    sigma: float = 2.0,
) -> jnp.ndarray:
    """Padded keypoints[P, 17, 3] (x, y, v in input-image pixels) →
    target heatmaps [hm_height, hm_width, 17].

    Each channel is the max over persons of a unit-height Gaussian centered
    at that person's keypoint (v > 0 marks a labeled keypoint; padded rows
    use v = 0). Coordinates map to heatmap cells as x / stride.
    """
    kx = keypoints[..., 0] / stride  # [P, K]
    ky = keypoints[..., 1] / stride
    vis = keypoints[..., 2] > 0

    yy = jnp.arange(hm_height, dtype=jnp.float32)[:, None, None, None]
    xx = jnp.arange(hm_width, dtype=jnp.float32)[None, :, None, None]
    d2 = (yy - ky[None, None]) ** 2 + (xx - kx[None, None]) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma**2))  # [H, W, P, K]
    g = jnp.where(vis[None, None], g, 0.0)
    return jnp.max(g, axis=2)  # [H, W, K]


def batched_keypoint_heatmaps(
    keypoints: jnp.ndarray, hm_height: int, hm_width: int, stride: int,
    sigma: float = 2.0,
) -> jnp.ndarray:
    """vmap over images: [B, P, 17, 3] → [B, H, W, 17]."""
    return jax.vmap(
        lambda k: keypoint_heatmaps(k, hm_height, hm_width, stride, sigma)
    )(keypoints)


def box_region_mask(
    boxes: jnp.ndarray,
    flags: jnp.ndarray,
    hm_height: int,
    hm_width: int,
    stride: int,
) -> jnp.ndarray:
    """Union of flagged boxes rasterized on the heatmap grid → [H, W] bool.

    boxes[P, 4] are (y0, x0, y1, x1) in input pixels; flags[P] selects which
    boxes participate (e.g. crowd regions, unannotated persons).
    """
    y0 = boxes[:, 0] / stride
    x0 = boxes[:, 1] / stride
    y1 = boxes[:, 2] / stride
    x1 = boxes[:, 3] / stride
    yy = jnp.arange(hm_height, dtype=jnp.float32)[:, None, None]
    xx = jnp.arange(hm_width, dtype=jnp.float32)[None, :, None]
    inside = (
        (yy >= y0[None, None]) & (yy <= y1[None, None])
        & (xx >= x0[None, None]) & (xx <= x1[None, None])
    )  # [H, W, P]
    return jnp.any(inside & flags[None, None], axis=-1)


def loss_mask(
    crowd_boxes: jnp.ndarray,
    crowd_valid: jnp.ndarray,
    hm_height: int,
    hm_width: int,
    stride: int,
) -> jnp.ndarray:
    """1.0 everywhere except inside crowd/unannotated regions → [H, W, 1].

    Reference semantics: "loss masks zero out unlabeled persons/crowds"
    (SURVEY.md §2 "Heatmap losses" row).
    """
    crowd = box_region_mask(
        crowd_boxes, crowd_valid, hm_height, hm_width, stride
    )
    return jnp.where(crowd, 0.0, 1.0)[..., None]


def segmentation_target(
    boxes: jnp.ndarray,
    person_valid: jnp.ndarray,
    hm_height: int,
    hm_width: int,
    stride: int,
) -> jnp.ndarray:
    """Union of person boxes as the auxiliary segmentation target [H, W, 1].

    The reference uses COCO segmentation polygons; without pycocotools in
    this environment (SURVEY.md §7), box-union is the documented stand-in —
    the aux head only regularizes the trunk.
    """
    m = box_region_mask(boxes, person_valid, hm_height, hm_width, stride)
    return m.astype(jnp.float32)[..., None]


def label_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    match_high: float = 0.5,
    match_low: float = 0.4,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RetinaNet anchor assignment for one image.

    anchors[N, 4], gt_boxes[P, 4] (padded; gt_valid[P] marks real boxes).
    Returns (cls_target[N] in {1 pos, 0 neg, -1 ignore},
             box_target[N, 4] encode() deltas toward the matched GT,
             matched_iou[N]).
    Force-match rule: every valid GT's best anchor is positive (standard
    RetinaNet, keeps small persons matched).
    """
    from multiposenet_tpu.ops.boxes import encode, pairwise_iou

    n = anchors.shape[0]
    iou = pairwise_iou(anchors, gt_boxes)  # [N, P]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)              # [N]
    best_iou = jnp.max(iou, axis=1)                # [N]

    cls = jnp.where(
        best_iou >= match_high,
        1.0,
        jnp.where(best_iou < match_low, 0.0, -1.0),
    )
    # Force-match: the argmax anchor of each valid GT becomes positive and
    # regresses toward that GT (ties between GTs: last write wins). Invalid
    # (padded) GTs all argmax to anchor 0; scatter order between duplicate
    # indices is unspecified, so route their writes to an overflow slot n
    # instead of letting a False/stale write clobber anchor 0.
    best_anchor = jnp.argmax(iou, axis=0)          # [P]
    safe_anchor = jnp.where(gt_valid, best_anchor, n)
    force = jnp.zeros((n + 1,), bool).at[safe_anchor].set(True)[:n]
    cls = jnp.where(force, 1.0, cls)
    p_idx = jnp.arange(gt_boxes.shape[0])
    best_gt = (
        jnp.concatenate([best_gt, jnp.zeros((1,), best_gt.dtype)])
        .at[safe_anchor].set(p_idx)[:n]
    )

    matched_boxes = gt_boxes[best_gt]              # [N, 4]
    box_target = encode(matched_boxes, anchors)
    return cls, box_target, best_iou


def batched_label_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    match_high: float = 0.5,
    match_low: float = 0.4,
):
    """vmap over images: gt_boxes[B, P, 4], gt_valid[B, P]."""
    return jax.vmap(
        lambda b, v: label_anchors(anchors, b, v, match_high, match_low)
    )(gt_boxes, gt_valid)
