"""Box utilities: (y0, x0, y1, x1) coding, IoU, encode/decode vs anchors.

Reference counterpart: the box decoding / focal-loss target assignment inside
the person-detector component (SURVEY.md §2 "Person detector head" row).
Standard Faster-RCNN delta coding: t = ((cy-acy)/ah, (cx-acx)/aw,
log(h/ah), log(w/aw)), fully vectorized — no per-box Python.
"""

from __future__ import annotations

import jax.numpy as jnp

BBOX_XFORM_CLIP = 4.135166556742356  # log(1000/16): clamp decoded log-sizes


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (y0, x0, y1, x1) → area, clamped at 0."""
    h = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    w = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return h * w


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between a[N, 4] and b[M, 4] → [N, M]."""
    y0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(y0, x0, y1, x1) → (cy, cx, h, w)."""
    hw = boxes[..., 2:4] - boxes[..., 0:2]
    c = boxes[..., 0:2] + hw / 2.0
    return jnp.concatenate([c, hw], axis=-1)


def from_center(cboxes: jnp.ndarray) -> jnp.ndarray:
    """(cy, cx, h, w) → (y0, x0, y1, x1)."""
    half = cboxes[..., 2:4] / 2.0
    return jnp.concatenate(
        [cboxes[..., 0:2] - half, cboxes[..., 0:2] + half], axis=-1
    )


def encode(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """GT boxes → regression deltas relative to anchors (same leading dims)."""
    gt = to_center(boxes)
    an = to_center(anchors)
    tyx = (gt[..., 0:2] - an[..., 0:2]) / jnp.maximum(an[..., 2:4], 1e-8)
    thw = jnp.log(
        jnp.maximum(gt[..., 2:4], 1e-8) / jnp.maximum(an[..., 2:4], 1e-8)
    )
    return jnp.concatenate([tyx, thw], axis=-1)


def decode(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Regression deltas + anchors → boxes (y0, x0, y1, x1)."""
    an = to_center(anchors)
    cyx = deltas[..., 0:2] * an[..., 2:4] + an[..., 0:2]
    hw = jnp.exp(jnp.minimum(deltas[..., 2:4], BBOX_XFORM_CLIP)) * an[..., 2:4]
    return from_center(jnp.concatenate([cyx, hw], axis=-1))


def clip_to_image(boxes: jnp.ndarray, height: float, width: float):
    y = jnp.clip(boxes[..., 0::2], 0.0, height)
    x = jnp.clip(boxes[..., 1::2], 0.0, width)
    return jnp.stack(
        [y[..., 0], x[..., 0], y[..., 1], x[..., 1]], axis=-1
    )
