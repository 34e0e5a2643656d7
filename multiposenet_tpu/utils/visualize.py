"""Skeleton/heatmap visualization (the reference's notebook smoke tests).

Reference counterpart: `try_pose_estimator.ipynb` etc. drawing skeletons on
sample images (SURVEY.md §2 "Notebooks" row, §4 smoke level). Pure NumPy +
optional cv2 — no notebook dependency; used by demo scripts and for
eyeballing eval outputs.
"""

from __future__ import annotations

import numpy as np

from multiposenet_tpu.utils.constants import SKELETON

_COLORS = np.array([
    [230, 60, 60], [60, 180, 75], [60, 120, 230], [240, 160, 30],
    [145, 60, 230], [70, 210, 210], [240, 80, 170], [160, 210, 60],
], dtype=np.uint8)


def draw_skeleton(
    image: np.ndarray,
    keypoints: np.ndarray,
    score_threshold: float = 0.05,
    color: tuple[int, int, int] | None = None,
    radius: int = 3,
) -> np.ndarray:
    """Draw one person's keypoints[17, 3] (x, y, score) on a copy of image."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    col = tuple(int(c) for c in (color or _COLORS[0]))
    ok = keypoints[:, 2] > score_threshold
    for a, b in SKELETON:
        if ok[a] and ok[b]:
            pa = (int(round(keypoints[a, 0])), int(round(keypoints[a, 1])))
            pb = (int(round(keypoints[b, 0])), int(round(keypoints[b, 1])))
            cv2.line(out, pa, pb, col, 2)
    for i in np.flatnonzero(ok):
        c = (int(round(keypoints[i, 0])), int(round(keypoints[i, 1])))
        cv2.circle(out, c, radius, col, -1)
    return out


def draw_predictions(
    image: np.ndarray, people, score_threshold: float = 0.05
) -> np.ndarray:
    """Draw all PersonPredictions (box + skeleton), one color per person."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    for i, person in enumerate(people):
        col = tuple(int(c) for c in _COLORS[i % len(_COLORS)])
        y0, x0, y1, x1 = [int(round(v)) for v in person.box]
        cv2.rectangle(out, (x0, y0), (x1, y1), col, 2)
        out = draw_skeleton(out, person.keypoints, score_threshold, col)
    return out


def heatmap_overlay(
    image: np.ndarray, heatmaps: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Overlay the channel-max heatmap (resized to the image) in red."""
    import cv2

    h, w = image.shape[:2]
    hm = heatmaps.max(axis=-1)
    hm = np.clip(hm / max(hm.max(), 1e-6), 0, 1)
    hm = cv2.resize(hm, (w, h), interpolation=cv2.INTER_LINEAR)
    overlay = image.astype(np.float32).copy()
    overlay[..., 0] = np.clip(
        overlay[..., 0] + alpha * 255.0 * hm, 0, 255
    )
    return overlay.astype(np.uint8)
