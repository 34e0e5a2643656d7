"""Pure-NumPy COCO keypoint evaluation (OKS AP) — pycocotools equivalent.

Reference counterpart: `COCOeval(iouType='keypoints')` driven by the eval
notebook (SURVEY.md §2 "COCO eval" row, §3.5). pycocotools is NOT installed
in this environment (verified, SURVEY.md §7), so this module reimplements the
published COCO keypoint evaluation protocol from its specification:

  * OKS(dt, gt) = mean over labeled gt keypoints of
        exp( -d_i^2 / (2 * s^2 * k_i^2) ),
    with k_i = 2 * sigma_i (constants.OKS_SIGMAS), s^2 = gt area.
  * Greedy matching per image: detections sorted by score; each detection
    takes the unmatched GT with the highest OKS above the threshold
    (crowd/ignore GTs can be matched last and remove the detection from
    scoring).
  * Precision/recall accumulated over OKS thresholds 0.50:0.05:0.95,
    area ranges (all / medium / large), maxDets=20; AP is the mean of
    precision interpolated at 101 recall points.

Matches pycocotools' documented behavior; validated against hand-computed
cases in tests/test_oks.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from multiposenet_tpu.utils.constants import NUM_KEYPOINTS, OKS_SIGMAS

OKS_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, float(np.inf)),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, float(np.inf)),
}
MAX_DETS = 20


@dataclasses.dataclass
class GroundTruth:
    """One GT person: keypoints[17, 3] (x, y, v), area, iscrowd."""

    keypoints: np.ndarray
    area: float
    iscrowd: bool = False


@dataclasses.dataclass
class DetectionKP:
    """One detected person: keypoints[17, 3] (x, y, score), score."""

    keypoints: np.ndarray
    score: float


def compute_oks(
    dt_keypoints: np.ndarray, gt: GroundTruth
) -> float:
    """OKS between one detection and one GT (0 if GT has no labeled kps)."""
    v = gt.keypoints[:, 2]
    labeled = v > 0
    if not labeled.any():
        return 0.0
    dx = dt_keypoints[labeled, 0] - gt.keypoints[labeled, 0]
    dy = dt_keypoints[labeled, 1] - gt.keypoints[labeled, 1]
    k2 = (2.0 * OKS_SIGMAS[labeled]) ** 2
    s2 = max(gt.area, 1e-9)
    e = (dx**2 + dy**2) / (2.0 * s2 * k2)
    return float(np.mean(np.exp(-e)))


def _oks_matrix(
    dts: Sequence[DetectionKP], gts: Sequence[GroundTruth]
) -> np.ndarray:
    m = np.zeros((len(dts), len(gts)))
    for i, dt in enumerate(dts):
        for j, gt in enumerate(gts):
            m[i, j] = compute_oks(dt.keypoints, gt)
    return m


def _evaluate_image(
    dts: Sequence[DetectionKP],
    gts: Sequence[GroundTruth],
    area_range: tuple[float, float],
    max_dets: int,
):
    """Greedy OKS matching for one image over all thresholds.

    Returns (dt_scores[D], dt_matched[T, D], dt_ignore[T, D],
    num_gt_not_ignored). GTs are 'ignored' if crowd, unlabeled, or outside
    the area range; detections matched only to ignored GTs are excluded
    from scoring (pycocotools semantics).
    """
    order = np.argsort([-d.score for d in dts], kind="stable")[:max_dets]
    dts = [dts[i] for i in order]

    gt_ignore = np.array([
        g.iscrowd
        or not (g.keypoints[:, 2] > 0).any()
        or not (area_range[0] <= g.area < area_range[1])
        for g in gts
    ], dtype=bool)
    # Evaluate non-ignored GTs first in the greedy scan.
    gt_order = np.argsort(gt_ignore, kind="stable")
    gts = [gts[i] for i in gt_order]
    gt_ignore = gt_ignore[gt_order]

    oks = _oks_matrix(dts, gts)
    t_count = len(OKS_THRESHOLDS)
    d_count = len(dts)
    g_count = len(gts)
    dt_matched = np.zeros((t_count, d_count), dtype=bool)
    dt_ignore = np.zeros((t_count, d_count), dtype=bool)

    for ti, thr in enumerate(OKS_THRESHOLDS):
        gt_taken = np.zeros(g_count, dtype=bool)
        for di in range(d_count):
            best, best_oks = -1, float(thr)
            for gi in range(g_count):
                if gt_taken[gi] and not gts[gi].iscrowd:
                    continue
                # Once matched to a real GT, don't downgrade to ignored.
                if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                    break
                if oks[di, gi] >= best_oks:
                    best_oks = oks[di, gi]
                    best = gi
            if best == -1:
                continue
            gt_taken[best] = True
            dt_matched[ti, di] = True
            dt_ignore[ti, di] = gt_ignore[best]

    dt_scores = np.array([d.score for d in dts])
    num_gt = int((~gt_ignore).sum())
    return dt_scores, dt_matched, dt_ignore, num_gt


def _accumulate(per_image: list) -> tuple[np.ndarray, np.ndarray]:
    """Combine per-image match results → (precision[T, R], recall[T])."""
    t_count = len(OKS_THRESHOLDS)
    scores = np.concatenate([r[0] for r in per_image]) if per_image else (
        np.zeros(0)
    )
    matched = (
        np.concatenate([r[1] for r in per_image], axis=1)
        if per_image else np.zeros((t_count, 0), bool)
    )
    ignored = (
        np.concatenate([r[2] for r in per_image], axis=1)
        if per_image else np.zeros((t_count, 0), bool)
    )
    num_gt = sum(r[3] for r in per_image)

    precision = -np.ones((t_count, len(RECALL_THRESHOLDS)))
    recall = -np.ones(t_count)
    if num_gt == 0:
        return precision, recall

    order = np.argsort(-scores, kind="mergesort")
    matched = matched[:, order]
    ignored = ignored[:, order]

    for ti in range(t_count):
        keep = ~ignored[ti]
        tp = np.cumsum(matched[ti][keep] & ~ignored[ti][keep])
        fp = np.cumsum(~matched[ti][keep])
        if len(tp) == 0:
            recall[ti] = 0.0
            precision[ti] = 0.0
            continue
        rc = tp / num_gt
        pr = tp / np.maximum(tp + fp, 1e-12)
        recall[ti] = rc[-1]
        # Monotone-decreasing envelope, then 101-point interpolation.
        for i in range(len(pr) - 1, 0, -1):
            pr[i - 1] = max(pr[i - 1], pr[i])
        idx = np.searchsorted(rc, RECALL_THRESHOLDS, side="left")
        p = np.zeros(len(RECALL_THRESHOLDS))
        valid = idx < len(pr)
        p[valid] = pr[idx[valid]]
        precision[ti] = p
    return precision, recall


class KeypointEvaluator:
    """End-to-end OKS AP evaluation over a dataset.

    Usage:
        ev = KeypointEvaluator()
        ev.add_image(gts=[GroundTruth(...)], dts=[DetectionKP(...)])
        stats = ev.summarize()   # {"AP": ..., "AP50": ..., ...}
    """

    def __init__(self, max_dets: int = MAX_DETS):
        self.max_dets = max_dets
        self._images: list[tuple[list, list]] = []

    def add_image(
        self, gts: Sequence[GroundTruth], dts: Sequence[DetectionKP]
    ) -> None:
        self._images.append((list(gts), list(dts)))

    def summarize(self) -> dict[str, float]:
        stats: dict[str, float] = {}
        for area_name, rng in AREA_RANGES.items():
            per_image = [
                _evaluate_image(dts, gts, rng, self.max_dets)
                for gts, dts in self._images
            ]
            precision, recall = _accumulate(per_image)

            def mean_valid(x):
                x = x[x > -1]
                return float(x.mean()) if x.size else -1.0

            if area_name == "all":
                stats["AP"] = mean_valid(precision)
                stats["AP50"] = mean_valid(
                    precision[OKS_THRESHOLDS == 0.5]
                )
                stats["AP75"] = mean_valid(
                    precision[OKS_THRESHOLDS == 0.75]
                )
                stats["AR"] = mean_valid(recall)
                stats["AR50"] = mean_valid(recall[OKS_THRESHOLDS == 0.5])
            else:
                suffix = "M" if area_name == "medium" else "L"
                stats[f"AP{suffix}"] = mean_valid(precision)
                stats[f"AR{suffix}"] = mean_valid(recall)
        return stats
