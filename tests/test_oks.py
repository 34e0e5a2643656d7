"""OKS evaluator vs hand-computed cases (SURVEY.md §4: 'OKS scorer vs
hand-computed cases')."""

import numpy as np
import pytest

from multiposenet_tpu.eval.oks import (
    DetectionKP,
    GroundTruth,
    KeypointEvaluator,
    compute_oks,
)
from multiposenet_tpu.utils.constants import NUM_KEYPOINTS, OKS_SIGMAS


def kp(points):
    """points: {idx: (x, y, v)} → [17, 3] array."""
    a = np.zeros((NUM_KEYPOINTS, 3), np.float32)
    for i, (x, y, v) in points.items():
        a[i] = (x, y, v)
    return a


def test_compute_oks_exact_match_is_one():
    g = GroundTruth(keypoints=kp({0: (10, 10, 2), 5: (20, 30, 2)}),
                    area=100.0)
    assert compute_oks(g.keypoints, g) == pytest.approx(1.0)


def test_compute_oks_hand_computed_single_keypoint():
    # One labeled keypoint (nose, sigma=0.026), displaced by d, area s^2.
    d, area = 3.0, 100.0
    g = GroundTruth(keypoints=kp({0: (10.0, 10.0, 2)}), area=area)
    dt = kp({0: (10.0 + d, 10.0, 1)})
    k2 = (2 * OKS_SIGMAS[0]) ** 2
    want = np.exp(-(d**2) / (2 * area * k2))
    assert compute_oks(dt, g) == pytest.approx(want, rel=1e-6)


def test_compute_oks_averages_only_labeled():
    # Two labeled keypoints: one exact (OKS term 1), one far (term ~0).
    g = GroundTruth(
        keypoints=kp({0: (10, 10, 2), 1: (50, 50, 2)}), area=25.0
    )
    dt = kp({0: (10, 10, 1), 1: (500, 500, 1)})
    assert compute_oks(dt, g) == pytest.approx(0.5, abs=1e-3)


def test_compute_oks_unlabeled_gt_returns_zero():
    g = GroundTruth(keypoints=kp({}), area=10.0)
    assert compute_oks(kp({0: (1, 1, 1)}), g) == 0.0


def test_perfect_detection_gives_ap_one():
    ev = KeypointEvaluator()
    g = GroundTruth(
        keypoints=kp({i: (10.0 * i + 5, 20.0 * i + 3, 2)
                      for i in range(5)}),
        area=5000.0,
    )
    ev.add_image([g], [DetectionKP(keypoints=g.keypoints.copy(),
                                   score=0.9)])
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_missed_gt_halves_recall():
    ev = KeypointEvaluator()
    g1 = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    g2 = GroundTruth(keypoints=kp({0: (200, 200, 2)}), area=5000.0)
    ev.add_image([g1, g2], [DetectionKP(keypoints=g1.keypoints.copy(),
                                        score=0.9)])
    stats = ev.summarize()
    assert stats["AR"] == pytest.approx(0.5)
    # Precision is perfect up to recall 0.5, zero beyond → AP ≈ the
    # fraction of the 101 recall points ≤ 0.5 (51/101).
    assert stats["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_false_positive_lowers_ap():
    ev = KeypointEvaluator()
    g = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    # FP has HIGHER score than the TP → precision at the TP is 1/2.
    ev.add_image(
        [g],
        [
            DetectionKP(keypoints=kp({0: (500, 500, 1)}), score=0.95),
            DetectionKP(keypoints=g.keypoints.copy(), score=0.9),
        ],
    )
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(0.5, abs=1e-6)
    assert stats["AR"] == pytest.approx(1.0)


def test_crowd_gt_absorbs_detection_without_penalty():
    ev = KeypointEvaluator()
    real = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    crowd = GroundTruth(keypoints=kp({0: (100, 100, 2)}), area=5000.0,
                        iscrowd=True)
    ev.add_image(
        [real, crowd],
        [
            DetectionKP(keypoints=real.keypoints.copy(), score=0.9),
            # Matches only the crowd GT → ignored, not an FP.
            DetectionKP(keypoints=crowd.keypoints.copy(), score=0.8),
        ],
    )
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)


def test_area_ranges_partition():
    ev = KeypointEvaluator()
    med = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=50.0**2)
    lrg = GroundTruth(keypoints=kp({0: (300, 300, 2)}), area=200.0**2)
    ev.add_image(
        [med, lrg],
        [
            DetectionKP(keypoints=med.keypoints.copy(), score=0.9),
            DetectionKP(keypoints=lrg.keypoints.copy(), score=0.9),
        ],
    )
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["APM"] == pytest.approx(1.0)
    assert stats["APL"] == pytest.approx(1.0)


def test_no_detections_zero_ap():
    ev = KeypointEvaluator()
    g = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=100.0)
    ev.add_image([g], [])
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(0.0)
    assert stats["AR"] == pytest.approx(0.0)


def test_no_gts_returns_minus_one():
    ev = KeypointEvaluator()
    ev.add_image([], [DetectionKP(keypoints=kp({0: (1, 1, 1)}),
                                  score=0.5)])
    stats = ev.summarize()
    assert stats["AP"] == -1.0


def test_unmatched_detection_outside_area_range_is_ignored():
    """pycocotools ignores unmatched dts whose own area is outside the
    evaluated range; they must not deflate APM/APL as false positives."""
    ev = KeypointEvaluator()
    med = GroundTruth(keypoints=kp({0: (10, 10, 2), 1: (60, 60, 2)}),
                      area=50.0**2)
    # A large-extent detection far from the medium GT: unmatched, but its
    # keypoint-extent area (~300x300) is outside the medium range, so the
    # medium evaluation must ignore it entirely.
    big = DetectionKP(
        keypoints=kp({0: (500, 500, 1), 1: (800, 800, 1)}), score=0.95
    )
    ev.add_image(
        [med],
        [big, DetectionKP(keypoints=med.keypoints.copy(), score=0.9)],
    )
    stats = ev.summarize()
    assert stats["APM"] == pytest.approx(1.0)
    # In the "all" range it IS a false positive with the higher score.
    assert stats["AP"] == pytest.approx(0.5, abs=1e-6)


def test_keypointless_crowd_bbox_absorbs_detection():
    """COCO crowd regions usually have zero labeled keypoints; pycocotools
    still matches detections inside the (expanded) crowd bbox via the
    distance-outside-box OKS branch."""
    ev = KeypointEvaluator()
    real = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    crowd = GroundTruth(
        keypoints=kp({}), area=5000.0, iscrowd=True,
        bbox=np.array([90.0, 90.0, 40.0, 40.0], np.float32),
    )
    ev.add_image(
        [real, crowd],
        [
            DetectionKP(keypoints=real.keypoints.copy(), score=0.9),
            # All keypoints inside the crowd bbox → OKS 1 vs the crowd →
            # absorbed (ignored), not an FP.
            DetectionKP(keypoints=kp({i: (100.0 + i, 100.0, 1)
                                      for i in range(17)}), score=0.8),
        ],
    )
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)


def test_keypointless_crowd_without_bbox_scores_zero():
    crowd = GroundTruth(keypoints=kp({}), area=100.0, iscrowd=True)
    assert compute_oks(kp({0: (1, 1, 1)}), crowd) == 0.0


def test_all_crowd_image_contributes_no_gt():
    ev = KeypointEvaluator()
    crowd = GroundTruth(
        keypoints=kp({}), area=400.0, iscrowd=True,
        bbox=np.array([0.0, 0.0, 20.0, 20.0], np.float32),
    )
    ev.add_image([crowd], [DetectionKP(
        keypoints=kp({i: (10.0, 10.0, 1) for i in range(17)}), score=0.9
    )])
    # Also a normal image so num_gt > 0 overall.
    g = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    ev.add_image([g], [DetectionKP(keypoints=g.keypoints.copy(),
                                   score=0.8)])
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_more_than_max_dets_truncates_lowest_scores():
    ev = KeypointEvaluator(max_dets=2)
    g = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    dts = [
        DetectionKP(keypoints=kp({0: (500 + 10 * i, 500, 1)}),
                    score=0.9 - 0.1 * i)
        for i in range(4)
    ]
    # The real match has the LOWEST score → truncated away by maxDets=2.
    dts.append(DetectionKP(keypoints=g.keypoints.copy(), score=0.1))
    ev.add_image([g], dts)
    stats = ev.summarize()
    assert stats["AR"] == pytest.approx(0.0)


def test_detection_prefers_real_gt_over_higher_oks_ignored():
    """pycocotools: once a non-ignored GT qualifies (OKS >= thr), ignored
    GTs are not considered even at higher OKS."""
    ev = KeypointEvaluator()
    real = GroundTruth(keypoints=kp({0: (10.0, 10.0, 2)}), area=100.0)
    # Crowd GT exactly on the detection → OKS 1.0 but ignored.
    crowd = GroundTruth(keypoints=kp({0: (11.0, 10.0, 2)}), area=100.0,
                        iscrowd=True)
    dt = DetectionKP(keypoints=kp({0: (11.0, 10.0, 1)}), score=0.9)
    oks_real = compute_oks(dt.keypoints, real)
    ev.add_image([real, crowd], [dt])
    stats = ev.summarize()
    # Thresholds at or below oks_real match the REAL gt (TP); higher
    # thresholds fall through to the crowd (ignored, not FP).
    from multiposenet_tpu.eval.oks import OKS_THRESHOLDS
    n_tp = (OKS_THRESHOLDS <= oks_real).sum()
    assert stats["AR"] == pytest.approx(n_tp / len(OKS_THRESHOLDS))
    assert stats["AP"] == pytest.approx(n_tp / len(OKS_THRESHOLDS))


def test_score_ties_are_stable():
    """Equal-score detections keep insertion order (mergesort semantics) —
    the first-added TP outranks the tied FP."""
    ev = KeypointEvaluator()
    g = GroundTruth(keypoints=kp({0: (10, 10, 2)}), area=5000.0)
    ev.add_image(
        [g],
        [
            DetectionKP(keypoints=g.keypoints.copy(), score=0.5),
            DetectionKP(keypoints=kp({0: (900, 900, 1)}), score=0.5),
        ],
    )
    stats = ev.summarize()
    # TP first → precision 1 at recall 1; the tied FP comes after.
    assert stats["AP"] == pytest.approx(1.0)


def test_equal_oks_tie_takes_later_gt():
    """pycocotools' >= scan replaces on ties → the LAST tied GT wins."""
    from multiposenet_tpu.eval.oks import _evaluate_image

    g1 = GroundTruth(keypoints=kp({0: (10.0, 10.0, 2)}), area=100.0)
    g2 = GroundTruth(keypoints=kp({0: (10.0, 10.0, 2)}), area=100.0)
    dt = DetectionKP(keypoints=kp({0: (10.0, 10.0, 1)}), score=0.9)
    scores, matched, ignored, num_gt = _evaluate_image(
        [dt], [g1, g2], (0.0, float("inf")), 20
    )
    assert num_gt == 2
    assert matched.all() and not ignored.any()
