"""Tests: anchors, box coding, IoU, fixed-shape NMS, detection postprocess."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import DetectorConfig
from multiposenet_tpu.ops import boxes as box_ops
from multiposenet_tpu.ops.anchors import all_anchors, level_anchors
from multiposenet_tpu.ops.detection import postprocess_detections
from multiposenet_tpu.ops.nms import batched_nms, nms


def test_level_anchor_count_and_center():
    a = level_anchors(64, 3, num_scales=3, aspect_ratios=(0.5, 1.0, 2.0),
                      base_scale=4.0)
    assert a.shape == (8 * 8 * 9, 4)
    # First cell center at (4, 4); square anchor (ar=1.0, scale 0) is
    # 32x32 → (y0,x0,y1,x1) = (-12, -12, 20, 20).
    sq = a[3]  # anchors ordered scale-major, ar minor: idx 1 within scale 0
    centers = (a[:, :2] + a[:, 2:]) / 2
    np.testing.assert_allclose(centers[:9], 4.0, atol=1e-5)


def test_anchor_flattening_matches_levels():
    cfg = DetectorConfig()
    a = all_anchors(128, cfg)
    n = sum(
        int(np.ceil(128 / 2**l)) ** 2 * 9
        for l in range(cfg.min_level, cfg.max_level + 1)
    )
    assert a.shape == (n, 4)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.stack([
        rng.uniform(0, 50, 20), rng.uniform(0, 50, 20),
        rng.uniform(60, 120, 20), rng.uniform(60, 120, 20),
    ], axis=-1).astype(np.float32)
    gt = np.stack([
        rng.uniform(0, 40, 20), rng.uniform(0, 40, 20),
        rng.uniform(50, 128, 20), rng.uniform(50, 128, 20),
    ], axis=-1).astype(np.float32)
    deltas = box_ops.encode(jnp.asarray(gt), jnp.asarray(anchors))
    back = box_ops.decode(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_pairwise_iou_known_values():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],   # identical → 1
        [0.0, 5.0, 10.0, 15.0],   # half overlap → 50/150
        [20.0, 20.0, 30.0, 30.0],  # disjoint → 0
    ])
    iou = np.asarray(box_ops.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 50.0 / 150.0, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps_keeps_order():
    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 1.0, 11.0, 11.0],    # heavy overlap with #0, lower score
        [50.0, 50.0, 60.0, 60.0],  # disjoint
        [0.0, 0.0, 10.0, 10.0],    # duplicate of #0, lowest score
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    out_boxes, out_scores, valid = nms(boxes, scores, max_out=4,
                                       iou_threshold=0.5)
    # Selection order: 0 (0.9), then 2 (0.7); 1 and 3 are suppressed, so
    # only 2 valid outputs remain.
    assert valid.tolist() == [True, True, False, False]
    np.testing.assert_allclose(np.asarray(out_scores)[:2], [0.9, 0.7])
    np.testing.assert_allclose(np.asarray(out_boxes)[0],
                               [0.0, 0.0, 10.0, 10.0])
    np.testing.assert_allclose(np.asarray(out_boxes)[1],
                               [50.0, 50.0, 60.0, 60.0])


def test_nms_exhausted_slots_invalid():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [1.0, 1.0, 11.0, 11.0]])
    scores = jnp.asarray([0.9, 0.8])
    _, out_scores, valid = nms(boxes, scores, max_out=4, iou_threshold=0.5)
    assert valid.tolist()[0] is True or bool(valid[0])
    assert not bool(valid[1])  # suppressed by #0
    assert not bool(valid[2]) and not bool(valid[3])


def test_batched_nms_shapes():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(
        np.sort(rng.uniform(0, 100, (3, 50, 2, 2)), axis=-2).reshape(
            3, 50, 4
        )[:, :, [0, 2, 1, 3]].astype(np.float32)
    )
    scores = jnp.asarray(rng.rand(3, 50).astype(np.float32))
    ob, os_, v = batched_nms(boxes, scores, max_out=8)
    assert ob.shape == (3, 8, 4) and os_.shape == (3, 8) and v.shape == (3, 8)


def test_postprocess_detections_finds_planted_box():
    """Plant a confident logit at one anchor; postprocess must return a box
    near that anchor."""
    cfg = DetectorConfig(score_threshold=0.3, max_detections=8)
    image_size = 128
    a = cfg.num_scales * len(cfg.aspect_ratios)
    det_out = {}
    for level in range(cfg.min_level, cfg.max_level + 1):
        f = int(np.ceil(image_size / 2**level))
        det_out[f"P{level}"] = {
            "cls": jnp.full((1, f, f, a), -6.0),
            "box": jnp.zeros((1, f, f, a * 4)),
        }
    # Confident person at P3 cell (4, 4), anchor 1 (ar=1, scale 0 → 32x32).
    det_out["P3"]["cls"] = det_out["P3"]["cls"].at[0, 4, 4, 1].set(5.0)

    det = postprocess_detections(det_out, image_size, cfg)
    assert bool(det.valid[0, 0])
    assert int(det.valid[0].sum()) == 1
    box = np.asarray(det.boxes)[0, 0]
    center = [(box[0] + box[2]) / 2, (box[1] + box[3]) / 2]
    np.testing.assert_allclose(center, [36.0, 36.0], atol=1.0)
    np.testing.assert_allclose(box[2] - box[0], 32.0, atol=1.0)
    assert float(det.scores[0, 0]) > 0.9


def test_nms_box_voting():
    """vote_iou > 0: the winner becomes the score-weighted mean of its
    overlap cluster; disjoint boxes and vote_iou=0 are untouched."""
    boxes = jnp.asarray([
        [10.0, 10.0, 30.0, 30.0],   # cluster A winner (score 0.9)
        [12.0, 12.0, 32.0, 32.0],   # cluster A member (score 0.6)
        [80.0, 80.0, 100.0, 100.0], # disjoint box
    ])
    scores = jnp.asarray([0.9, 0.6, 0.7])
    # Plain NMS: winner box verbatim (selection order 0.9, 0.7).
    b0, s0, v0 = nms(boxes, scores, max_out=3, iou_threshold=0.5)
    np.testing.assert_allclose(np.asarray(b0)[0], boxes[0], atol=1e-5)
    # Voting: score-weighted average of boxes 0 and 1.
    b1, s1, v1 = nms(boxes, scores, max_out=3, iou_threshold=0.5,
                     vote_iou=0.5)
    want = (0.9 * np.asarray(boxes[0]) + 0.6 * np.asarray(boxes[1])) / 1.5
    got = np.asarray(b1)
    np.testing.assert_allclose(got[0], want, atol=1e-4)
    # The disjoint box (selected second, score 0.7) votes alone.
    np.testing.assert_allclose(got[1], np.asarray(boxes[2]), atol=1e-4)
    # Scores and validity identical to plain NMS.
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))


def test_soft_nms_keeps_overlaps_with_decayed_scores():
    """soft_sigma > 0: an overlapping box survives with its score decayed
    by exp(-IoU²/σ) instead of being killed; disjoint boxes are
    (numerically) untouched; sigma=0 reproduces hard NMS exactly."""
    from multiposenet_tpu.ops.boxes import pairwise_iou

    boxes = jnp.asarray([
        [10.0, 10.0, 30.0, 30.0],    # winner (score 0.9)
        [12.0, 12.0, 32.0, 32.0],    # heavy overlap (score 0.8)
        [80.0, 80.0, 100.0, 100.0],  # disjoint (score 0.7)
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])

    # Hard NMS at 0.5 kills box 1.
    bh, sh, vh = nms(boxes, scores, max_out=3, iou_threshold=0.5)
    assert np.asarray(vh).sum() == 2

    # Soft NMS keeps all three; box 1's score is decayed by its IoU
    # with box 0, the disjoint box is decayed by exp(-0²/σ) = 1.
    sigma = 0.5
    bs_, ss, vs = nms(boxes, scores, max_out=3, iou_threshold=0.5,
                      soft_sigma=sigma)
    assert np.asarray(vs).sum() == 3
    iou01 = float(pairwise_iou(boxes[:1], boxes[1:2])[0, 0])
    want1 = 0.8 * np.exp(-iou01 * iou01 / sigma)
    got = np.asarray(ss)
    np.testing.assert_allclose(got[0], 0.9, atol=1e-6)
    # Selection is by decayed score: 0.7 (undecayed) outranks box 1
    # iff its decayed score is lower — check both slots by value.
    np.testing.assert_allclose(sorted(got[1:], reverse=True),
                               sorted([0.7, want1], reverse=True),
                               atol=1e-5)
    # Decayed ranking orders the output slots.
    assert got[1] >= got[2]

    # sigma=0 is bit-identical to the hard path (same jitted fn family).
    b0, s0, v0 = nms(boxes, scores, max_out=3, iou_threshold=0.5,
                     soft_sigma=0.0)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(sh))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(vh))


def test_soft_nms_through_postprocess():
    """The config knob reaches the jitted postprocess: a crowd of
    mutually-overlapping high-score anchors yields more valid detections
    under soft-NMS than hard NMS, never fewer."""
    from multiposenet_tpu.config import DetectorConfig
    import dataclasses

    rng = np.random.RandomState(0)
    n, k = 64, 17
    base = DetectorConfig(score_threshold=0.05, max_detections=8,
                          pre_nms_top_k=64)
    # Raw head outputs for a 64² image at P3..P7 are awkward to hand-
    # build; drive batched_nms directly with a crowded candidate set
    # plus the config plumbing check via dataclasses.
    centers = rng.rand(8, 2) * 40 + 30
    boxes, scores = [], []
    for cy, cx in centers:
        for _ in range(4):
            jy, jx = rng.randn(2) * 2
            boxes.append([cy + jy - 12, cx + jx - 12,
                          cy + jy + 12, cx + jx + 12])
            scores.append(0.5 + rng.rand() * 0.4)
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    _, _, v_hard = nms(boxes, scores, max_out=16, iou_threshold=0.5)
    _, _, v_soft = nms(boxes, scores, max_out=16, iou_threshold=0.5,
                       soft_sigma=0.5)
    assert int(np.asarray(v_soft).sum()) >= int(np.asarray(v_hard).sum())
    # Config threading: the field exists and is hashable/static-safe.
    cfg = dataclasses.replace(base, soft_nms_sigma=0.5)
    assert cfg.soft_nms_sigma == 0.5
    hash(cfg)


def test_hard_fixpoint_matches_greedy():
    """_nms_hard_fixpoint == the greedy loop on randomized candidate sets
    (overlap chains, exact score ties, zero-score padding, degenerate
    boxes) — the HARD_FIXPOINT flag must be a pure perf knob."""
    from multiposenet_tpu.ops import nms as nms_mod

    rng = np.random.RandomState(0)
    for trial in range(8):
        n = 64
        yx = rng.uniform(0, 40, (n, 2)).astype(np.float32)
        hw = rng.uniform(2, 14, (n, 2)).astype(np.float32)
        boxes = np.concatenate([yx, yx + hw], -1)
        scores = rng.rand(n).astype(np.float32)
        scores[rng.rand(n) < 0.25] = 0.0          # below-threshold padding
        dup = rng.choice(n, 8, replace=False)
        scores[dup[4:]] = scores[dup[:4]]         # exact score ties
        boxes[dup[1]] = boxes[dup[0]]             # identical boxes
        boxes[dup[2], 2:] = boxes[dup[2], :2]     # degenerate (zero area)
        for max_out, thr in ((20, 0.5), (12, 0.3), (64, 0.7),
                             (80, 0.5)):  # max_out > n: padded slots
            want = nms_mod._nms_greedy(
                jnp.asarray(boxes), jnp.asarray(scores), max_out, thr)
            got = nms_mod._nms_hard_fixpoint(
                jnp.asarray(boxes), jnp.asarray(scores), max_out, thr)
            for w, g, name in zip(want, got, ("boxes", "scores", "valid")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-6,
                    err_msg=f"trial {trial} max_out {max_out} thr {thr} "
                            f"{name}")


def test_hard_fixpoint_batched_and_flag_dispatch():
    """batched_nms under HARD_FIXPOINT (vmapped while_loop) matches the
    greedy batched path; flag restored afterwards."""
    from multiposenet_tpu.ops import nms as nms_mod

    rng = np.random.RandomState(1)
    yx = rng.uniform(0, 30, (3, 32, 2)).astype(np.float32)
    hw = rng.uniform(2, 10, (3, 32, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([yx, yx + hw], -1))
    scores = jnp.asarray(rng.rand(3, 32).astype(np.float32))
    want = batched_nms(boxes, scores, 10, 0.5)
    flag0 = nms_mod.HARD_FIXPOINT
    nms_mod.HARD_FIXPOINT = True
    try:
        got = batched_nms(boxes, scores, 10, 0.5)
    finally:
        nms_mod.HARD_FIXPOINT = flag0
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)
