"""Pose-level OKS NMS (ops/pose_nms.py): duplicate-skeleton dedup
semantics, slot-order greediness, and predictor plumbing."""

import pytest

import dataclasses

import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import (
    Config, DecodeConfig, DetectorConfig, ModelConfig, PRNConfig,
)
from multiposenet_tpu.ops.pose_nms import pose_nms


def _person(cx, cy, spread=10.0, seed=0):
    rng = np.random.RandomState(seed)
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = cx + rng.randn(17) * spread
    kp[:, 1] = cy + rng.randn(17) * spread
    kp[:, 2] = 0.9
    return kp


def test_pose_nms_kills_duplicate_keeps_distinct():
    """An exact-duplicate pose in a lower slot dies; a distinct person
    survives; the keeper itself always survives."""
    a = _person(50, 50, seed=1)
    b = _person(200, 60, seed=2)
    kps = jnp.asarray(np.stack([a, a, b])[None])          # [1, 3, 17, 3]
    boxes = jnp.asarray(np.array([
        [20.0, 20.0, 80.0, 80.0],
        [22.0, 18.0, 82.0, 78.0],
        [30.0, 170.0, 90.0, 230.0],
    ])[None])
    valid = jnp.asarray(np.array([[True, True, True]]))
    keep = np.asarray(pose_nms(kps, boxes, valid, 0.9))
    np.testing.assert_array_equal(keep[0], [True, False, True])


def test_pose_nms_respects_existing_invalid_and_chains():
    """An already-invalid slot neither suppresses nor resurrects; a
    suppressed slot cannot suppress later slots (greedy chain)."""
    a = _person(50, 50, seed=3)
    # Slot 1 duplicates slot 0; slot 2 duplicates slot 1 (= slot 0).
    kps = jnp.asarray(np.stack([a, a, a])[None])
    boxes = jnp.asarray(np.tile(np.array([20.0, 20.0, 80.0, 80.0]),
                                (1, 3, 1)))
    # Slot 0 invalid: slot 1 becomes the keeper and kills slot 2.
    valid = jnp.asarray(np.array([[False, True, True]]))
    keep = np.asarray(pose_nms(kps, boxes, valid, 0.9))
    np.testing.assert_array_equal(keep[0], [False, True, False])


def test_pose_nms_scale_is_keeper_area():
    """The OKS scale is the keeper's box area: the same pixel offset is
    a duplicate for a LARGE person but a distinct pose for a SMALL one."""
    a = _person(100, 100, spread=0.0)
    b = a.copy()
    b[:, 0] += 8.0  # 8 px offset
    kps = jnp.asarray(np.stack([a, b])[None])
    big = jnp.asarray(np.array([[0.0, 0.0, 200.0, 200.0],
                                [0.0, 0.0, 200.0, 200.0]])[None])
    small = jnp.asarray(np.array([[90.0, 90.0, 110.0, 110.0],
                                  [90.0, 90.0, 110.0, 110.0]])[None])
    valid = jnp.asarray(np.array([[True, True]]))
    keep_big = np.asarray(pose_nms(kps, big, valid, 0.7))
    keep_small = np.asarray(pose_nms(kps, small, valid, 0.7))
    np.testing.assert_array_equal(keep_big[0], [True, False])
    np.testing.assert_array_equal(keep_small[0], [True, True])


@pytest.mark.slow  # predictor plumbing; pose-NMS op semantics tests stay fast
def test_pose_nms_through_predictor():
    """The config knob reaches the fused program; threshold 0 leaves the
    pipeline bit-identical to the knob-less path."""
    from multiposenet_tpu.infer.predictor import Predictor

    cfg = Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        ),
        detector=DetectorConfig(score_threshold=0.0, max_detections=8,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32),
        decode=DecodeConfig(max_peaks_per_channel=4),
    )
    img = np.random.RandomState(0).randint(0, 255, (128, 128, 3),
                                           dtype=np.uint8)
    base = Predictor(config=cfg, image_size=128)
    people0 = base.predict(img)

    cfg_on = cfg.replace(detector=dataclasses.replace(
        cfg.detector, pose_nms_oks=0.9, soft_nms_sigma=0.5))
    on = Predictor(config=cfg_on, variables=base.variables,
                   prn_variables=base.prn_variables, image_size=128)
    people1 = on.predict(img)
    # Dedup can only remove, never add or reorder survivors' scores.
    assert len(people1) <= 8
    scores0 = [p.score for p in people0]
    assert scores0 == sorted(scores0, reverse=True)
