"""On-device target generation tests (heatmaps, masks, anchor labels)."""

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.data import targets as T
from multiposenet_tpu.ops.boxes import decode as box_decode


def test_keypoint_heatmaps_peak_location_and_max_combine():
    kps = np.zeros((2, 17, 3), np.float32)
    # Person 0: keypoint 0 at image pixel (x=40, y=24) → heatmap (10, 6).
    kps[0, 0] = [40.0, 24.0, 2.0]
    # Person 1: same channel nearby — max-combine must keep both peaks.
    kps[1, 0] = [80.0, 24.0, 1.0]
    # Invisible keypoint must not render.
    kps[0, 1] = [20.0, 20.0, 0.0]
    hm = np.asarray(
        T.keypoint_heatmaps(jnp.asarray(kps), 32, 32, stride=4, sigma=1.5)
    )
    assert hm.shape == (32, 32, 17)
    assert hm[6, 10, 0] > 0.99
    assert hm[6, 20, 0] > 0.99
    assert hm[:, :, 1].max() == 0.0
    assert hm[:, :, 2].max() == 0.0


def test_loss_mask_zeroes_crowd():
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 0.0, 0.0]])
    flags = jnp.asarray([True, False])
    mask = np.asarray(T.loss_mask(boxes, flags, 16, 16, stride=4))
    assert mask.shape == (16, 16, 1)
    assert mask[3, 3, 0] == 0.0  # inside crowd box (8/4..24/4)
    assert mask[0, 0, 0] == 1.0  # outside
    assert mask[10, 10, 0] == 1.0


def test_segmentation_target_union():
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0], [32.0, 32.0, 63.0, 63.0]])
    flags = jnp.asarray([True, True])
    seg = np.asarray(T.segmentation_target(boxes, flags, 16, 16, stride=4))
    assert seg[2, 2, 0] == 1.0
    assert seg[10, 10, 0] == 1.0
    assert seg[6, 10, 0] == 0.0


def test_label_anchors_pos_neg_ignore_and_force_match():
    anchors = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],     # IoU 1.0 with gt0 → positive
        [0.0, 5.0, 10.0, 15.0],     # IoU 1/3 → negative (<0.4)
        [0.0, 2.0, 10.0, 12.0],     # IoU 8/12≈0.67 → positive
        [100.0, 100.0, 110.0, 110.0],  # IoU 0 → negative
    ])
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                      [102.0, 102.0, 111.0, 111.0],
                      [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.asarray([True, True, False])
    cls, box_t, _ = T.label_anchors(anchors, gt, valid)
    cls = np.asarray(cls)
    assert cls[0] == 1.0
    assert cls[2] == 1.0
    # Anchor 3 has IoU ~0.45 with gt1 → in [0.4, 0.5) would be ignore, but
    # it is gt1's best anchor → force-matched positive.
    assert cls[3] == 1.0
    assert cls[1] == 0.0
    # Regression target of anchor 0 must decode back to gt0.
    back = np.asarray(box_decode(box_t[None, 0], anchors[None, 0]))[0]
    np.testing.assert_allclose(back, [0, 0, 10, 10], atol=1e-4)
    # Force-matched anchor 3 regresses toward gt1.
    back3 = np.asarray(box_decode(box_t[None, 3], anchors[None, 3]))[0]
    np.testing.assert_allclose(back3, [102, 102, 111, 111], atol=1e-3)


def test_label_anchors_all_invalid_gt():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.zeros((2, 4))
    valid = jnp.asarray([False, False])
    cls, _, _ = T.label_anchors(anchors, gt, valid)
    assert np.asarray(cls)[0] == 0.0  # everything negative, nothing forced


def test_label_anchors_invalid_gt_cannot_clobber_anchor_zero():
    """Padded GTs all argmax to anchor 0; their scatter writes must not be
    able to drop a valid GT's force-match at anchor 0 (duplicate-index
    scatter order is unspecified)."""
    anchors = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],
        [100.0, 100.0, 110.0, 110.0],
    ])
    # Valid gt0's best anchor is anchor 0 at IoU ~0.45 (ignore band without
    # force-match); many invalid padded rows also argmax to anchor 0.
    gt = jnp.concatenate([
        jnp.asarray([[0.0, 2.0, 10.0, 13.0]]),
        jnp.zeros((6, 4)),
    ])
    valid = jnp.asarray([True] + [False] * 6)
    cls, box_t, _ = T.label_anchors(anchors, gt, valid)
    assert np.asarray(cls)[0] == 1.0  # force-match survived
    back = np.asarray(box_decode(box_t[None, 0], anchors[None, 0]))[0]
    np.testing.assert_allclose(back, [0, 2, 10, 13], atol=1e-3)
