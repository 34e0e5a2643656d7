"""Sub-pixel PRN readout: snap_to_peaks (ops/prn_ops).

API is batched: keypoints [B, D, K, 3], boxes [B, D, 4], peaks [B, K, P, ...]
(the per-image peak set broadcasts over the person dim D)."""

import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.ops.prn_ops import snap_to_peaks


def test_snap_adopts_nearby_peak_position_and_score():
    # One person, K=2 channels, 2 candidate peaks per channel.
    kps = jnp.asarray([[[[10.0, 10.0, 0.5], [30.0, 30.0, 0.4]]]])  # [1,1,2,3]
    boxes = jnp.asarray([[[0.0, 0.0, 56.0, 36.0]]])  # pitch = 1.0
    peak_pos = jnp.asarray([[
        [[10.4, 9.7], [50.0, 50.0]],   # ch0: near peak at (y=10.4, x=9.7)
        [[0.0, 0.0], [2.0, 2.0]],      # ch1: all far away
    ]])  # [1, 2, 2, 2] (y, x)
    peak_scores = jnp.asarray([[[0.9, 0.8], [0.7, 0.6]]])
    peak_valid = jnp.ones((1, 2, 2), bool)
    out = np.asarray(snap_to_peaks(
        kps, boxes, peak_pos, peak_scores, peak_valid, 56, 36,
        radius_cells=1.0,
    ))
    # ch0 snapped to the sub-pixel peak (x, y) = (9.7, 10.4), score 0.9.
    np.testing.assert_allclose(out[0, 0, 0], [9.7, 10.4, 0.9], atol=1e-6)
    # ch1 keeps the cell center (no peak within radius).
    np.testing.assert_allclose(out[0, 0, 1], [30.0, 30.0, 0.4], atol=1e-6)


def test_snap_ignores_invalid_peaks():
    kps = jnp.asarray([[[[10.0, 10.0, 0.5]]]])
    boxes = jnp.asarray([[[0.0, 0.0, 56.0, 36.0]]])
    peak_pos = jnp.asarray([[[[10.0, 10.0]]]])  # exact hit but invalid
    peak_scores = jnp.asarray([[[0.9]]])
    peak_valid = jnp.zeros((1, 1, 1), bool)
    out = np.asarray(snap_to_peaks(
        kps, boxes, peak_pos, peak_scores, peak_valid, 56, 36,
    ))
    np.testing.assert_allclose(out[0, 0, 0], [10.0, 10.0, 0.5], atol=1e-6)


def test_snap_radius_zero_cells_still_half_pixel():
    # Tiny box -> pitch small; radius floor is 0.5 heatmap px.
    kps = jnp.asarray([[[[10.0, 10.0, 0.5]]]])
    boxes = jnp.asarray([[[9.0, 9.0, 11.0, 11.0]]])
    peak_pos = jnp.asarray([[[[10.3, 10.3]]]])  # dist ~0.42 < 0.5
    peak_scores = jnp.asarray([[[0.9]]])
    peak_valid = jnp.ones((1, 1, 1), bool)
    out = np.asarray(snap_to_peaks(
        kps, boxes, peak_pos, peak_scores, peak_valid, 56, 36,
        radius_cells=1.0,
    ))
    np.testing.assert_allclose(out[0, 0, 0], [10.3, 10.3, 0.9], atol=1e-6)
