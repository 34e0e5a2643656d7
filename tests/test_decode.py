"""Decode parity vs the NumPy oracle + planted-peak correctness.

SURVEY.md §4: "decode (peak/NMS/sub-pixel) vs a NumPy oracle implementing the
reference algorithm"; §7 build order stage 1 requires a synthetic Gaussian
blob whose decoded peak lands at the planted location.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import DecodeConfig
from multiposenet_tpu.ops import decode as decode_ops

from oracles import decode_oracle, peak_mask_oracle, smooth_oracle


def plant_gaussian(h, w, cy, cx, sigma=2.0, amp=1.0):
    yy, xx = np.mgrid[0:h, 0:w]
    return amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))


def test_gaussian_smooth_matches_oracle():
    rng = np.random.RandomState(0)
    hm = rng.rand(1, 16, 20, 3).astype(np.float32)
    out = decode_ops.gaussian_smooth(jnp.asarray(hm), 1.0, 7)
    for c in range(3):
        want = smooth_oracle(hm[0, :, :, c], 1.0, 7)
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :, c], want, rtol=1e-4, atol=1e-5
        )


def test_peak_mask_matches_oracle():
    rng = np.random.RandomState(1)
    sm = rng.rand(14, 18).astype(np.float32)
    got = decode_ops.peak_mask(jnp.asarray(sm)[None, :, :, None], 3)
    want = peak_mask_oracle(sm.astype(np.float64), 3)
    np.testing.assert_array_equal(np.asarray(got)[0, :, :, 0], want)


def test_decode_finds_planted_peaks():
    """A planted blob per channel must decode to its location (±0.5 px)."""
    h, w, k = 64, 64, 17
    rng = np.random.RandomState(2)
    hm = np.zeros((h, w, k), dtype=np.float32)
    centers = []
    for c in range(k):
        cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
        centers.append((cy, cx))
        hm[:, :, c] = plant_gaussian(h, w, cy, cx)
    cfg = DecodeConfig(max_peaks_per_channel=4, score_threshold=0.05)
    peaks = decode_ops.decode_heatmaps(jnp.asarray(hm)[None], cfg)
    pos = np.asarray(peaks.positions)[0]
    val = np.asarray(peaks.valid)[0]
    for c, (cy, cx) in enumerate(centers):
        assert val[c, 0], f"channel {c}: top peak below threshold"
        assert abs(pos[c, 0, 0] - cy) <= 0.5, (c, pos[c, 0], (cy, cx))
        assert abs(pos[c, 0, 1] - cx) <= 0.5, (c, pos[c, 0], (cy, cx))


def test_decode_matches_oracle_random():
    """Full-decode parity on random heatmaps (positions, scores, validity)."""
    rng = np.random.RandomState(3)
    h, w, k = 24, 28, 5
    hm = rng.rand(h, w, k).astype(np.float32)
    cfg = DecodeConfig(
        smooth_sigma=1.0,
        smooth_kernel_size=7,
        nms_window=3,
        max_peaks_per_channel=6,
        score_threshold=0.3,
    )
    got = decode_ops.decode_heatmaps(jnp.asarray(hm)[None], cfg)
    want_pos, want_scores, want_valid = decode_oracle(
        hm, cfg.smooth_sigma, cfg.smooth_kernel_size, cfg.nms_window,
        cfg.max_peaks_per_channel, cfg.score_threshold, cfg.subpixel_shift,
    )
    got_pos = np.asarray(got.positions)[0]
    got_scores = np.asarray(got.scores)[0]
    got_valid = np.asarray(got.valid)[0]

    np.testing.assert_array_equal(got_valid, want_valid)
    # Compare only valid slots (invalid slot ordering among -inf is
    # unspecified).
    np.testing.assert_allclose(
        got_scores[want_valid], want_scores[want_valid], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        got_pos[want_valid], want_pos[want_valid], rtol=1e-4, atol=1e-4
    )


def test_decode_no_peaks_above_threshold():
    hm = np.full((1, 16, 16, 2), 0.01, dtype=np.float32)
    cfg = DecodeConfig(score_threshold=0.5)
    peaks = decode_ops.decode_heatmaps(jnp.asarray(hm), cfg)
    assert not np.asarray(peaks.valid).any()
    np.testing.assert_array_equal(np.asarray(peaks.scores), 0.0)


def test_peaks_to_image_coords():
    hm = np.zeros((1, 32, 32, 1), dtype=np.float32)
    hm[0, 10, 12, 0] = 1.0
    cfg = DecodeConfig(
        smooth_sigma=0.0, max_peaks_per_channel=1, score_threshold=0.1
    )
    peaks = decode_ops.decode_heatmaps(jnp.asarray(hm), cfg)
    scaled = decode_ops.peaks_to_image_coords(peaks, 4)
    pos = np.asarray(scaled.positions)[0, 0, 0]
    # Isolated single-pixel peak: neighbors are all zero (ties), sign()=0 in
    # both axes → no sub-pixel shift; expect exactly (40, 48).
    np.testing.assert_allclose(pos, [40.0, 48.0])
