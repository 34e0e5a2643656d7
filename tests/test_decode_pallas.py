"""Pallas decode kernel parity vs the jnp reference implementation.

SURVEY.md §4: "every Pallas kernel gets an interpret=True CPU test against
the jnp reference implementation on random inputs."
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multiposenet_tpu.config import DecodeConfig
from multiposenet_tpu.ops import decode as decode_jnp
from multiposenet_tpu.ops.decode_pallas import (
    decode_heatmaps_pallas,
    smoothing_matrix,
)


def test_smoothing_matrix_matches_conv():
    """Banded-matrix blur == separable conv blur (the MXU trick is exact)."""
    rng = np.random.RandomState(0)
    hm = rng.rand(1, 32, 128, 2).astype(np.float32)
    sigma, size = 1.0, 7
    want = np.asarray(decode_jnp.gaussian_smooth(jnp.asarray(hm), sigma, size))
    sh = smoothing_matrix(32, sigma, size)
    sw = smoothing_matrix(128, sigma, size)
    for c in range(2):
        got = sh @ hm[0, :, :, c] @ sw
        np.testing.assert_allclose(got, want[0, :, :, c], rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("shape", [
    (2, 64, 128, 3),
    # Full 17-channel square maps: same kernel code paths at a bigger
    # shape — slow tier (the small shape + planted peaks stay fast).
    pytest.param((1, 128, 128, 17), marks=pytest.mark.slow),
])
def test_pallas_decode_matches_jnp(shape):
    rng = np.random.RandomState(1)
    hm = rng.rand(*shape).astype(np.float32)
    cfg = DecodeConfig(max_peaks_per_channel=6, score_threshold=0.3)
    want = decode_jnp.decode_heatmaps(jnp.asarray(hm), cfg)
    got = decode_heatmaps_pallas(jnp.asarray(hm), cfg, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.scores)[v], np.asarray(want.scores)[v],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions)[v], np.asarray(want.positions)[v],
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_decode_planted_peaks():
    h = w = 128
    hm = np.zeros((1, h, w, 4), dtype=np.float32)
    centers = [(30, 40), (100, 17), (64, 64), (5, 120)]
    yy, xx = np.mgrid[0:h, 0:w]
    for c, (cy, cx) in enumerate(centers):
        hm[0, :, :, c] = np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0**2)
        )
    cfg = DecodeConfig(max_peaks_per_channel=3, score_threshold=0.05)
    got = decode_heatmaps_pallas(jnp.asarray(hm), cfg, interpret=True)
    pos = np.asarray(got.positions)[0]
    val = np.asarray(got.valid)[0]
    for c, (cy, cx) in enumerate(centers):
        assert val[c, 0]
        assert abs(pos[c, 0, 0] - cy) <= 0.5
        assert abs(pos[c, 0, 1] - cx) <= 0.5


def test_pallas_decode_rejects_bad_window():
    cfg = DecodeConfig(nms_window=5)
    with pytest.raises(ValueError, match="3x3"):
        decode_heatmaps_pallas(jnp.zeros((1, 8, 128, 1)), cfg,
                               interpret=True)


@pytest.mark.slow  # scalar phase-B parity; vector-path parity + planted peaks stay fast
def test_pallas_decode_scalar_phase_b_matches_jnp():
    """The maps-inner scalar phase-B fallback stays parity-exact (the
    shipping default is the batched all-vector phase B)."""
    import jax

    from multiposenet_tpu.ops import decode_pallas

    rng = np.random.RandomState(7)
    hm = rng.rand(1, 128, 128, 5).astype(np.float32)
    cfg = DecodeConfig(max_peaks_per_channel=6, score_threshold=0.3)
    want = decode_jnp.decode_heatmaps(jnp.asarray(hm), cfg)
    old = decode_pallas.BATCHED_PHASE_B
    jax.clear_caches()
    try:
        decode_pallas.BATCHED_PHASE_B = False
        got = decode_heatmaps_pallas(jnp.asarray(hm), cfg, interpret=True)
    finally:
        decode_pallas.BATCHED_PHASE_B = old
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.scores)[v], np.asarray(want.scores)[v],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions)[v], np.asarray(want.positions)[v],
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("shape", [
    (2, 64, 128, 3),
    (3, 32, 64, 5),   # non-multiple-of-block map count (padding path)
])
def test_lanes_decode_matches_jnp(shape):
    """Maps-on-lanes kernel (decode_pallas.DECODE_LANES) == jnp reference:
    same contract as the leading-axis kernel — scores/valid everywhere,
    positions of valid slots exact."""
    from multiposenet_tpu.ops.decode_pallas import (
        decode_heatmaps_pallas_lanes,
    )

    rng = np.random.RandomState(11)
    hm = rng.rand(*shape).astype(np.float32)
    cfg = DecodeConfig(max_peaks_per_channel=6, score_threshold=0.3)
    want = decode_jnp.decode_heatmaps(jnp.asarray(hm), cfg)
    hm_cm = jnp.transpose(jnp.asarray(hm), (0, 3, 1, 2))
    got = decode_heatmaps_pallas_lanes(
        hm_cm, (shape[0], shape[3]), cfg, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    v = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.scores)[v], np.asarray(want.scores)[v],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions)[v], np.asarray(want.positions)[v],
        rtol=1e-4, atol=1e-4,
    )


def test_lanes_decode_planted_peaks_bf16():
    """Planted Gaussian peaks survive the lanes kernel in the compute
    dtype the pipeline feeds it (bf16 maps, f32 smoothing)."""
    from multiposenet_tpu.ops.decode_pallas import (
        decode_heatmaps_pallas_lanes,
    )

    h = w = 64
    hm = np.zeros((1, h, w, 2), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for c, (cy, cx) in enumerate(((20.0, 31.0), (44.5, 12.0))):
        hm[0, :, :, c] = np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 2.0**2))
    cfg = DecodeConfig(max_peaks_per_channel=4, score_threshold=0.2)
    hm_cm = jnp.transpose(jnp.asarray(hm), (0, 3, 1, 2)).astype(jnp.bfloat16)
    got = decode_heatmaps_pallas_lanes(hm_cm, (1, 2), cfg, interpret=True)
    pos = np.asarray(got.positions)
    assert np.asarray(got.valid)[0, 0, 0] and np.asarray(got.valid)[0, 1, 0]
    np.testing.assert_allclose(pos[0, 0, 0], [20.0, 31.0], atol=0.6)
    np.testing.assert_allclose(pos[0, 1, 0], [44.5, 12.0], atol=0.6)
