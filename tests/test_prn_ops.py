"""PRN crop-resize vs a naive per-box loop (SURVEY.md §4 'PRN crop-gather
vs naive loop') and keypoint readout round-trips."""

import numpy as np
import jax.numpy as jnp

from multiposenet_tpu.ops.prn_ops import (
    batched_crop_heatmaps,
    crop_heatmaps,
    expand_boxes,
    interp_matrix,
    keypoints_from_prn,
    to_channel_major,
)


def naive_crop(hm, box, ch, cw):
    """Direct bilinear sampling loop — the oracle."""
    h, w, k = hm.shape
    y0, x0, y1, x1 = box
    bh, bw = max(y1 - y0, 1e-3), max(x1 - x0, 1e-3)
    out = np.zeros((ch, cw, k))
    for i in range(ch):
        for j in range(cw):
            cy = y0 + (i + 0.5) * bh / ch - 0.5
            cx = x0 + (j + 0.5) * bw / cw - 0.5
            fy, fx = np.floor(cy), np.floor(cx)
            wy, wx = cy - fy, cx - fx
            y0i = int(np.clip(fy, 0, h - 1))
            y1i = int(np.clip(fy + 1, 0, h - 1))
            x0i = int(np.clip(fx, 0, w - 1))
            x1i = int(np.clip(fx + 1, 0, w - 1))
            out[i, j] = (
                hm[y0i, x0i] * (1 - wy) * (1 - wx)
                + hm[y0i, x1i] * (1 - wy) * wx
                + hm[y1i, x0i] * wy * (1 - wx)
                + hm[y1i, x1i] * wy * wx
            )
    return out


def test_interp_matrix_rows_sum_to_one():
    starts = jnp.asarray([0.0, 3.5, 10.0])
    sizes = jnp.asarray([8.0, 5.0, 2.0])
    m = interp_matrix(starts, sizes, 6, 32)
    np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, atol=1e-5)


def test_crop_matches_naive_loop():
    rng = np.random.RandomState(0)
    hm = rng.rand(32, 40, 3).astype(np.float32)
    boxes = np.asarray([
        [2.0, 3.0, 20.0, 30.0],
        [0.0, 0.0, 32.0, 40.0],     # full map
        [10.5, 7.25, 14.5, 12.75],  # fractional
        [-3.0, -2.0, 35.0, 18.0],   # exceeds borders (clamped reads)
    ], dtype=np.float32)
    got = crop_heatmaps(jnp.asarray(hm), jnp.asarray(boxes), 8, 6)
    for p in range(len(boxes)):
        # crop layout is (col, row, channel); oracle emits (row, col, ch).
        want = naive_crop(hm, boxes[p], 8, 6).transpose(1, 0, 2)
        np.testing.assert_allclose(np.asarray(got)[p], want, rtol=1e-4,
                                   atol=1e-5)


def test_batched_crop_shapes():
    rng = np.random.RandomState(1)
    hms = jnp.asarray(rng.rand(2, 16, 16, 17).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 8, (2, 5, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(8.0)
    crops = batched_crop_heatmaps(hms, boxes, 14, 9)
    assert crops.shape == (2, 5, 9, 14, 17)


def test_keypoints_from_prn_roundtrip():
    """A delta at crop cell (i, j) must map back to the heatmap coordinate
    that cell samples from."""
    ch, cw, k = 8, 6, 2
    box = jnp.asarray([[4.0, 6.0, 20.0, 18.0]])
    # Channel-major [N, K, hw], flat column-major: flat = j * ch + i.
    prn_out = np.zeros((1, k, ch * cw), dtype=np.float32)
    prn_out[0, 0, 3 * ch + 2] = 1.0   # (i=2, j=3)
    prn_out[0, 1, 1 * ch + 7] = 1.0   # (i=7, j=1)
    crops = np.full((1, k, ch * cw), 0.55, dtype=np.float32)
    kps = np.asarray(
        keypoints_from_prn(jnp.asarray(prn_out), jnp.asarray(crops), box,
                           ch, cw)
    )
    bh, bw = 16.0, 12.0
    # channel 0 → cell (2, 3): y = 4 + 2.5*16/8 - 0.5, x = 6 + 3.5*12/6 - 0.5
    np.testing.assert_allclose(kps[0, 0], [6 + 3.5 * bw / cw - 0.5,
                                           4 + 2.5 * bh / ch - 0.5, 0.55],
                               atol=1e-5)
    np.testing.assert_allclose(kps[0, 1, :2], [6 + 1.5 * bw / cw - 0.5,
                                               4 + 7.5 * bh / ch - 0.5],
                               atol=1e-5)


def test_expand_boxes():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    np.testing.assert_allclose(
        np.asarray(expand_boxes(boxes, 0.0)), np.asarray(boxes))
    got = np.asarray(expand_boxes(boxes, 0.1))
    # height 20 → ±2, width 40 → ±4.
    np.testing.assert_allclose(got, [[8.0, 16.0, 32.0, 64.0]], atol=1e-5)
    # Batched leading dims pass through.
    got2 = np.asarray(expand_boxes(jnp.tile(boxes, (2, 3, 1, 1)), 0.1))
    assert got2.shape == (2, 3, 1, 4)
    np.testing.assert_allclose(got2[1, 2], [[8.0, 16.0, 32.0, 64.0]],
                               atol=1e-5)


def test_crop_margin_brings_edge_peak_into_view():
    """A peak just OUTSIDE a tight box is invisible to the PRN crop at
    margin 0 but lands inside the expanded crop, and the inverse mapping
    reads its position back (outside the original box) within one cell
    pitch."""
    h, w, k = 32, 32, 1
    hm = np.zeros((h, w, k), dtype=np.float32)
    hm[13:16, 24:27] = 1.0               # blob centered at (y=14, x=25)
    box = np.asarray([[8.0, 10.0, 20.0, 24.0]])  # x1=24 < blob x≥24
    ch, cw = 8, 6

    for margin, visible in ((0.0, False), (0.15, True)):
        ebox = expand_boxes(jnp.asarray(box), margin)
        crops = crop_heatmaps(jnp.asarray(hm), ebox, ch, cw)  # [1,cw,ch,K]
        crops_km = to_channel_major(crops, k)                 # [1, K, hw]
        peak_val = float(np.asarray(crops_km).max())
        assert (peak_val > 0.5) == visible, (margin, peak_val)
        if visible:
            kps = np.asarray(keypoints_from_prn(
                crops_km, crops_km, ebox, ch, cw))
            cell_pitch = max(
                float(ebox[0, 2] - ebox[0, 0]) / ch,
                float(ebox[0, 3] - ebox[0, 1]) / cw,
            )
            assert abs(kps[0, 0, 0] - 25.0) <= cell_pitch
            assert abs(kps[0, 0, 1] - 14.0) <= cell_pitch
            assert kps[0, 0, 0] > 24.0  # outside the ORIGINAL box


def test_to_channel_major_roundtrip():
    """to_channel_major: [.., cw, ch, K] → [N, K, j*ch+i] flat order."""
    rng = np.random.RandomState(3)
    crops = rng.rand(2, 5, 6, 8, 17).astype(np.float32)  # [B,P,cw,ch,K]
    km = np.asarray(to_channel_major(jnp.asarray(crops), 17))
    assert km.shape == (10, 17, 48)
    flat = crops.reshape(10, 48, 17)
    for j in range(6):
        for i in range(8):
            np.testing.assert_array_equal(km[:, :, j * 8 + i],
                                          flat[:, j * 8 + i, :])


def test_crop_km_native_matches_cm_path():
    """crop_heatmaps_km == to_channel_major(crop_heatmaps_cm(...)): the
    dot_general-native second einsum (prn_ops.CROP_KM_NATIVE) must produce
    the exact same [P, K, hw] values and flat order (flat = j*ch + i) as
    the shipped crop_cm → to_channel_major pair."""
    from multiposenet_tpu.ops.prn_ops import (
        batched_crop_heatmaps_cm,
        batched_crop_heatmaps_km,
    )

    rng = np.random.RandomState(7)
    hms_cm = jnp.asarray(rng.rand(2, 17, 24, 20).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 10, (2, 4, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(10.0)

    want = to_channel_major(
        batched_crop_heatmaps_cm(hms_cm, boxes, 28, 18), 17
    )  # [B*P, K, hw]
    got = batched_crop_heatmaps_km(hms_cm, boxes, 28, 18)
    assert got.shape == (2, 4, 17, 28 * 18)
    np.testing.assert_allclose(
        np.asarray(got).reshape(8, 17, -1), np.asarray(want),
        rtol=1e-5, atol=1e-6,
    )
