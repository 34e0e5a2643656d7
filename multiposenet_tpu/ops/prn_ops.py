"""PRN box-conditional crop-resize + keypoint readout (fixed shapes).

Reference counterpart: the per-person Python loop in inference — "crop
heatmaps inside box, bilinear resize to PRN grid ... per-channel spatial
softmax → argmax → keypoint" (SURVEY.md §3.4 device boundary #3; §2 "PRN"
row). BASELINE.json:10 stresses ≥8-person images.

TPU-first design: instead of per-box dynamic crops (gathers), the bilinear
crop-resize of each box is expressed as two small interpolation matrices
R_y[P, ch, H] and R_x[P, cw, W] (each row holds the two bilinear taps for
one output row/column of one box) applied as batched matmuls:

    crops[p] = R_y[p] @ heatmap @ R_x[p]^T        (per channel)

Everything is padded to a static MAX_PERSONS with a validity mask
(SURVEY.md §7 hard part 2), so a whole image's PRN pass is two einsums +
one Dense pair — pure MXU work, zero host sync, identical for 1 or 32
persons.

Crop layout: [P, crop_w, crop_h, K] — (col, row, channel), the NATURAL
output order of the two dot_generals (batch p, then lhs-free, then
rhs-free dims). The PRN path then makes exactly ONE materialized layout
change — [N, hw, K] → [N, K, hw] (to_channel_major) — so the MLP flat
order, the residual add, the per-channel argmax readout, and the score
gather all run on a K-major tensor whose MINOR axis is the 504-wide flat
crop grid (full lane density). Measured on v5e at bs=128 against FOUR
alternatives (forced row-major pijk crops: +2.3 ms of layout copies;
K-minor readouts: argmax over a 17- or 18-lane minor axis alone cost
12-19 ms; pkij-natural einsums via an xkpi intermediate: +1.4 ms;
round-5 crop_heatmaps_km — dot-native 'pkyj,piy->pkji' second einsum
with a contiguous flatten, CROP_KM_NATIVE below: +0.35 ms), this is
the fastest arrangement of the whole crop→MLP→readout pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Einsum contraction order for crop_heatmaps_cm: True = x-contraction
# first ([P, K, H, cw] intermediate, cw=18 — ~64% the bytes of the
# y-first [P, ch, K, W] one at the default crop grid). A/B flag; the
# winner measured on v5e ships as the default.
CROP_X_FIRST = True

# Score readout in keypoints_from_prn: True = one-hot select-and-reduce
# over the lane axis (dense VPU); False = take_along_axis (serialized
# dynamic-gather fusion, ~0.5 ms/iter at bs=128 — NOTES_r5.md profile).
# A/B flag; the winner measured on v5e ships as the default.
SCORE_ONEHOT = True

# Crop path in the inference pipeline: True = crop_heatmaps_km (second
# einsum emits [P, K, cw, ch] in dot_general's NATIVE dim order, so the
# [N, K, hw] flatten is a contiguous reshape); False = the
# crop_heatmaps_cm → to_channel_major pair (materializes the transposed
# write + reshape — 0.55 ms reshape.540 + 0.09 ms copy at bs=128 in the
# NOTES_r5 profile). A/B flag; the winner measured on v5e ships as the
# default. Both paths produce the same flat order (flat = j * ch + i).
CROP_KM_NATIVE = False

def expand_boxes(boxes: jnp.ndarray, margin: float) -> jnp.ndarray:
    """Expand (y0, x0, y1, x1) boxes by `margin` × side length per side.

    The reference crops exactly the detected box (SURVEY.md §3.4 "crop
    heatmaps inside box"); with imperfect detector boxes, keypoints near
    the box edge (wrists, ankles, top of head) fall outside the PRN's
    view and can never be selected. A small symmetric margin keeps them
    in view; the crop grid's inverse mapping (keypoints_from_prn) uses
    the same expanded box, so output coordinates stay exact. No clamping:
    interp_matrix border-clamps its bilinear taps, matching how the
    reference's crop saturates at heatmap borders.

    boxes [..., 4]; margin 0 is the identity.
    """
    if margin == 0.0:
        return boxes
    y0, x0, y1, x1 = (boxes[..., i] for i in range(4))
    dy = (y1 - y0) * margin
    dx = (x1 - x0) * margin
    return jnp.stack([y0 - dy, x0 - dx, y1 + dy, x1 + dx], axis=-1)


def interp_matrix(
    starts: jnp.ndarray,
    sizes: jnp.ndarray,
    out_size: int,
    in_size: int,
) -> jnp.ndarray:
    """Bilinear sampling matrices for P crops → [P, out_size, in_size].

    For crop p covering [starts[p], starts[p] + sizes[p]) along an axis of
    length in_size, output cell i samples the continuous coordinate
        c = start + (i + 0.5) * size / out_size - 0.5
    with border-clamped bilinear weights (half-pixel convention, matching
    jax.image.resize(method='linear') on the crop).
    """
    p = starts.shape[0]
    i = jnp.arange(out_size, dtype=jnp.float32)
    coords = (
        starts[:, None]
        + (i[None, :] + 0.5) * sizes[:, None] / out_size
        - 0.5
    )  # [P, out]
    lo = jnp.floor(coords)
    frac = coords - lo
    lo0 = jnp.clip(lo, 0, in_size - 1).astype(jnp.int32)
    lo1 = jnp.clip(lo + 1, 0, in_size - 1).astype(jnp.int32)

    grid = jnp.arange(in_size)[None, None, :]  # [1, 1, in]
    w0 = (grid == lo0[:, :, None]) * (1.0 - frac)[:, :, None]
    w1 = (grid == lo1[:, :, None]) * frac[:, :, None]
    return (w0 + w1).astype(jnp.float32)  # [P, out, in]

def crop_heatmaps(
    heatmap: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
    dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Bilinear crop-resize heatmap[H, W, K] inside boxes[P, 4] → crops.

    boxes are (y0, x0, y1, x1) in *heatmap* coordinates. Returns
    [P, crop_width, crop_height, K] (col, row, channel — see module
    docstring). Degenerate boxes produce all-zero gradients-safe crops
    (sizes clamped to ≥1e-3). `dtype` selects the einsum compute/output
    dtype — bfloat16 halves the HBM traffic of the crop tensor and doubles
    MXU density; the bilinear weights are exact in bf16 only to ~3 decimal
    places, which is far below heatmap noise (f32 kept for parity tests by
    default).
    """
    h, w, _ = heatmap.shape
    y0, x0, y1, x1 = (boxes[:, i] for i in range(4))
    ry = interp_matrix(
        y0, jnp.maximum(y1 - y0, 1e-3), crop_height, h
    )  # [P, ch, H]
    rx = interp_matrix(
        x0, jnp.maximum(x1 - x0, 1e-3), crop_width, w
    )  # [P, cw, W]
    if dtype is not None:
        ry = ry.astype(dtype)
        rx = rx.astype(dtype)
        heatmap = heatmap.astype(dtype)
    # crops[p, j, i, k] = sum_{y, x} ry[p, i, y] * hm[y, x, k] * rx[p, j, x]
    # Both einsums emit dot_general's native [batch, lhs-free, rhs-free]
    # dim order, so neither materializes a transpose.
    rows = jnp.einsum("piy,yxk->pixk", ry, heatmap)
    return jnp.einsum("pjx,pixk->pjik", rx, rows)

def batched_crop_heatmaps(
    heatmaps: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
    dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """vmap over images: heatmaps[B, H, W, K], boxes[B, P, 4] →
    [B, P, crop_w, crop_h, K]."""
    return jax.vmap(
        lambda hm, bx: crop_heatmaps(hm, bx, crop_height, crop_width, dtype)
    )(heatmaps, boxes)


def crop_heatmaps_cm(
    heatmap: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """crop_heatmaps consuming a CHANNEL-MAJOR heatmap[K, H, W] (already
    in the compute dtype) — same [P, crop_w, crop_h, K] output.

    The inference pipeline transposes the heatmaps to channel-major ONCE
    for the Pallas decode kernel (decode_heatmaps_pallas_t); reading the
    same tensor here lets XLA CSE that transpose instead of materializing
    a second layout for the crop einsums.
    """
    _, h, w = heatmap.shape
    y0, x0, y1, x1 = (boxes[:, i] for i in range(4))
    ry = interp_matrix(
        y0, jnp.maximum(y1 - y0, 1e-3), crop_height, h
    ).astype(heatmap.dtype)
    rx = interp_matrix(
        x0, jnp.maximum(x1 - x0, 1e-3), crop_width, w
    ).astype(heatmap.dtype)
    if CROP_X_FIRST:
        # x-contraction first: the [P, K, H, cw] intermediate (cw=18) is
        # ~64% the size of the y-first [P, ch, K, W] one (ch=28) at the
        # default crop grid — less HBM traffic between the two einsums.
        cols = jnp.einsum("pjx,kyx->pkyj", rx, heatmap)
        return jnp.einsum("piy,pkyj->pjik", ry, cols)
    rows = jnp.einsum("piy,kyx->pikx", ry, heatmap)
    return jnp.einsum("pjx,pikx->pjik", rx, rows)


def batched_crop_heatmaps_cm(
    heatmaps_cm: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """vmap over images: heatmaps[B, K, H, W] channel-major →
    [B, P, crop_w, crop_h, K]."""
    return jax.vmap(
        lambda hm, bx: crop_heatmaps_cm(hm, bx, crop_height, crop_width)
    )(heatmaps_cm, boxes)

def crop_heatmaps_km(
    heatmap: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """Channel-major heatmap[K, H, W] + boxes[P, 4] → crops [P, K, cw*ch]
    — the to_channel_major(crop_heatmaps_cm(...)) values in ONE step.

    Same x-first contraction as crop_heatmaps_cm, but the second einsum
    is written operand-order 'pkyj,piy->pkji' so its output IS
    dot_general's native [batch, lhs-free (k, j), rhs-free (i)] order —
    no transposed write — and the [P, K, cw*ch] flatten (flat = j*ch + i,
    the same column-major order as to_channel_major) collapses two
    already-adjacent minor dims: a free reshape instead of the
    materialized [N, hw, K]→[N, K, hw] swap (0.64 ms/iter at bs=128 —
    NOTES_r5 profile, reshape.540 + copy.242).
    """
    _, h, w = heatmap.shape
    y0, x0, y1, x1 = (boxes[:, i] for i in range(4))
    ry = interp_matrix(
        y0, jnp.maximum(y1 - y0, 1e-3), crop_height, h
    ).astype(heatmap.dtype)
    rx = interp_matrix(
        x0, jnp.maximum(x1 - x0, 1e-3), crop_width, w
    ).astype(heatmap.dtype)
    cols = jnp.einsum("pjx,kyx->pkyj", rx, heatmap)
    crops = jnp.einsum("pkyj,piy->pkji", cols, ry)  # native [P, K, cw, ch]
    return crops.reshape(crops.shape[0], crops.shape[1], -1)


def batched_crop_heatmaps_km(
    heatmaps_cm: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """vmap over images: heatmaps[B, K, H, W] channel-major →
    [B, P, K, cw*ch] (flat = j * ch + i)."""
    return jax.vmap(
        lambda hm, bx: crop_heatmaps_km(hm, bx, crop_height, crop_width)
    )(heatmaps_cm, boxes)


def to_channel_major(
    crops: jnp.ndarray, num_keypoints: int
) -> jnp.ndarray:
    """[..., cw, ch, K] crops → [N, K, cw*ch] — the ONE materialized
    layout change of the PRN path (see module docstring). The flat spatial
    index is column-major: flat = j * ch + i."""
    hw = crops.shape[-3] * crops.shape[-2]
    return crops.reshape(-1, hw, num_keypoints).swapaxes(1, 2)


def keypoints_from_prn(
    prn_out: jnp.ndarray,
    crops_km: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
) -> jnp.ndarray:
    """PRN output maps → per-person keypoints in heatmap coordinates.

    prn_out:  [P, K, hw] per-channel PRN maps (channel-major, hw
              column-major: flat = j * ch + i) — softmax OR raw logits
              (softmax is monotonic per channel so the argmax is identical;
              the inference pipeline passes logits and skips the softmax).
    crops_km: [P, K, hw] the PRN *input* crops in the same layout (scores
              read from here, as the reference reads peak scores off the
              predicted heatmap).
    boxes:    [P, 4] (y0, x0, y1, x1) heatmap coords.
    Returns keypoints[P, K, 3] rows of (x, y, score) — reference layout.

    Argmax and score gather both run over the 504-wide lane-minor flat
    axis — full lane density, no transposes.
    """
    ch, cw = crop_height, crop_width
    idx = jnp.argmax(prn_out, axis=-1)        # [P, K]
    iy = (idx % ch).astype(jnp.float32)
    ix = (idx // ch).astype(jnp.float32)

    # Score = input heatmap value at the PRN-selected cell. A
    # take_along_axis gather over the lane axis lowers to a serialized
    # dynamic-gather fusion (~0.5 ms/iter at bs=128, profile in
    # NOTES_r5.md); the one-hot select-and-reduce is exact (idx is a
    # single in-range index) and stays dense on the VPU lane axis.
    if SCORE_ONEHOT:
        lane = jax.lax.iota(jnp.int32, crops_km.shape[-1])
        onehot = lane == idx[..., None]       # [P, K, hw], one true/row
        score = jnp.sum(jnp.where(onehot, crops_km, 0), axis=-1)
    else:
        score = jnp.take_along_axis(
            crops_km, idx[..., None], axis=-1)[..., 0]

    # Map crop-grid cell centers back to heatmap coords (inverse of the
    # sampling in interp_matrix).
    y0, x0, y1, x1 = (boxes[:, i] for i in range(4))
    bh = jnp.maximum(y1 - y0, 1e-3)[:, None]
    bw = jnp.maximum(x1 - x0, 1e-3)[:, None]
    hy = y0[:, None] + (iy + 0.5) * bh / ch - 0.5
    hx = x0[:, None] + (ix + 0.5) * bw / cw - 0.5
    return jnp.stack([hx, hy, score], axis=-1)  # (x, y, score)


def snap_to_peaks(
    keypoints: jnp.ndarray,
    boxes: jnp.ndarray,
    peak_pos: jnp.ndarray,
    peak_scores: jnp.ndarray,
    peak_valid: jnp.ndarray,
    crop_height: int,
    crop_width: int,
    radius_cells: float = 1.0,
) -> jnp.ndarray:
    """Sub-pixel PRN keypoints: snap each PRN argmax cell center to the
    nearest decoded heatmap peak of that channel (SURVEY.md §3.4 "sub-pixel
    offset refine" feeding the final keypoints).

    The PRN readout quantizes to crop-grid cell centers (error up to
    box_size / crop_cells / 2 heatmap px); the decode kernel already
    produces ±quarter-pixel peak positions, so within a radius of
    `radius_cells` crop cells we adopt the peak's position and score —
    outside it (peak suppressed / below threshold) the cell center stands.

    Batched over the person dim D with the per-image peak set broadcast
    (not materialized per person), and the nearest peak selected with a
    min-reduce + first-occurrence one-hot instead of argmin + gathers —
    the gather lowering cost ~2.3 ms/iter at bs=128 on v5e.

    keypoints:   [B, D, K, 3] rows (x, y, score) in heatmap coords.
    boxes:       [B, D, 4] (y0, x0, y1, x1) heatmap coords.
    peak_pos:    [B, K, P, 2] decoded (y, x) heatmap coords.
    peak_scores: [B, K, P]; peak_valid: [B, K, P] bool.
    Returns keypoints with snapped (x, y, score), same shape/dtype.
    """
    cx = keypoints[..., 0]  # [B, D, K]
    cy = keypoints[..., 1]
    px_all = peak_pos[:, None, :, :, 1]  # [B, 1, K, P]
    py_all = peak_pos[:, None, :, :, 0]
    d2 = (
        (px_all - cx[..., None]) ** 2 + (py_all - cy[..., None]) ** 2
    )  # [B, D, K, P]
    d2 = jnp.where(peak_valid[:, None], d2, jnp.inf)
    best_d2 = jnp.min(d2, axis=-1, keepdims=True)  # [B, D, K, 1]
    eq = d2 == best_d2
    # First occurrence among ties — argmin's tie order.
    first = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=-1) == 1)

    # Snap radius: radius_cells crop-cell pitches of THIS box (per-axis
    # pitch, conservative max), at least half a heatmap pixel.
    bh = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-3)
    bw = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-3)
    pitch = jnp.maximum(bh / crop_height, bw / crop_width)
    radius = jnp.maximum(radius_cells * pitch, 0.5)[..., None]  # [B, D, 1]
    ok = jnp.isfinite(best_d2[..., 0]) & (best_d2[..., 0] <= radius**2)

    px = jnp.sum(jnp.where(first, px_all, 0.0), axis=-1)  # [B, D, K]
    py = jnp.sum(jnp.where(first, py_all, 0.0), axis=-1)
    ps = jnp.sum(jnp.where(first, peak_scores[:, None], 0.0), axis=-1)
    out_x = jnp.where(ok, px, cx)
    out_y = jnp.where(ok, py, cy)
    out_s = jnp.where(ok, ps.astype(keypoints.dtype), keypoints[..., 2])
    return jnp.stack([out_x, out_y, out_s], axis=-1)
