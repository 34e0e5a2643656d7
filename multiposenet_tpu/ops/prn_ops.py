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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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
    [P, crop_height, crop_width, K]. Degenerate boxes produce all-zero
    gradients-safe crops (sizes clamped to ≥1e-3). `dtype` selects the
    einsum compute/output dtype — bfloat16 halves the HBM traffic of the
    [B, P, ch, cw, K] crop tensor and doubles MXU density; the bilinear
    weights are exact in bf16 only to ~3 decimal places, which is far below
    heatmap noise (f32 kept for parity tests by default).
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
    # crops[p, i, j, k] = sum_{y, x} ry[p, i, y] * hm[y, x, k] * rx[p, j, x]
    rows = jnp.einsum("piy,yxk->pixk", ry, heatmap)
    return jnp.einsum("pjx,pixk->pijk", rx, rows)

def batched_crop_heatmaps(
    heatmaps: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_height: int,
    crop_width: int,
    dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """vmap over images: heatmaps[B, H, W, K], boxes[B, P, 4] → [B, P, ...]."""
    return jax.vmap(
        lambda hm, bx: crop_heatmaps(hm, bx, crop_height, crop_width, dtype)
    )(heatmaps, boxes)

def keypoints_from_prn(
    prn_out: jnp.ndarray,
    crops: jnp.ndarray,
    boxes: jnp.ndarray,
) -> jnp.ndarray:
    """PRN output maps → per-person keypoints in heatmap coordinates.

    prn_out: [P, ch, cw, K] per-channel PRN maps — softmax OR raw logits
             (softmax is monotonic per channel, so the argmax is identical;
             the inference pipeline passes logits and skips the softmax).
    crops:   [P, ch, cw, K] the PRN *input* crops (scores read from here, as
             the reference reads peak scores off the predicted heatmap).
    boxes:   [P, 4] (y0, x0, y1, x1) heatmap coords.
    Returns keypoints[P, K, 3] rows of (x, y, score) — reference layout.
    """
    p, ch, cw, k = prn_out.shape
    # Reduce over the LAST axis (channels-last argmax over a 17-lane axis
    # is a strided mess on TPU; XLA fuses this transpose into the reduce).
    flat_t = prn_out.reshape(p, ch * cw, k).swapaxes(1, 2)  # [P, K, hw]
    idx = jnp.argmax(flat_t, axis=-1)  # [P, K]
    iy = (idx // cw).astype(jnp.float32)
    ix = (idx % cw).astype(jnp.float32)

    # Score = input heatmap value at the PRN-selected cell.
    score = jnp.take_along_axis(
        crops.reshape(p, ch * cw, k).swapaxes(1, 2), idx[..., None],
        axis=-1,
    )[..., 0]  # [P, K]

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

    keypoints:   [N, K, 3] rows (x, y, score) in heatmap coords.
    boxes:       [N, 4] (y0, x0, y1, x1) heatmap coords.
    peak_pos:    [N, K, P, 2] decoded (y, x) heatmap coords.
    peak_scores: [N, K, P]; peak_valid: [N, K, P] bool.
    Returns keypoints with snapped (x, y, score), same shape/dtype.
    """
    cx = keypoints[..., 0]  # [N, K]
    cy = keypoints[..., 1]
    d2 = (
        (peak_pos[..., 1] - cx[..., None]) ** 2
        + (peak_pos[..., 0] - cy[..., None]) ** 2
    )  # [N, K, P]
    d2 = jnp.where(peak_valid, d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)  # [N, K]
    best_d2 = jnp.take_along_axis(d2, j[..., None], axis=-1)[..., 0]

    # Snap radius: radius_cells crop-cell pitches of THIS box (per-axis
    # pitch, conservative max), at least half a heatmap pixel.
    bh = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    bw = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    pitch = jnp.maximum(bh / crop_height, bw / crop_width)
    radius = jnp.maximum(radius_cells * pitch, 0.5)[:, None]  # [N, 1]
    ok = jnp.isfinite(best_d2) & (best_d2 <= radius**2)

    px = jnp.take_along_axis(peak_pos[..., 1], j[..., None], -1)[..., 0]
    py = jnp.take_along_axis(peak_pos[..., 0], j[..., None], -1)[..., 0]
    ps = jnp.take_along_axis(peak_scores, j[..., None], -1)[..., 0]
    out_x = jnp.where(ok, px, cx)
    out_y = jnp.where(ok, py, cy)
    out_s = jnp.where(ok, ps.astype(keypoints.dtype), keypoints[..., 2])
    return jnp.stack([out_x, out_y, out_s], axis=-1)
