"""Heatmap decoding: Gaussian smoothing → peak NMS → top-k → sub-pixel refine.

Reference counterpart: the host NumPy/SciPy decoder (`get_keypoints` /
`extract_peaks`, SURVEY.md §2 "Heatmap decoder" row and §3.4): per channel,
`scipy.ndimage.gaussian_filter` smoothing, local-maximum peak NMS via
`maximum_filter == value`, channelwise top-k with a score threshold, then a
¼-pixel sub-pixel shift toward the larger neighbor, and rescale to image
coordinates. BASELINE.json:8 makes batched decode a judged config.

This module is the *jnp reference implementation* — fully batched, fixed
shapes, jit-compatible — and doubles as the parity oracle for the fused
Pallas kernel in `multiposenet_tpu/ops/decode_pallas.py`.

Documented conventions (SURVEY.md §7 hard part 1 — the reference is
unrecoverable, so we pin these and test against them):
  * Gaussian smoothing uses a truncated normalized kernel with ZERO padding
    (SciPy's default is 'reflect'; zero-pad is the convention here because it
    is what a 'SAME' convolution gives and it only differs within
    kernel_size//2 pixels of the border).
  * Peak NMS keeps plateau ties (== comparison), like maximum_filter.
  * Sub-pixel refinement shifts ±0.25 px toward the larger neighbor along
    each axis independently, using border-clipped neighbor reads.
  * Image coordinates = heatmap coordinates * output_stride.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import DecodeConfig


class DecodedPeaks(NamedTuple):
    """Top-K peaks per keypoint channel.

    positions: [B, K, P, 2] — (y, x) in *heatmap* coordinates, sub-pixel.
    scores:    [B, K, P] — smoothed heatmap value at the peak.
    valid:     [B, K, P] bool — score above threshold and a real peak.
    """

    positions: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray


def gaussian_kernel_1d(sigma: float, size: int) -> np.ndarray:
    """Normalized 1-D Gaussian taps of odd length `size` (host constant)."""
    assert size % 2 == 1, "smoothing kernel size must be odd"
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-8)) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth(
    heatmaps: jnp.ndarray, sigma: float, kernel_size: int
) -> jnp.ndarray:
    """Separable depthwise Gaussian blur of [B, H, W, K], zero-padded.

    Two depthwise convolutions (kx1 then 1xk); XLA maps depthwise convs to
    the VPU and fuses the pair.
    """
    if sigma <= 0:
        return heatmaps
    k = heatmaps.shape[-1]
    taps = jnp.asarray(gaussian_kernel_1d(sigma, kernel_size))
    kern_h = jnp.tile(taps.reshape(kernel_size, 1, 1, 1), (1, 1, 1, k))
    kern_w = jnp.tile(taps.reshape(1, kernel_size, 1, 1), (1, 1, 1, k))
    dn = jax.lax.conv_dimension_numbers(
        heatmaps.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        heatmaps, kern_h, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=k,
    )
    x = jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=k,
    )
    return x


def peak_mask(smoothed: jnp.ndarray, window: int) -> jnp.ndarray:
    """Local-maximum mask: True where the value equals the window max.

    Equivalent of `scipy.ndimage.maximum_filter(x, window) == x` — plateau
    ties are kept. Uses a -inf-padded max reduce_window over H, W.
    """
    neg_inf = jnp.asarray(-jnp.inf, smoothed.dtype)
    maxed = jax.lax.reduce_window(
        smoothed,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return smoothed >= maxed


def subpixel_refine(
    smoothed: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    shift: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """¼-pixel shift toward the larger neighbor, border-clipped.

    smoothed: [B, H, W, K]; ys/xs: [B, K, P] integer peak indices.
    Returns float (y, x) refined positions, each [B, K, P].
    """
    b, h, w, k = smoothed.shape
    # [B, K, H, W] view for per-channel gathers.
    maps = jnp.transpose(smoothed, (0, 3, 1, 2))

    def gather(yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        flat = maps.reshape(b, k, h * w)
        idx = yy * w + xx  # [B, K, P]
        return jnp.take_along_axis(flat, idx, axis=-1)

    right = gather(ys, xs + 1)
    left = gather(ys, xs - 1)
    down = gather(ys + 1, xs)
    up = gather(ys - 1, xs)

    dx = jnp.sign(right - left) * shift
    dy = jnp.sign(down - up) * shift
    return ys.astype(jnp.float32) + dy, xs.astype(jnp.float32) + dx


def topk_2d(
    scores_map: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last two (spatial) dims of [..., H, W].

    Two-stage hierarchical top-k: per-row top-k over W, then top-k over the
    H*k survivors. Exact (every global top-k element is inside its row's
    top-k) and ~10x faster on TPU than one lax.top_k over H*W=16384 —
    sorting 128-length rows beats one giant sort.

    Returns (values[..., k], flat_indices[..., k]) with flat = y * W + x,
    matching jax.lax.top_k over the flattened map (tie order may differ
    only among equal values).
    """
    h, w = scores_map.shape[-2], scores_map.shape[-1]
    row_vals, row_idx = jax.lax.top_k(scores_map, k)     # [..., H, k]
    lead = scores_map.shape[:-2]
    flat_vals = row_vals.reshape(*lead, h * k)
    flat_cols = row_idx.reshape(*lead, h * k)
    vals, pos = jax.lax.top_k(flat_vals, k)              # [..., k]
    rows = pos // k
    cols = jnp.take_along_axis(flat_cols, pos, axis=-1)
    return vals, rows * w + cols


@functools.partial(jax.jit, static_argnames=("config",))
def decode_heatmaps(
    heatmaps: jnp.ndarray, config: DecodeConfig = DecodeConfig()
) -> DecodedPeaks:
    """Batched decode of [B, H, W, K] heatmaps → top-P peaks per channel.

    Fully fixed-shape: every channel always returns `max_peaks_per_channel`
    slots; invalid slots carry valid=False and score=-inf semantics handled
    by the caller via the mask.
    """
    heatmaps = heatmaps.astype(jnp.float32)
    b, h, w, k = heatmaps.shape
    p = config.max_peaks_per_channel

    smoothed = gaussian_smooth(
        heatmaps, config.smooth_sigma, config.smooth_kernel_size
    )
    peaks = peak_mask(smoothed, config.nms_window)

    neg_inf = jnp.asarray(-jnp.inf, smoothed.dtype)
    scores_map = jnp.where(peaks, smoothed, neg_inf)

    # Channelwise hierarchical top-k over the spatial dims.
    per_channel = jnp.transpose(scores_map, (0, 3, 1, 2))  # [B, K, H, W]
    top_scores, top_idx = topk_2d(per_channel, p)
    ys = top_idx // w
    xs = top_idx % w

    ref_y, ref_x = subpixel_refine(smoothed, ys, xs, config.subpixel_shift)
    valid = top_scores > config.score_threshold
    positions = jnp.stack([ref_y, ref_x], axis=-1)
    scores = jnp.where(valid, top_scores, 0.0)
    return DecodedPeaks(positions=positions, scores=scores, valid=valid)


def peaks_to_image_coords(
    peaks: DecodedPeaks, stride: int
) -> DecodedPeaks:
    """Scale heatmap-coordinate peaks to input-image coordinates."""
    return DecodedPeaks(
        positions=peaks.positions * float(stride),
        scores=peaks.scores,
        valid=peaks.valid,
    )
