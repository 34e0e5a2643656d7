"""Fused Pallas TPU kernel for heatmap decoding (judged config #2).

Reference counterpart: the host SciPy decoder (SURVEY.md §2 "Heatmap
decoder" row) — `gaussian_filter` → `maximum_filter` peak NMS → top-k →
sub-pixel refine. BASELINE.json's north star requires this to "run as Pallas
kernels on-device".

Kernel design (TPU-first, not a SciPy translation):
  * One grid program per (batch x channel) heatmap; the whole [H, W] map
    lives in VMEM (128x128 fp32 = 64 KiB — comfortably under the ~16 MiB
    budget).
  * Gaussian smoothing is expressed as two banded-matrix multiplies
    (S_h @ X @ S_w) instead of a sliding-window convolution — the banded
    matrices encode the zero-padded truncated Gaussian exactly, and the two
    128x128x128 matmuls run on the MXU at full tilt.
  * 3x3 peak NMS and the ±¼px sub-pixel offsets are computed from
    statically shifted copies of the smoothed map (concat of slices — pure
    VPU, fused in the same VMEM pass).
  * Outputs: the peak-suppressed score map plus dy/dx sub-pixel offset
    maps. Channelwise top-k stays in XLA (`jax.lax.top_k` is already
    optimal for [B, K, H*W]) and gathers the offsets.

Parity: `decode_heatmaps_pallas` must match `ops.decode.decode_heatmaps`
(the jnp reference, itself oracle-tested) — see tests/test_decode_pallas.py,
which runs the kernel in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiposenet_tpu.config import DecodeConfig
from multiposenet_tpu.ops.decode import DecodedPeaks, gaussian_kernel_1d


def smoothing_matrix(n: int, sigma: float, kernel_size: int) -> np.ndarray:
    """Banded [n, n] matrix equivalent to zero-padded 1-D Gaussian blur.

    (S @ v)[i] = sum_j taps[j - i + half] * v[j] — identical to the
    separable convolution in ops.decode.gaussian_smooth.
    """
    if sigma <= 0:
        return np.eye(n, dtype=np.float32)
    taps = gaussian_kernel_1d(sigma, kernel_size)
    half = kernel_size // 2
    s = np.zeros((n, n), dtype=np.float32)
    for d in range(-half, half + 1):
        diag = np.full(n - abs(d), taps[d + half], dtype=np.float32)
        s += np.diag(diag, k=d)
    return s


MAPS_PER_PROGRAM = 8  # amortizes per-program overhead and S_h/S_w loads


def _decode_kernel(x_ref, sh_ref, sw_ref, scores_ref, dy_ref, dx_ref):
    """[C, H, W] heatmaps → suppressed scores + sub-pixel sign maps.

    Processes MAPS_PER_PROGRAM channel maps per grid program (statically
    unrolled) so the smoothing matrices are loaded once per program and the
    per-program fixed cost is amortized. Sign maps are int8 in {-1, 0, 1}
    (the caller multiplies by the configured shift) — 4x less HBM write
    traffic than f32 offsets."""
    neg_inf = jnp.float32(-jnp.inf)
    sh = sh_ref[:]
    sw = sw_ref[:]
    for c in range(x_ref.shape[0]):
        x = x_ref[c]  # [H, W]

        # Gaussian smoothing on the MXU: S_h @ X @ S_w (S_w symmetric).
        sm = jnp.dot(sh, x, preferred_element_type=jnp.float32)
        sm = jnp.dot(sm, sw, preferred_element_type=jnp.float32)

        h, w = sm.shape
        inf_row = jnp.full((1, w), neg_inf)
        inf_col = jnp.full((h, 1), neg_inf)

        # 3x3 maximum filter with -inf borders, via two separable 3-maxes.
        up = jnp.concatenate([sm[1:], inf_row], axis=0)       # row i+1
        down = jnp.concatenate([inf_row, sm[:-1]], axis=0)    # row i-1
        vmax = jnp.maximum(sm, jnp.maximum(up, down))
        left = jnp.concatenate([vmax[:, 1:], inf_col], axis=1)   # col j+1
        right = jnp.concatenate([inf_col, vmax[:, :-1]], axis=1)  # col j-1
        m9 = jnp.maximum(vmax, jnp.maximum(left, right))
        is_peak = sm >= m9

        scores_ref[c] = jnp.where(is_peak, sm, neg_inf)

        # Sub-pixel shift direction toward the larger neighbor,
        # border-CLIPPED reads (matches ops.decode.subpixel_refine).
        right_n = jnp.concatenate([sm[:, 1:], sm[:, -1:]], axis=1)
        left_n = jnp.concatenate([sm[:, :1], sm[:, :-1]], axis=1)
        down_n = jnp.concatenate([sm[1:], sm[-1:]], axis=0)
        up_n = jnp.concatenate([sm[:1], sm[:-1]], axis=0)
        dx_ref[c] = jnp.sign(right_n - left_n).astype(jnp.int8)
        dy_ref[c] = jnp.sign(down_n - up_n).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("config", "interpret")
)
def decode_heatmaps_pallas(
    heatmaps: jnp.ndarray,
    config: DecodeConfig = DecodeConfig(),
    interpret: bool = False,
) -> DecodedPeaks:
    """Fused on-device decode of [B, H, W, K] heatmaps → DecodedPeaks.

    Drop-in replacement for ops.decode.decode_heatmaps. Requires
    nms_window == 3 (the reference's maximum_filter footprint); other
    windows fall back to the jnp path at the call site (see
    `decode_heatmaps_auto`).
    """
    if config.nms_window != 3:
        raise ValueError(
            "pallas decode kernel implements the reference 3x3 NMS window; "
            f"got nms_window={config.nms_window}"
        )
    heatmaps = heatmaps.astype(jnp.float32)
    b, h, w, k = heatmaps.shape
    p = config.max_peaks_per_channel

    x = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(b * k, h, w)
    sh = jnp.asarray(smoothing_matrix(h, config.smooth_sigma,
                                      config.smooth_kernel_size))
    sw = jnp.asarray(smoothing_matrix(w, config.smooth_sigma,
                                      config.smooth_kernel_size))

    # Pad the fused (batch*channel) dim to a multiple of MAPS_PER_PROGRAM.
    n_maps = b * k
    c_blk = MAPS_PER_PROGRAM
    n_pad = (-n_maps) % c_blk
    if n_pad:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad, h, w), x.dtype)], axis=0
        )
    map_spec = pl.BlockSpec(
        (c_blk, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mat_spec_h = pl.BlockSpec((h, h), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    mat_spec_w = pl.BlockSpec((w, w), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    total = n_maps + n_pad
    out_f32 = jax.ShapeDtypeStruct((total, h, w), jnp.float32)
    out_i8 = jax.ShapeDtypeStruct((total, h, w), jnp.int8)
    scores_map, dy_map, dx_map = pl.pallas_call(
        _decode_kernel,
        grid=(total // c_blk,),
        in_specs=[map_spec, mat_spec_h, mat_spec_w],
        out_specs=(map_spec, map_spec, map_spec),
        out_shape=(out_f32, out_i8, out_i8),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * (h * h * w + h * w * w),
            bytes_accessed=total * h * w * (4 + 4 + 1 + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, sh, sw)
    if n_pad:
        scores_map = scores_map[:n_maps]
        dy_map = dy_map[:n_maps]
        dx_map = dx_map[:n_maps]

    # Channelwise hierarchical top-k + offset gather in XLA.
    from multiposenet_tpu.ops.decode import topk_2d

    top_scores, top_idx = topk_2d(scores_map.reshape(b, k, h, w), p)
    ys = top_idx // w
    xs = top_idx % w
    shift = jnp.float32(config.subpixel_shift)
    dy = jnp.take_along_axis(
        dy_map.reshape(b, k, h * w), top_idx, axis=-1
    ).astype(jnp.float32) * shift
    dx = jnp.take_along_axis(
        dx_map.reshape(b, k, h * w), top_idx, axis=-1
    ).astype(jnp.float32) * shift
    positions = jnp.stack(
        [ys.astype(jnp.float32) + dy, xs.astype(jnp.float32) + dx], axis=-1
    )
    valid = top_scores > config.score_threshold
    scores = jnp.where(valid, top_scores, 0.0)
    return DecodedPeaks(positions=positions, scores=scores, valid=valid)
