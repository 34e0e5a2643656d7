"""Fused Pallas TPU kernel for heatmap decoding (judged config #2).

Reference counterpart: the host SciPy decoder (SURVEY.md §2 "Heatmap
decoder" row) — `gaussian_filter` → `maximum_filter` peak NMS → top-k →
sub-pixel refine. BASELINE.json's north star requires this to "run as Pallas
kernels on-device".

Kernel design (TPU-first, not a SciPy translation):
  * One grid program per MAPS_PER_PROGRAM (batch x channel) heatmaps; each
    whole [H, W] map lives in VMEM (128x128 fp32 = 64 KiB — comfortably
    under the ~16 MiB budget).
  * Gaussian smoothing is expressed as two banded-matrix multiplies
    (S_h @ X @ S_w) instead of a sliding-window convolution — the banded
    matrices encode the zero-padded truncated Gaussian exactly, and the two
    128x128x128 matmuls run on the MXU at full tilt.
  * 3x3 peak NMS and the ±¼px sub-pixel offsets are computed from
    statically shifted copies of the smoothed map (concat of slices — pure
    VPU, fused in the same VMEM pass).
  * Top-K peak selection runs INSIDE the kernel as K rounds of masked
    argmax over the VMEM-resident map (min-flat-index tie break —
    `lax.top_k`'s stable order). Only [N, K] peak tuples ever leave the
    kernel; the previous design wrote full score/sign maps back to HBM and
    let XLA sort them, which cost ~8 ms/iter at bs=128 (two giant sorts +
    layout copies + gathers).

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


MAPS_PER_PROGRAM = 64  # in-model optimum, re-measured after every VMEM-pressure-changing model edit because the ordering keeps flipping. With the batched phase B + merged stride-4 upsample + x-first PRN crop (one process, bs=128): 64 -> 18.92 ms, 48 -> 19.03, 32 -> 19.18, 16 -> 20.5; scalar phase B at 16 measured 19.17 in the same process (the two phase-B forms are within noise in-model once the crop einsum order stopped masking them). History: post-cm17-head 16 -> 5242 img/s vs 32 -> 5136; pre-cm17 32 -> 4961 vs 16 -> 4924 (standalone kernel-only numbers prefer 32: 5.2 vs 5.9 ms).

# Phase-B form: True = all-vector batched selection over a [n_maps, P*W]
# candidate matrix (zero scalar reductions — lane-axis keepdims rounds,
# block writes); False = the round-3 maps-inner scalar rounds.
BATCHED_PHASE_B = True


def _decode_kernel(
    x_ref, sh_ref, sw_ref, scores_ref, ys_ref, xs_ref,
    *, n_peaks: int, shift: float, batched_phase_b: bool = True,
):
    """[C, H, W] heatmaps → top-`n_peaks` (score, sub-pixel y, x) per map.

    Processes MAPS_PER_PROGRAM channel maps per grid program (statically
    unrolled) so the smoothing matrices are loaded once per program and the
    per-program fixed cost is amortized.

    Selection is TWO-PHASE (the round-3 redesign; VERDICT r2 item 3):

      Phase A (fully vectorized, no scalar reductions): `n_peaks` rounds of
      per-COLUMN masked argmax over the [H, W] peak map — each round is a
      sublane (axis-0) max + masked min-row-index + one-hot row select, all
      [H, W]→[1, W] vector ops. Yields a compact candidate matrix of
      per-column top-P (score, row, packed-sub-pixel) triples, [P, W] each.
      Exact: any element of the global top-P is, within its own column,
      among that column's top-P under the same (value desc, flat-index asc)
      total order.

      Phase B (shipping form, BATCHED_PHASE_B=True): all maps' candidate
      rows are stacked into ONE [n_maps, P*W] matrix and the global top-P
      runs as `n_peaks` rounds of lane-axis (axis=1 keepdims) max +
      min-packed-key reductions — every op is a full-width vector op over
      all maps at once, zero scalar reductions, and each round appends one
      [n_maps, 1] column straight into the output blocks. The legacy
      maps-inner form (False; kept as a tested fallback) instead runs
      scalar max / min-flat-index rounds per [P, W] matrix — 128x less
      data per round than the round-2 kernel's full-map scalar rounds
      (which were stall-bound on serial scalar reductions, 2.9 µs/map; six
      variants tried and documented below), rounds maps-inner so one map's
      scalar-unit stalls overlap another's vector work. In-model the two
      forms measure within noise; the batched form ships for its simpler
      compile and zero scalar-unit dependence.

    Ties resolve to the smallest flat index in both phases, matching
    lax.top_k's stable descending order (and therefore ops.decode.topk_2d).
    Exhausted columns re-emit row-0 duplicates at -inf; phase B kills all
    duplicates of a flat index in one round and averages their (identical)
    sub-pixel codes, so candidate positions for slots with valid=False may
    differ from the jnp reference (which orders -inf fillers globally by
    flat index). Contract: scores/valid everywhere and positions of VALID
    slots are exact — tests/test_decode_pallas.py.

    Round-2 design notes (all measured on v5e, config-2 throughput, with
    the then-current full-map scalar selection): per-map 2-D ops with
    scalar reductions won (14.0k img/s) over VMEM-scratch dynamic row
    slicing (9.1k), one-hot-matmul row extraction (11.8k), per-map
    vector-register-only [1, 1] reductions (11.9k), and cross-map batched
    [C, H, W] rounds (8.2k — Mosaic handles the untiled leading dim
    poorly; 2-axis keepdims reduces crash its layout pass outright). A 2x
    row-fold before selection and lax.cond-gated early exit both measured
    perf-neutral and were dropped.
    """
    neg_inf = jnp.float32(-jnp.inf)
    sh = sh_ref[:]
    sw = sw_ref[:]
    h, w = sh.shape[0], sw.shape[0]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_pw = jax.lax.broadcasted_iota(jnp.int32, (n_peaks, w), 1)
    big = h * w * 16
    n_maps = x_ref.shape[0]
    cand_scores, cand_packed = [], []
    for c in range(n_maps):
        x = x_ref[c].astype(jnp.float32)  # [H, W]

        # Gaussian smoothing on the MXU: S_h @ X @ S_w (S_w symmetric).
        sm = jnp.dot(sh, x, preferred_element_type=jnp.float32)
        sm = jnp.dot(sm, sw, preferred_element_type=jnp.float32)

        inf_row = jnp.full((1, w), neg_inf)
        inf_col = jnp.full((h, 1), neg_inf)

        # 3x3 maximum filter with -inf borders, via two separable 3-maxes.
        up = jnp.concatenate([sm[1:], inf_row], axis=0)       # row i+1
        down = jnp.concatenate([inf_row, sm[:-1]], axis=0)    # row i-1
        vmax = jnp.maximum(sm, jnp.maximum(up, down))
        left = jnp.concatenate([vmax[:, 1:], inf_col], axis=1)   # col j+1
        right = jnp.concatenate([inf_col, vmax[:, :-1]], axis=1)  # col j-1
        m9 = jnp.maximum(vmax, jnp.maximum(left, right))
        masked = jnp.where(sm >= m9, sm, neg_inf)

        # Sub-pixel shifts toward the larger neighbor, border-CLIPPED
        # reads (matches ops.decode.subpixel_refine). The two sign codes
        # are packed into the low 4 bits of the per-element int key
        # rows*16 + (sign_y*4 + sign_x) + 5 ∈ [0, 16) — selection then
        # carries the sub-pixel code along with the row index for free
        # (no separate masked-sum extraction pass per round).
        right_n = jnp.concatenate([sm[:, 1:], sm[:, -1:]], axis=1)
        left_n = jnp.concatenate([sm[:, :1], sm[:, :-1]], axis=1)
        down_n = jnp.concatenate([sm[1:], sm[-1:]], axis=0)
        up_n = jnp.concatenate([sm[:1], sm[:-1]], axis=0)
        comb = (
            jnp.sign(down_n - up_n) * 4.0 + jnp.sign(right_n - left_n)
        ).astype(jnp.int32)
        pmap = row_i * 16 + (comb + 5)  # unique per row within a column

        # Phase A: per-column top-P candidates, all-vector rounds.
        ss, pp = [], []
        for _ in range(n_peaks):
            colmax = jnp.max(masked, axis=0, keepdims=True)      # [1, W]
            pk = jnp.min(
                jnp.where(masked == colmax, pmap, big),
                axis=0, keepdims=True,
            )                                                     # [1, W]
            # Re-pack to a GLOBAL key (flat*16 + code, flat = row*w +
            # col) so phase B's min-reduce implements lax.top_k's
            # min-flat tie order.
            pp.append((pk // 16) * (w * 16) + col_pw[:1] * 16 + pk % 16)
            ss.append(colmax)
            masked = jnp.where(pmap == pk, neg_inf, masked)
        if batched_phase_b:
            # Lane-major candidate row per map: [1, P*W].
            cand_scores.append(jnp.concatenate(ss, axis=1))
            cand_packed.append(jnp.concatenate(pp, axis=1))
        else:
            cand_scores.append(jnp.concatenate(ss, axis=0))       # [P, W]
            cand_packed.append(jnp.concatenate(pp, axis=0))

    if batched_phase_b:
        # Phase B, all maps at once with ZERO scalar reductions: the
        # [n_maps, P*W] candidate matrix is reduced along the lane axis
        # (keepdims), every select/update is a broadcast vector op, and
        # each round appends one [n_maps, 1] column directly into the
        # output blocks. (The maps-inner scalar form below was
        # stall-bound on 128 serial scalar reduce chains per program.)
        cand_s = jnp.concatenate(cand_scores, axis=0)
        cand_p = jnp.concatenate(cand_packed, axis=0)
        s_cols, y_cols, x_cols = [], [], []
        for _ in range(n_peaks):
            m = jnp.max(cand_s, axis=1, keepdims=True)        # [M, 1]
            pidx = jnp.min(
                jnp.where(cand_s == m, cand_p, big),
                axis=1, keepdims=True,
            )                                                  # [M, 1]
            cand_s = jnp.where(cand_p == pidx, neg_inf, cand_s)
            idx = pidx // 16
            cv = (pidx % 16 - 5).astype(jnp.float32)
            dy = jnp.round(cv * 0.25) * shift
            dx = (cv - jnp.round(cv * 0.25) * 4.0) * shift
            s_cols.append(m)
            y_cols.append((idx // w).astype(jnp.float32) + dy)
            x_cols.append((idx % w).astype(jnp.float32) + dx)
        scores_ref[:] = jnp.concatenate(s_cols, axis=1)
        ys_ref[:] = jnp.concatenate(y_cols, axis=1)
        xs_ref[:] = jnp.concatenate(x_cols, axis=1)
        return

    # Phase B (maps-inner scalar form): global top-P over the compact
    # [P, W] candidates — one vector register per reduce. Rounds OUTER,
    # maps INNER so one map's scalar-stall chain overlaps another's work.
    outs = [([], [], []) for _ in range(n_maps)]
    for _ in range(n_peaks):
        for c in range(n_maps):
            scores_c = cand_scores[c]
            m = jnp.max(scores_c)
            # Min global key among score ties — lax.top_k's stable order.
            pidx = jnp.min(jnp.where(scores_c == m, cand_packed[c], big))
            sel = cand_packed[c] == pidx
            idx = pidx // 16
            cv = (pidx % 16 - 5).astype(jnp.float32)
            dy = jnp.round(cv * 0.25) * shift
            dx = (cv - jnp.round(cv * 0.25) * 4.0) * shift

            outs[c][0].append(m)
            outs[c][1].append((idx // w).astype(jnp.float32) + dy)
            outs[c][2].append((idx % w).astype(jnp.float32) + dx)
            cand_scores[c] = jnp.where(sel, neg_inf, scores_c)
    for c in range(n_maps):
        scores_ref[c] = jnp.stack(outs[c][0])
        ys_ref[c] = jnp.stack(outs[c][1])
        xs_ref[c] = jnp.stack(outs[c][2])


def _decode_maps_pallas(
    x: jnp.ndarray, config: DecodeConfig, interpret: bool
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[N, H, W] maps (any float dtype) → (scores, ys, xs), each [N, P]."""
    n_maps, h, w = x.shape
    p = config.max_peaks_per_channel
    sh = jnp.asarray(smoothing_matrix(h, config.smooth_sigma,
                                      config.smooth_kernel_size))
    sw = jnp.asarray(smoothing_matrix(w, config.smooth_sigma,
                                      config.smooth_kernel_size))

    # Pad the fused (batch*channel) dim to a multiple of the program block.
    # MAPS_PER_PROGRAM was tuned on the bf16 in-model path; at f32 the same
    # block doubles the kernel's VMEM stack past Mosaic's 16 MiB scoped
    # limit (measured on real v5e: 19.98M OOM at 64 maps × 128² f32 —
    # judged config 2), so scale the block by itemsize. bf16 (itemsize 2)
    # keeps the tuned 64 — the headline program is unchanged.
    c_blk = max(8, MAPS_PER_PROGRAM * 2 // x.dtype.itemsize)
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
    out_spec = pl.BlockSpec((c_blk, p), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    total = n_maps + n_pad
    out_shape = jax.ShapeDtypeStruct((total, p), jnp.float32)
    kernel = functools.partial(
        _decode_kernel, n_peaks=p, shift=float(config.subpixel_shift),
        batched_phase_b=BATCHED_PHASE_B,
    )
    scores, ys, xs = pl.pallas_call(
        kernel,
        grid=(total // c_blk,),
        in_specs=[map_spec, mat_spec_h, mat_spec_w],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * (h * h * w + h * w * w),
            bytes_accessed=total * h * w * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, sh, sw)
    if n_pad:
        scores, ys, xs = scores[:n_maps], ys[:n_maps], xs[:n_maps]
    return scores, ys, xs


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
    windows fall back to the jnp path at the call site.
    """
    b, h, w, k = heatmaps.shape
    x = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(b * k, h, w)
    return decode_heatmaps_pallas_t(
        x, (b, k), config, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("bk", "config", "interpret")
)
def decode_heatmaps_pallas_t(
    maps: jnp.ndarray,
    bk: tuple[int, int],
    config: DecodeConfig = DecodeConfig(),
    interpret: bool = False,
) -> DecodedPeaks:
    """Decode channel-major maps [B*K, H, W] (the transpose is shared with
    the PRN crop path — see Predictor._batch_forward_impl)."""
    if config.nms_window != 3:
        raise ValueError(
            "pallas decode kernel implements the reference 3x3 NMS window; "
            f"got nms_window={config.nms_window}"
        )
    b, k = bk
    scores, ys, xs = _decode_maps_pallas(maps, config, interpret)
    p = config.max_peaks_per_channel
    scores = scores.reshape(b, k, p)
    positions = jnp.stack(
        [ys.reshape(b, k, p), xs.reshape(b, k, p)], axis=-1
    )
    valid = scores > config.score_threshold
    scores = jnp.where(valid, scores, 0.0)
    return DecodedPeaks(positions=positions, scores=scores, valid=valid)


# ---------------------------------------------------------------------- #
# Maps-on-LANES variant (round 5): consumes the keypoint head's native
# NCHW conv output as [H, W, K*B] — a pure layout VIEW ({0,1,3,2} NCHW
# physical bytes ARE [H][W][K][B] row-major), so the Pallas custom call
# needs no relayout copy (copy.226, 0.48 ms/iter at bs=128 — NOTES_r5
# profile). Each lane is one (channel, batch) map; selection reduces
# [H, W, M] → [1, 1, M] vectors with zero per-map unrolling (the leading-
# axis kernel above unrolls MAPS_PER_PROGRAM python-level map loops).
# A/B flag; the winner measured on v5e ships as the default.
# ---------------------------------------------------------------------- #

DECODE_LANES = False
MAPS_LANES_BLOCK = 128  # lane-axis maps per program (f32 working set
#                          ~8.4 MB/array at 128² — vmem_limit raised below)


def _decode_kernel_lanes(
    x_ref, sh_ref, scores_ref, ys_ref, xs_ref,
    *, n_peaks: int, shift: float, taps: tuple[float, ...],
):
    """[H, W, M] maps-on-lanes decode → (scores, ys, xs), each [P, M].

    Same math as _decode_kernel: banded-matrix H smoothing on the MXU,
    W smoothing as zero-padded shifted adds (identical truncated-Gaussian
    taps), 3x3 -inf-border peak NMS, packed sub-pixel codes, and P rounds
    of (value desc, flat-index asc) masked selection — but every reduction
    keeps the lane (map) axis, so all M maps select concurrently.
    """
    neg_inf = jnp.float32(-jnp.inf)
    h, w, m_blk = x_ref.shape
    xf = x_ref[:].astype(jnp.float32)
    sh = sh_ref[:]

    # H smoothing: S_h @ X with (W, M) merged — full-width MXU contraction.
    sm = jnp.dot(
        sh, xf.reshape(h, w * m_blk), preferred_element_type=jnp.float32
    ).reshape(h, w, m_blk)
    # W smoothing: zero-padded shifted adds along the sublane axis.
    half = len(taps) // 2
    acc = sm * jnp.float32(taps[half])
    for d in range(1, half + 1):
        z = jnp.zeros((h, d, m_blk), jnp.float32)
        acc = acc + jnp.float32(taps[half + d]) * jnp.concatenate(
            [sm[:, d:], z], axis=1)
        acc = acc + jnp.float32(taps[half - d]) * jnp.concatenate(
            [z, sm[:, :-d]], axis=1)
    sm = acc

    # 3x3 maximum filter with -inf borders (two separable 3-maxes).
    inf_row = jnp.full((1, w, m_blk), neg_inf)
    inf_col = jnp.full((h, 1, m_blk), neg_inf)
    up = jnp.concatenate([sm[1:], inf_row], axis=0)
    down = jnp.concatenate([inf_row, sm[:-1]], axis=0)
    vmax = jnp.maximum(sm, jnp.maximum(up, down))
    left = jnp.concatenate([vmax[:, 1:], inf_col], axis=1)
    right = jnp.concatenate([inf_col, vmax[:, :-1]], axis=1)
    m9 = jnp.maximum(vmax, jnp.maximum(left, right))
    masked = jnp.where(sm >= m9, sm, neg_inf)

    # Packed global key: (row*w + col)*16 + subpixel code — min-reduce
    # implements lax.top_k's (value desc, flat asc) tie order, carrying
    # the border-clipped sub-pixel signs for free.
    right_n = jnp.concatenate([sm[:, 1:], sm[:, -1:]], axis=1)
    left_n = jnp.concatenate([sm[:, :1], sm[:, :-1]], axis=1)
    down_n = jnp.concatenate([sm[1:], sm[-1:]], axis=0)
    up_n = jnp.concatenate([sm[:1], sm[:-1]], axis=0)
    comb = (
        jnp.sign(down_n - up_n) * 4.0 + jnp.sign(right_n - left_n)
    ).astype(jnp.int32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h, w, m_blk), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (h, w, m_blk), 1)
    key = (row_i * w + col_i) * 16 + comb + 5
    big = h * w * 16

    s_rows, y_rows, x_rows = [], [], []
    for _ in range(n_peaks):
        mx = jnp.max(
            jnp.max(masked, axis=0, keepdims=True), axis=1, keepdims=True
        )                                                    # [1, 1, M]
        kmin = jnp.min(
            jnp.min(
                jnp.where(masked == mx, key, big), axis=0, keepdims=True
            ),
            axis=1, keepdims=True,
        )                                                    # [1, 1, M]
        masked = jnp.where(key == kmin, neg_inf, masked)
        idx = kmin // 16
        cv = (kmin % 16 - 5).astype(jnp.float32)
        dy = jnp.round(cv * 0.25) * shift
        dx = (cv - jnp.round(cv * 0.25) * 4.0) * shift
        s_rows.append(mx[0])                                 # [1, M]
        y_rows.append((idx[0] // w).astype(jnp.float32) + dy[0])
        x_rows.append((idx[0] % w).astype(jnp.float32) + dx[0])
    scores_ref[:] = jnp.concatenate(s_rows, axis=0)          # [P, M]
    ys_ref[:] = jnp.concatenate(y_rows, axis=0)
    xs_ref[:] = jnp.concatenate(x_rows, axis=0)


@functools.partial(
    jax.jit, static_argnames=("bk", "config", "interpret")
)
def decode_heatmaps_pallas_lanes(
    hm_cm: jnp.ndarray,
    bk: tuple[int, int],
    config: DecodeConfig = DecodeConfig(),
    interpret: bool = False,
) -> DecodedPeaks:
    """Decode channel-major heatmaps [B, K, H, W] with maps on LANES.

    The [B,K,H,W] → [H,W,K*B] transpose+reshape is a pure layout view of
    the keypoint head's native NCHW conv output, so feeding this kernel
    costs zero HBM copies when XLA assigns the conv its preferred
    {0,1,3,2} layout (the leading-axis kernel's default-layout operand
    forces a full relayout copy instead).
    """
    if config.nms_window != 3:
        raise ValueError(
            "pallas decode kernel implements the reference 3x3 NMS window; "
            f"got nms_window={config.nms_window}"
        )
    b, k = bk
    _, _, h, w = hm_cm.shape
    m = k * b
    x = jnp.transpose(hm_cm, (2, 3, 1, 0)).reshape(h, w, m)
    m_blk = min(MAPS_LANES_BLOCK, max(8, m))
    pad = (-m) % m_blk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((h, w, pad), x.dtype)], axis=-1)
    total = m + pad
    p = config.max_peaks_per_channel
    sh = jnp.asarray(smoothing_matrix(h, config.smooth_sigma,
                                      config.smooth_kernel_size))
    if config.smooth_sigma > 0:
        taps = tuple(
            float(t) for t in gaussian_kernel_1d(
                config.smooth_sigma, config.smooth_kernel_size)
        )
    else:
        taps = (1.0,)
    out_shape = jax.ShapeDtypeStruct((p, total), jnp.float32)
    out_spec = pl.BlockSpec((p, m_blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _decode_kernel_lanes, n_peaks=p,
        shift=float(config.subpixel_shift), taps=taps,
    )
    scores, ys, xs = pl.pallas_call(
        kernel,
        grid=(total // m_blk,),
        in_specs=[
            pl.BlockSpec((h, w, m_blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * h * h * w
            + total * h * w * 2 * (len(taps) + 1),
            bytes_accessed=total * h * w * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, sh)
    # [P, K*B] → [B, K, P] (tiny tensors — 70 KB at bs=128).
    scores = scores[:, :m].reshape(p, k, b).transpose(2, 1, 0)
    ys = ys[:, :m].reshape(p, k, b).transpose(2, 1, 0)
    xs = xs[:, :m].reshape(p, k, b).transpose(2, 1, 0)
    positions = jnp.stack([ys, xs], axis=-1)
    valid = scores > config.score_threshold
    scores = jnp.where(valid, scores, 0.0)
    return DecodedPeaks(positions=positions, scores=scores, valid=valid)
