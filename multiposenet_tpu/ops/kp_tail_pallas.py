"""Fused stride-4 keypoint-head tail as one Pallas TPU kernel.

Reference counterpart: the tail of the keypoint subnet — upsample the
fused stride-8 context to stride 4, add the stride-4 lateral, and apply
the final 3x3 conv producing the 17-channel heatmap (SURVEY.md §2
"Keypoint subnet" row; the rebuild's channel-major output contract is
models/keypoint_head.py "heatmaps_cm").

What it fuses (and why — profiled at bs=128/512², NOTES_r3.md):

  XLA's lowering of this tail materializes (a) the 2x nearest-upsample
  broadcast of the stride-8 sum to stride 4 (~0.54 ms), (b) the 3x3
  64→17 conv itself (1.43 ms — its N=17 MXU roofline, floor argument in
  NOTES_r3.md), and (c) a relayout copy of the conv output (~0.48 ms):
  XLA runs the conv batch-minor because 17 channels make terrible lanes,
  then the Pallas decode kernel needs W-minor row-major blocks. This
  kernel computes upsample-add in VMEM, the conv as row-tiled im2col
  matmuls (K=576 — the same full-K form XLA uses, so the MXU work is at
  the same N=17 roofline), and writes the channel-major [17, H, W]
  layout directly — (a) and (c) never touch HBM.

Contract: `kp_tail_cm(l2, z8, kernel, bias)` ==
  transpose(conv3x3_SAME(l2 + nearest_upsample_2x(z8), kernel) + bias,
            NHWC→NCHW)
within bf16 accumulation tolerance (both sides accumulate in f32).
Parity: tests/test_kp_tail_pallas.py (interpret mode on CPU; TPU parity
via the predictor cross-path tests).

MEASURED DEAD END IN-MODEL (round 5 — stays default-OFF, don't
re-walk): after the Mosaic-compile fixes below, the kernel compiles and
runs on real v5e, beats the isolated XLA tail standalone (6.2 vs 7.4 ms
at bs=8, dispatch-dominated), but IN-MODEL the e2e pipeline measures
20.7 ms/iter vs 15.9 base at bs=128/512² (one-process abench,
/tmp/r5_abench_tail2.log, NOTES_r5.md). Cause: the custom call's
row-major operand_layout_constraints force relayout copies of l2/zw at
the kernel boundary (XLA holds them in its internally-tiled conv
layouts) and the caller-side W-doubling materializes [B,H/2,W,C] in
HBM — together they exceed the ~1 ms the fusion saves. Same failure
mode as the round-2 standalone depthwise kernel (NOTES_r3 dead ends).
Mosaic portability notes (the probe cycle that got it compiling at
all): 5-D nearest-upsample broadcast+reshape = unsupported shape cast;
sublane-axis interleave (stack+reshape) = unsupported shape cast; the
H doubling over the untiled leading axis DOES lower; the kernel needs
vmem_limit_bytes raised past the 16 MB scoped default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of stride-4 output computed per im2col matmul. 16 rows x W=128
# cols = 2048 patch rows per dot — big enough to stream the MXU, small
# enough that the [2048, 9C] patch tile stays ~2.25 MB in VMEM.
# Module-level so the perf sweep (benchmarks/ab/abench.py) can tune it in-process.
TILE_ROWS = 16

# Test hook: lets CPU wiring tests route the model through the kernel in
# interpret mode (the head otherwise uses the jnp path off-TPU).
FORCE_INTERPRET = False


def _tail_kernel(l2_ref, zw_ref, w_ref, b_ref, out_ref, *, tile_rows: int):
    """One image per program: [H, W, C] + [H/2, W, C] → [K, H, W]."""
    l2 = l2_ref[0]                      # [H, W, C]
    zw = zw_ref[0]                      # [H/2, W, C] (W already doubled)
    h, w, c = l2.shape
    k = out_ref.shape[1]
    h2 = zw.shape[0]

    # Nearest 2x upsample = replication (models/fpn.nearest_upsample_2x),
    # then the stride-4 lateral add — both VMEM-resident. Mosaic cannot
    # lower sublane-axis interleaves ("unsupported shape cast" on the
    # W doubling — r5 compile probes, NOTES_r5.md), so the caller feeds
    # the W-doubled context and the kernel only doubles H: a broadcast +
    # merge over the untiled leading axis, which lowers.
    up = jnp.broadcast_to(
        zw[:, None, :, :], (h2, 2, w, c)
    ).reshape(h, w, c)
    x = l2 + up                          # [H, W, C] compute dtype

    # SAME zero padding for the 3x3: one ring of zeros.
    zrow = jnp.zeros((1, w, c), x.dtype)
    xp = jnp.concatenate([zrow, x, zrow], axis=0)          # [H+2, W, C]
    zcol = jnp.zeros((h + 2, 1, c), x.dtype)
    xp = jnp.concatenate([zcol, xp, zcol], axis=1)         # [H+2, W+2, C]

    wmat = w_ref[:]                      # [9C, K] (dy, dx, c) row order
    bias = b_ref[:]                      # [1, K] f32

    for t in range(h // tile_rows):
        r0 = t * tile_rows
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(
                    xp[r0 + dy:r0 + dy + tile_rows, dx:dx + w, :]
                    .reshape(tile_rows * w, c)
                )
        patches = jnp.concatenate(taps, axis=1)    # [tile*W, 9C]
        acc = jnp.dot(
            patches, wmat, preferred_element_type=jnp.float32
        ) + bias                                    # [tile*W, K] f32
        out_ref[0, :, r0:r0 + tile_rows, :] = (
            acc.T.reshape(k, tile_rows, w).astype(out_ref.dtype)
        )


def kp_tail_cm(
    l2: jnp.ndarray,
    z8: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-4 tail: conv3x3(l2 + up2(z8), kernel) + bias, emitted
    channel-major.

    l2:     [B, H, W, C]   stride-4 lateral (FPN L2).
    z8:     [B, H/2, W/2, C] stride-8 fused context (P3raw + head sum).
    kernel: [3, 3, C, K] conv kernel (same dtype as l2 or f32).
    bias:   [K].
    Returns [B, K, H, W] in l2's dtype.
    """
    b, h, w, c = l2.shape
    k = kernel.shape[-1]
    if (h % TILE_ROWS or w % 2 or h != 2 * z8.shape[1]
            or w != 2 * z8.shape[2] or c != z8.shape[3]):
        raise ValueError(
            f"kp_tail_cm shape mismatch: l2 {l2.shape}, z8 {z8.shape}"
        )
    # (dy, dx, c)-ordered im2col weight matrix, matching the kernel's
    # tap concat order.
    wmat = kernel.reshape(9 * c, k).astype(l2.dtype)
    bias2 = bias.astype(jnp.float32).reshape(1, k)

    # W-axis nearest doubling stays in XLA (Mosaic rejects sublane-axis
    # interleaves — see _tail_kernel); the H doubling, add, conv, and
    # channel-major write fuse in the kernel.
    zw = jnp.repeat(z8, 2, axis=2)                  # [B, H/2, W, C]

    fn = pl.pallas_call(
        functools.partial(_tail_kernel, tile_rows=TILE_ROWS),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h // 2, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, h, w), l2.dtype),
        # ~19 MB/program at the in-model shapes (l2 + zw + up + padded x
        # + im2col patch tiles + input double-buffering) — above the
        # 16 MB scoped default, well under the chip's 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return fn(l2, zw, wmat, bias2)
