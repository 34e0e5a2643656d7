"""Pallas TPU kernel: 3x3 depthwise convolution (stride 1, SAME zero-pad).

Why: XLA lowers depthwise convolutions (feature_group_count == C) to a
kernel that sustains only ~70 GB/s on v5e (measured: 7.4 ms for a
[128, 128, 128, 128] bf16 map whose traffic is ~0.5 GB) — 10x below HBM
bandwidth. A depthwise 3x3 is just 9 shifted multiply-adds, i.e. pure
bandwidth-bound VPU work, so a Pallas kernel that streams row-strips
through VMEM runs close to memory speed. This is the hot op of the
MobileNet backbone (SURVEY.md §2 "Backbone" row: conv-dw 3x3 blocks).

Kernel structure: the grid tiles (batch, H-strips); each program gets its
strip plus two one-row halo blocks (the same array with row-offset index
maps — H is not a Mosaic-constrained dim, so strips keep W and C whole).
A fori_loop emits one output row per iteration from a 3-row window, so
per-iteration temporaries are [W, C]-sized and the scoped-VMEM stack stays
flat (a fully unrolled 9-shift version allocates block-sized temporaries
and overflows VMEM).

Scope: stride-1 only (the stride-2 blocks keep the XLA path — they touch
4x fewer output pixels), inference only (no custom VJP; training uses the
XLA path so autodiff works).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP_ROWS = 32


def use_pallas_depthwise(train: bool, folded: bool = False) -> bool:
    """Fast path gate.

    Measured on v5e (bs=128 512x512 pipeline): standalone the kernel beats
    XLA's depthwise lowering 1.5-1.8x (it is bandwidth-bound; XLA sustains
    ~70 GB/s), but IN-MODEL it regresses — 91 ms → 142 ms unfolded, and
    91 ms → 202 ms even with the bias+ReLU6 epilogue fused in-kernel
    (folded BN). The loss is not the epilogue fusion; XLA inserts layout
    conversions around every custom call between its internally-tiled conv
    layouts and the kernel's row-major NHWC. Strictly opt-in via
    MULTIPOSENET_PALLAS_DW=1 until the kernel speaks XLA's native tiling.
    """
    import os

    del folded
    if train or not os.environ.get("MULTIPOSENET_PALLAS_DW"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _dw_kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, out_ref, pad_ref,
               *, relu6: bool):
    """One H-strip: x[1, Hb, W, C] ⊛ w[3, 3, 1, C] → out[1, Hb, W, C].

    top_ref/bot_ref are [1, 1, W, C] halo rows (the row above/below the
    strip, zero-masked at the array borders); pad_ref is a [Hb+2, W, C]
    VMEM scratch holding the halo-padded strip. A 3-iteration fori_loop
    (one per kernel row dy) accumulates whole-strip shifted products, so
    temporaries stay strip-sized and are reused across iterations.
    """
    hb = x_ref.shape[1]
    w = x_ref.shape[2]
    c = x_ref.shape[3]
    h_idx = pl.program_id(1)
    n_h = pl.num_programs(1)

    pad_ref[0] = top_ref[0, 0] * jnp.where(
        h_idx > 0, 1.0, 0.0
    ).astype(top_ref.dtype)
    pad_ref[hb + 1] = bot_ref[0, 0] * jnp.where(
        h_idx < n_h - 1, 1.0, 0.0
    ).astype(bot_ref.dtype)
    pad_ref[pl.ds(1, hb)] = x_ref[0]

    zero_col = jnp.zeros((1, c), jnp.float32)

    def shift_w(row, dx):
        # row [W, C]; SAME zero padding along W.
        if dx == -1:
            return jnp.concatenate([zero_col, row[:-1]], axis=0)
        if dx == 1:
            return jnp.concatenate([row[1:], zero_col], axis=0)
        return row

    def body(y, carry):
        acc = jnp.zeros((w, c), jnp.float32)
        for dy in range(3):
            row = pad_ref[y + dy].astype(jnp.float32)  # [W, C]
            for dx in (-1, 0, 1):
                tap = w_ref[dy, dx + 1, 0].astype(jnp.float32)  # [C]
                acc = acc + shift_w(row, dx) * tap
        acc = acc + b_ref[0].astype(jnp.float32)  # folded BN bias (or 0)
        if relu6:
            acc = jnp.clip(acc, 0.0, 6.0)
        out_ref[0, y] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hb, body, 0)


@functools.partial(
    jax.jit, static_argnames=("relu6", "interpret")
)
def depthwise_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    relu6: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """NHWC depthwise 3x3, stride 1, SAME — parity with
    lax.conv_general_dilated(feature_group_count=C), with optional fused
    bias add + ReLU6 (the folded-BN inference epilogue — keeping it inside
    the kernel recovers the elementwise fusion XLA loses around custom
    calls).

    x: [B, H, W, C]; kernel: [3, 3, 1, C] (HWIO depthwise layout);
    bias: [C] or None.
    """
    b, h, w, c = x.shape
    assert kernel.shape == (3, 3, 1, c), kernel.shape
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    bias2d = bias.reshape(1, c)
    hb = min(_STRIP_ROWS, h)
    assert h % hb == 0, (h, hb)
    n_h = h // hb

    strip = pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    # Halo rows: H-block size 1 → the index map addresses single rows.
    top = pl.BlockSpec(
        (1, 1, w, c),
        lambda i, j: (i, jnp.maximum(j * hb - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    bot = pl.BlockSpec(
        (1, 1, w, c),
        lambda i, j: (i, jnp.minimum((j + 1) * hb, h - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, relu6=relu6),
        grid=(b, n_h),
        in_specs=[
            strip,
            top,
            bot,
            pl.BlockSpec((3, 3, 1, c), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((hb + 2, w, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=18 * b * h * w * c,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, kernel, bias2d)
