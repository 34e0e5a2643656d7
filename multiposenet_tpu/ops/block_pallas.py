"""Pallas TPU kernels: fused MobileNet blocks — depthwise 3x3 (stride 1,
SAME) + BN affine + ReLU6 + pointwise 1x1 matmul + BN affine + ReLU6, and a
whole-chain variant that keeps intermediate activations in VMEM.

Why one kernel per BLOCK instead of per op (round-1 lesson, README "dead
ends"): a standalone depthwise kernel beats XLA 1.5-1.8x in isolation but
regresses in-model because XLA inserts layout conversions between its
internally-tiled conv layouts and the custom call's row-major NHWC at every
kernel boundary. Fusing the whole block keeps ONE boundary per block, the
depthwise intermediate never leaves VMEM (the pointwise matmul is
bandwidth-limited on bf16), and consecutive fused blocks hand each other
plain NHWC with no conversion at all.

Depthwise structure: the 9-tap shifted-multiply accumulation runs over
row CHUNKS (a fori_loop whose per-iteration temporaries are
[rows_per_iter, W, C]-sized — fully unrolled versions stack block-sized
temporaries and overflow VMEM; single-row iterations starve the VPU on
small maps). The pointwise conv is one MXU matmul [rows*W, C] @ [C, Co]
with the second affine + ReLU6 as epilogue.

BatchNorm enters as a per-channel affine (a, b) = (gamma/sqrt(var+eps),
beta - mean*a) precomputed OUTSIDE the kernel — inference only; training
uses the XLA path so autodiff and batch-stat updates work.

Scope: stride-1 blocks with C % 128 == 0 (lane-aligned); the stride-2 and
narrow early blocks keep the XLA path (infer/fast_backbone.py routes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIP_ROWS = 32


def _rows_per_iter(w: int) -> int:
    """Depthwise row-chunk size: keep chunk temporaries ~[256, C] flat."""
    return max(1, min(8, 256 // w))


def _dw_affine_relu6(pad_ref, act_ref, wdw, a1, b1, h, w, c, act_offset):
    """pad_ref [h+2, W, C] (SAME-padded rows) → act_ref rows
    [act_offset : act_offset+h] = relu6(dw3x3 * a1 + b1), chunked."""
    rp = _rows_per_iter(w)
    assert h % rp == 0, (h, rp)
    zero_cols = jnp.zeros((rp, 1, c), jnp.float32)

    def shift_w(rows, dx):
        # rows [rp, W, C]; SAME zero padding along W (sublane shift).
        if dx == -1:
            return jnp.concatenate([zero_cols, rows[:, :-1]], axis=1)
        if dx == 1:
            return jnp.concatenate([rows[:, 1:], zero_cols], axis=1)
        return rows

    def body(t, carry):
        y0 = t * rp
        acc = jnp.zeros((rp, w, c), jnp.float32)
        for dy in range(3):
            rows = pad_ref[pl.ds(y0 + dy, rp)].astype(jnp.float32)
            for dx in (-1, 0, 1):
                acc = acc + shift_w(rows, dx) * wdw[dy, dx + 1]
        acc = jnp.clip(acc * a1 + b1, 0.0, 6.0)
        act_ref[pl.ds(act_offset + y0, rp)] = acc.astype(act_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h // rp, body, 0)


def _block_kernel(
    x_ref, top_ref, bot_ref, wdw_ref, a1_ref, b1_ref, wpw_ref, a2_ref,
    b2_ref, out_ref, pad_ref, act_ref,
):
    """One H-strip of one image through the whole block.

    x_ref [1, hb, W, C]; top/bot [1, 1, W, C] halo rows (zero-masked at the
    array borders); wdw [3, 3, 1, C]; a1/b1 [1, C]; wpw [C, Co]; a2/b2
    [1, Co]; out [1, hb, W, Co]. pad_ref [hb+2, W, C] and act_ref
    [hb, W, C] are VMEM scratch.
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

    _dw_affine_relu6(
        pad_ref, act_ref, wdw_ref[:, :, 0].astype(jnp.float32),
        a1_ref[0].astype(jnp.float32), b1_ref[0].astype(jnp.float32),
        hb, w, c, act_offset=0,
    )

    # Pointwise 1x1 as one MXU matmul over the strip.
    act = act_ref[:].reshape(hb * w, c)
    y = jnp.dot(act, wpw_ref[:], preferred_element_type=jnp.float32)
    y = jnp.clip(
        y * a2_ref[0].astype(jnp.float32) + b2_ref[0].astype(jnp.float32),
        0.0, 6.0,
    )
    out_ref[0] = y.reshape(hb, w, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dwsep_block(
    x: jnp.ndarray,
    dw_kernel: jnp.ndarray,
    a1: jnp.ndarray,
    b1: jnp.ndarray,
    pw_kernel: jnp.ndarray,
    a2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused depthwise-separable block, stride 1, SAME, H-strip grid.

    x [B, H, W, C]; dw_kernel [3, 3, 1, C] (HWIO depthwise); a1/b1 [C] BN1
    affine; pw_kernel [C, Co]; a2/b2 [Co] BN2 affine. Returns [B, H, W, Co]
    in x.dtype. Parity target: dw-conv → BN → ReLU6 → 1x1 conv → BN → ReLU6
    (tests/test_block_pallas.py).
    """
    b, h, w, c = x.shape
    co = pw_kernel.shape[-1]
    assert dw_kernel.shape == (3, 3, 1, c), dw_kernel.shape
    assert pw_kernel.shape == (c, co), pw_kernel.shape
    hb = min(_STRIP_ROWS, h)
    assert h % hb == 0, (h, hb)
    n_h = h // hb

    strip_in = pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    strip_out = pl.BlockSpec((1, hb, w, co), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
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

    def vec(n):
        return pl.BlockSpec((1, n), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _block_kernel,
        grid=(b, n_h),
        in_specs=[
            strip_in,
            top,
            bot,
            pl.BlockSpec((3, 3, 1, c), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
            vec(c),
            pl.BlockSpec((c, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(co),
            vec(co),
        ],
        out_specs=strip_out,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, w, c), x.dtype),
            pltpu.VMEM((hb, w, c), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c * (18 + 2 * co),
            bytes_accessed=(
                b * h * w * (c + co) * x.dtype.itemsize
                + c * co * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x, x, x, dw_kernel.astype(x.dtype),
        a1.reshape(1, c), b1.reshape(1, c),
        pw_kernel.astype(x.dtype),
        a2.reshape(1, co), b2.reshape(1, co),
    )


def _chain_kernel(
    x_ref, wdw_ref, a1_ref, b1_ref, wpw_ref, a2_ref, b2_ref, out_ref,
    pad_ref, act_ref, *maybe_ping, n_blocks: int,
):
    """A chain of n uniform C->C stride-1 blocks over whole [nb, H, W, C]
    feature maps of nb images — intermediate activations never leave VMEM.

    x_ref [nb, H, W, C]; wdw [n, 3, 3, C]; a1/b1 [n, C]; wpw [n, C, C];
    a2/b2 [n, C]; out [nb, H, W, C]. pad_ref [H+2, W, C] and act_ref
    [nb*H, W, C] are VMEM scratch; ping_ref (present only when n > 1)
    holds intermediate block outputs. Whole-H blocks mean the SAME zero
    padding rows are literal zeros — no halo plumbing.
    """
    nb, h, w, c = x_ref.shape
    ping_ref = maybe_ping[0] if maybe_ping else None
    zero_row = jnp.zeros((w, c), x_ref.dtype)

    for k in range(n_blocks):
        src = x_ref if k == 0 else ping_ref
        dst = out_ref if k == n_blocks - 1 else ping_ref
        wdw = wdw_ref[k].astype(jnp.float32)
        a1 = a1_ref[k].astype(jnp.float32)
        b1 = b1_ref[k].astype(jnp.float32)

        def img_body(i, carry, src=src, wdw=wdw, a1=a1, b1=b1):
            pad_ref[0] = zero_row
            pad_ref[h + 1] = zero_row
            pad_ref[pl.ds(1, h)] = src[i]
            _dw_affine_relu6(pad_ref, act_ref, wdw, a1, b1, h, w, c,
                             act_offset=i * h)
            return carry

        jax.lax.fori_loop(0, nb, img_body, 0)

        y = jnp.dot(
            act_ref[:].reshape(nb * h * w, c), wpw_ref[k],
            preferred_element_type=jnp.float32,
        )
        y = jnp.clip(
            y * a2_ref[k].astype(jnp.float32)
            + b2_ref[k].astype(jnp.float32),
            0.0, 6.0,
        )
        dst[:] = y.reshape(nb, h, w, c).astype(dst.dtype)


@functools.partial(jax.jit, static_argnames=("images_per_step",
                                              "interpret"))
def fused_dwsep_chain(
    x: jnp.ndarray,
    dw_kernels: jnp.ndarray,
    a1: jnp.ndarray,
    b1: jnp.ndarray,
    pw_kernels: jnp.ndarray,
    a2: jnp.ndarray,
    b2: jnp.ndarray,
    images_per_step: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chain of n fused stride-1 C->C blocks (e.g. MobileNet's five
    512-channel blocks) in one kernel: HBM traffic is one read + one write
    of the feature map for the WHOLE chain.

    x [B, H, W, C]; dw_kernels [n, 3, 3, C] (squeezed HWIO); a1/b1/a2/b2
    [n, C]; pw_kernels [n, C, C]. images_per_step batches several images
    per grid step to widen the matmul M dim on small spatial maps.
    """
    b, h, w, c = x.shape
    n = dw_kernels.shape[0]
    nb = images_per_step
    assert b % nb == 0, (b, nb)
    assert dw_kernels.shape == (n, 3, 3, c), dw_kernels.shape
    assert pw_kernels.shape == (n, c, c), pw_kernels.shape

    maps = pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((h + 2, w, c), x.dtype),
        pltpu.VMEM((nb * h, w, c), x.dtype),
    ]
    if n > 1:
        scratch.append(pltpu.VMEM((nb, h, w, c), x.dtype))

    return pl.pallas_call(
        functools.partial(_chain_kernel, n_blocks=n),
        grid=(b // nb,),
        in_specs=[
            maps,
            whole((n, 3, 3, c)),
            whole((n, c)),
            whole((n, c)),
            whole((n, c, c)),
            whole((n, c)),
            whole((n, c)),
        ],
        out_specs=maps,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=n * b * h * w * c * (18 + 2 * c),
            bytes_accessed=(
                2 * b * h * w * c * x.dtype.itemsize
                + n * c * c * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, dw_kernels.astype(x.dtype), a1, b1, pw_kernels.astype(x.dtype),
      a2, b2)
