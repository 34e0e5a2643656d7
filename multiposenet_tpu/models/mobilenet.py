"""MobileNet-v1-style depthwise-separable backbone (flax, NHWC).

Reference counterpart: `detector/backbone.py` — "MobileNet depthwise-separable
backbone" (SURVEY.md §2 "Backbone" row; BASELINE.json north star). The
reference builds a TF1 graph of conv-dw 3x3 + conv-pw 1x1 blocks with BN and
ReLU6, strides to /32, exposing multi-scale features C2..C5.

TPU-first design notes:
  * NHWC layout throughout — XLA's preferred convolution layout on TPU; the
    1x1 pointwise convs lower to MXU matmuls over the channel axis.
  * Channel widths are multiples of 8 (and ≥128 at the deep levels), keeping
    lane tiling dense for both fp32 (8,128) and bf16 (16,128) tiles.
  * `compute_dtype` lets inference run the whole conv stack in bfloat16 while
    parameters stay float32 (params cast at use; XLA fuses the casts).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel counts like the standard MobileNet width multiplier."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 with the same param tree as nn.Conv(groups=C).

    Stays on XLA's lax.conv: a standalone Pallas depthwise kernel won
    1.5-1.8x in isolation but REGRESSED in-model (91 -> 142 ms/iter at
    bs=128) because XLA inserts layout conversions at every custom-call
    boundary, and a whole-block VMEM-resident fused chain also lost to
    XLA on the deep blocks (9.7 vs 6.4 ms isolated on the five 512-ch
    blocks). Both kernels were parity-tested, measured, and pruned in
    round 3 — full numbers in NOTES_r3.md "measured dead ends".
    """

    strides: tuple[int, int] = (1, 1)
    use_bias: bool = False   # True in the BN-folded inference flavor
    relu6: bool = False      # fused activation (BN-folded flavor only)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, c),
            jnp.float32,
        ).astype(self.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (c,), jnp.float32
            )
        x = x.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        x = jax.lax.conv_general_dilated(
            x, kernel, self.strides, "SAME", dimension_numbers=dn,
            feature_group_count=c,
        )
        if bias is not None:
            x = x + bias.astype(x.dtype)
        if self.relu6:
            x = jnp.clip(x, 0.0, jnp.asarray(6.0, x.dtype))
        return x


class _PointwiseConv(nn.Module):
    """1x1 conv as an explicit channel matmul, same param tree as nn.Conv.

    Measured on v5e (bf16, [128,128,128,128]): lax.conv for 1x1 kernels
    runs at 14 TFLOP/s while the equivalent dot_general hits 22 TFLOP/s —
    XLA picks a poor conv algorithm for narrow pointwise convs. Pure XLA
    (no custom call), so surrounding fusion is preserved.
    """

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, c,
                                                       self.features),
            jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        y = jnp.einsum("bhwc,co->bhwo", x, kernel[0, 0])
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


def space_to_depth_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, 4C]; channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Remap a [3, 3, C, O] stride-2 SAME stem kernel to the equivalent
    [2, 2, 4C, O] kernel over the 2x2 space-to-depth input.

    Output position (i, j) of the original conv taps x[2i+dy, 2j+dx] for
    dy, dx in {0, 1, 2} (SAME at stride 2 with kernel 3 pads only
    bottom/right). In s2d space that tap lives at cell (i + dy//2,
    j + dx//2), phase (dy%2, dx%2) — a 2x2 window. The remap is exact; the
    (dy%2==1, dx%2==1) quadrant of cell (+1, +1) is never touched and
    stays zero.
    """
    c, o = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((2, 2, 4 * c, o), kernel.dtype)
    for dy in range(3):
        for dx in range(3):
            gy, py = divmod(dy, 2)
            gx, px = divmod(dx, 2)
            out = out.at[gy, gx, (py * 2 + px) * c:(py * 2 + px + 1) * c
                         ].set(kernel[dy, dx])
    return out


def stem_kernel_to_s4(kernel: jnp.ndarray) -> jnp.ndarray:
    """Remap a [4, 4, C, O] stride-4 stem kernel to the [16C, O] matmul
    weight over DOUBLE space-to-depth input (s2d2x applied twice).

    Composed channel order: pixel (4i+dy, 4j+dx) lives at composed channel
    ((dy//2)*2 + dx//2)*4C' + ((dy%2)*2 + dx%2)*C + c where the outer s2d
    runs over the half-res cell grid (see space_to_depth_2x ordering).
    Non-overlapping taps → the conv IS a dense matmul (full MXU, no
    halos)."""
    c, o = kernel.shape[2], kernel.shape[3]
    rows = []
    order = []
    for py1 in (0, 1):
        for px1 in (0, 1):
            for py0 in (0, 1):
                for px0 in (0, 1):
                    order.append((2 * py1 + py0, 2 * px1 + px0))
    for dy, dx in order:
        rows.append(kernel[dy, dx])  # [C, O]
    return jnp.concatenate(rows, axis=0)  # [16C, O]


class _S4StemConv(nn.Module):
    """Stride-4 stem: a 4x4/s4 conv computed as ONE dense matmul over the
    double-s2d input — the round-3 `stem_stride=4` operating point
    (ModelConfig.stem_stride). At 512² this removes the whole 256² stage
    (stem output + block_0's depthwise/pointwise at 256² ≈ 24 MB/image of
    HBM traffic); C2 keeps its stride-4 resolution because block_1 drops
    its stride (see MobileNetV1). Param tree: kernel [4, 4, C, O] (+bias
    when folded), remapped at apply time — exact arithmetic, the 4x4/s4
    taps never overlap so SAME padding is a no-op on %4 == 0 inputs.

    fold_norm composes the (x/255 - mean)/std affine into the matmul
    exactly as _S2DStemConv does.
    """

    features: int
    use_bias: bool = False
    fold_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] <= 4:      # raw image
            c = x.shape[-1]
            x = space_to_depth_2x(space_to_depth_2x(x.astype(self.dtype)))
        elif x.shape[-1] <= 16:   # host-staged s2d2x cells
            c = x.shape[-1] // 4
            x = space_to_depth_2x(x.astype(self.dtype))
        else:                     # host-staged s4 cells (4x4, composed)
            c = x.shape[-1] // 16
            x = x.astype(self.dtype)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, c,
                                                       self.features),
            jnp.float32,
        )
        k = stem_kernel_to_s4(kernel)  # [16C, O]
        norm_bias = None
        if self.fold_norm:
            from multiposenet_tpu.utils.constants import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            a = jnp.tile(
                1.0 / (255.0 * jnp.asarray(IMAGENET_STD)), 16 * c // 3
            )
            b = jnp.tile(
                -jnp.asarray(IMAGENET_MEAN) / jnp.asarray(IMAGENET_STD),
                16 * c // 3,
            )
            norm_bias = jnp.einsum("co,c->o", k, b)
            k = k * a[:, None]
        k = k.astype(self.dtype)
        y = jnp.einsum("bhwc,co->bhwo", x, k)
        if norm_bias is not None:
            y = y + norm_bias.astype(y.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


class _S2DStemConv(nn.Module):
    """The MobileNet stem 3x3/s2 conv computed as a 2x2/s1 conv over the
    2x2 space-to-depth input — identical math, same param tree as nn.Conv
    (kernel [3, 3, 3, O]), but the MXU sees K=48 contiguous channels
    instead of a stride-2 gather over 3 channels (XLA's C_in=3 conv
    lowering runs ~5x slower than this on v5e; see README perf notes).

    fold_norm: absorb (x/255 - mean)/std into the kernel (scale) + a bias
    (the tap-sum of the per-channel offsets) — exact composition of two
    linear maps; the module then consumes RAW 0-255 pixels. Only the SAME
    zero-pad ring differs (raw-black vs normalized-zero padding; see
    ModelConfig.fold_input_norm).
    """

    features: int
    use_bias: bool = False
    fold_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] <= 4:
            c = x.shape[-1]
            x = space_to_depth_2x(x.astype(self.dtype))
        else:
            # Input already in s2d layout (host-staged: ops/image.py
            # space_to_depth_flat) — [.., H, W, 3] ops run at 3/128 lane
            # density on TPU, so the batch paths transpose on host.
            c = x.shape[-1] // 4
            x = x.astype(self.dtype)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c,
                                                       self.features),
            jnp.float32,
        )
        k = stem_kernel_to_s2d(kernel)
        norm_bias = None
        if self.fold_norm:
            from multiposenet_tpu.utils.constants import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            # Per s2d input channel ((py*2+px)*3 + rgb): scale + offset of
            # the normalize affine.
            a = jnp.tile(
                1.0 / (255.0 * jnp.asarray(IMAGENET_STD)), 4 * c // 3
            )
            b = jnp.tile(
                -jnp.asarray(IMAGENET_MEAN) / jnp.asarray(IMAGENET_STD),
                4 * c // 3,
            )
            norm_bias = jnp.einsum("hwco,c->o", k, b)
            k = k * a[None, None, :, None]
        k = k.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        # Original SAME padding at stride 2 = one zero row/col at
        # bottom/right, i.e. one trailing zero CELL in s2d space.
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((0, 1), (0, 1)), dimension_numbers=dn,
        )
        if norm_bias is not None:
            y = y + norm_bias.astype(y.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvBNRelu6(nn.Module):
    """Conv → BatchNorm → ReLU6, the MobileNet building block."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-3
    bn_folded: bool = False  # inference flavor: conv(kernel, bias)+relu6
    s2d: bool = False  # stem flavor: exact space-to-depth remap
    s4: bool = False   # stem flavor: 4x4/s4 matmul stem (stem_stride=4)
    fold_norm: bool = False  # stem flavor: input normalize folded in
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert not (self.bn_folded and train), "folded BN cannot train"
        is_dw = (
            self.groups > 1
            and self.groups == x.shape[-1] == self.features
            and self.kernel == (3, 3)
        )
        use_s2d = (
            self.s2d and self.kernel == (3, 3) and self.strides == (2, 2)
            and self.groups == 1 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        use_s4 = (
            self.s4 and self.kernel == (4, 4) and self.strides == (4, 4)
            and self.groups == 1
            and (
                x.shape[-1] > 16  # host-staged s4 cells, no re-tiling
                or (x.shape[-1] > 4 and x.shape[1] % 2 == 0
                    and x.shape[2] % 2 == 0)  # s2d2x cells
                or (x.shape[-1] <= 4 and x.shape[1] % 4 == 0
                    and x.shape[2] % 4 == 0)  # raw image
            )
        )
        if self.fold_norm and not (use_s2d or use_s4):
            # fold_input_norm models take RAW pixels; on the (odd-size)
            # plain-conv fallback, apply the normalize affine explicitly.
            from multiposenet_tpu.ops.image import normalize

            x = normalize(x).astype(self.dtype)
        if use_s4:
            x = _S4StemConv(
                self.features, use_bias=self.bn_folded,
                fold_norm=self.fold_norm, dtype=self.dtype,
                name="conv",
            )(x)
        elif use_s2d:
            x = _S2DStemConv(
                self.features, use_bias=self.bn_folded,
                fold_norm=self.fold_norm, dtype=self.dtype,
                name="conv",
            )(x)
        elif is_dw:
            x = _DepthwiseConv3x3(
                strides=self.strides,
                use_bias=self.bn_folded,
                relu6=self.bn_folded,  # fused epilogue when folded
                dtype=self.dtype,
                name="conv",
            )(x, train=train)
            if self.bn_folded:
                return x  # bias + relu6 already applied
        elif self.kernel == (1, 1) and self.groups == 1 and (
            self.strides == (1, 1)
        ):
            x = _PointwiseConv(
                self.features,
                use_bias=self.bn_folded,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=self.bn_folded,
                dtype=self.dtype,
                name="conv",
            )(x)
        if not self.bn_folded:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                name="bn",
            )(x)
        return jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))


class DepthwiseSeparable(nn.Module):
    """conv-dw 3x3 + conv-pw 1x1 (each with BN + ReLU6)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-3
    bn_folded: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvBNRelu6(
            in_ch,
            kernel=(3, 3),
            strides=self.strides,
            groups=in_ch,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_folded=self.bn_folded,
            dtype=self.dtype,
            name="depthwise",
        )(x, train=train)
        x = ConvBNRelu6(
            self.features,
            kernel=(1, 1),
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_folded=self.bn_folded,
            dtype=self.dtype,
            name="pointwise",
        )(x, train=train)
        return x


# (features, stride) per depthwise-separable block; taps mark C2..C5 outputs.
_MOBILENET_V1_BLOCKS: Sequence[tuple[int, int]] = (
    (64, 1),
    (128, 2),
    (128, 1),   # -> C2 (stride 4)
    (256, 2),
    (256, 1),   # -> C3 (stride 8)
    (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),  # -> C4 (stride 16)
    (1024, 2),
    (1024, 1),  # -> C5 (stride 32)
)
_TAP_AFTER = {2: "C2", 4: "C3", 10: "C4", 12: "C5"}


class MobileNetV1(nn.Module):
    """MobileNet-v1 feature extractor returning {'C2','C3','C4','C5'}.

    Strides: C2=/4, C3=/8, C4=/16, C5=/32 relative to the input image.
    """

    width: float = 1.0
    min_channels: int = 8
    max_channels: int = 0  # 0 = uncapped (ModelConfig.backbone_max_channels)
    # Per-stage caps by output stride 4/8/16/32 (0 = none); see
    # ModelConfig.backbone_stage_caps.
    stage_caps: tuple[int, int, int, int] = (0, 0, 0, 0)
    stem_stride: int = 2   # 4 = matmul stem, 256² stage removed (fast())
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-3
    bn_folded: bool = False
    s2d_stem: bool = True
    fold_input_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> dict[str, jnp.ndarray]:
        def ch(c: int, stride: int = 32) -> int:
            out = max(self.min_channels, _make_divisible(c * self.width))
            if self.max_channels:
                out = min(out, self.max_channels)
            if stride < 4:
                # stage_caps[0] is the STRIDE-4 cap; layers above stride 4
                # (the stride-2 stem + block_0 when stem_stride=2) are
                # uncapped rather than silently borrowing it.
                # CHECKPOINT COMPAT (ADVICE r4): this early return changed
                # channel widths — and hence the param tree — for configs
                # combining stem_stride=2 with a nonzero stage_caps[0];
                # checkpoints trained before round 3's fix under that combo
                # no longer restore. fast() (stem_stride=4) and the
                # defaults (caps all 0) are unaffected. See README
                # "Checkpoint format history".
                return out
            cap = self.stage_caps[min(stride.bit_length() - 3, 3)]
            return min(out, cap) if cap else out

        assert self.stem_stride in (2, 4), self.stem_stride
        s4_stem = self.stem_stride == 4
        x = x.astype(self.dtype)
        x = ConvBNRelu6(
            ch(32, self.stem_stride),
            kernel=(4, 4) if s4_stem else (3, 3),
            strides=(4, 4) if s4_stem else (2, 2),
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            bn_folded=self.bn_folded,
            s2d=self.s2d_stem and not s4_stem,
            s4=s4_stem,
            fold_norm=self.fold_input_norm,
            dtype=self.dtype,
            name="stem",
        )(x, train=train)

        features: dict[str, jnp.ndarray] = {}
        stride = self.stem_stride
        for i, (c, s) in enumerate(_MOBILENET_V1_BLOCKS):
            if s4_stem and i == 1:
                # The stem already took the /4 step; C2 keeps stride 4.
                s = 1
            stride *= s
            x = DepthwiseSeparable(
                ch(c, stride),
                strides=(s, s),
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                bn_folded=self.bn_folded,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train)
            tap = _TAP_AFTER.get(i)
            if tap is not None:
                features[tap] = x
        return features
