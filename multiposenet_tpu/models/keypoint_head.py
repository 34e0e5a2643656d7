"""Keypoint subnet: FPN levels → 17-channel COCO keypoint heatmaps.

Reference counterpart: `detector/keypoint_subnet.py` — per-level convs on
P2..P5, upsample all to stride 4, combine, final 3x3 → 17-channel heatmap,
plus an optional 1-channel person-segmentation auxiliary output (SURVEY.md §2
"Keypoint subnet" row; PAPER §3.2; BASELINE.json north star "FPN-style
keypoint subnet emitting 17-channel COCO keypoint heatmaps").

TPU-first notes:
  * Per-level towers run at their native resolution (small tensors).
  * The upsample-to-stride-4 sum is a coarse→fine CASCADE —
    t2 + up(t3 + up(t4 + up(t5))) — mathematically identical to upsampling
    every tower to stride 4 and summing (nearest upsampling is value
    replication, so up(a) + up(b) == up(a + b) bit-for-bit), but it
    materializes ONE full-resolution broadcast instead of three: each
    128²x128ch bf16 broadcast costs ~1.1 ms/iter at bs=128.
  * Heatmap and segmentation logits come from ONE 3x3 conv whose kernel is
    the runtime concat of the two heads' kernels — same param tree, same
    math, one read of the 128² fuse tensor instead of two.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from multiposenet_tpu.models.fpn import nearest_upsample_2x


class KeypointHead(nn.Module):
    """P2..P5 → heatmaps[B, H/4, W/4, K] (+ optional segmentation logits)."""

    num_keypoints: int = 17
    channels: int = 128
    num_convs: int = 2
    with_segmentation: bool = True
    # p2_late: run towers + fuse at stride 8 and touch stride 4 only with
    # the final upsample-add + output conv. The stride-4 towers are the
    # single most expensive convs in the whole model (a 3x3 at 128² is 4x
    # the FLOPs of the same conv at 64², and 64-wide channels cap the MXU
    # at half its lanes), so the fast() operating point trades per-level
    # P2 processing for the P2 information already present in the FPN
    # top-down map. Quality cost measured on the synthetic 512² benchmark
    # (README perf/quality table).
    p2_late: bool = False
    # fuse_conv: the 3x3 conv gluing the summed towers before the output
    # conv. With p2_late it runs at stride 8; dropping it leaves the
    # towers' own convs + the output conv as the only mixing.
    fuse_conv: bool = True
    # Inference-only: emit heatmaps_cm via the fused Pallas stride-4 tail
    # (ops/kp_tail_pallas.py — upsample-add + 3x3 conv + channel-major
    # write in one VMEM pass). Only takes effect on the merged p2_late
    # path with train=False on a TPU backend; the jnp path remains the
    # reference (and the training/NHWC path everywhere).
    tail_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pyramid: dict[str, jnp.ndarray], train: bool = False
    ) -> dict[str, jnp.ndarray]:
        # Per-level towers ("phi heads" in the paper), accumulated
        # coarse→fine so each 2x upsample runs at the coarser resolution.
        tower_levels = ("P5", "P4", "P3") if self.p2_late else (
            "P5", "P4", "P3", "P2"
        )
        summed = None
        for level in tower_levels:
            x = pyramid[level]
            for i in range(self.num_convs):
                x = nn.Conv(
                    self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"tower_{level}_conv{i}",
                )(x)
                x = nn.relu(x)
            summed = x if summed is None else x + nearest_upsample_2x(summed)

        if self.fuse_conv:
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name="fuse",
            )(summed)
            x = nn.relu(x)
        else:
            x = summed
        l2 = z8 = None
        if self.p2_late:
            # Stride-4 entry point: top-down P2 + upsampled fused stride-8
            # context; the output conv below is the only stride-4 conv.
            # When the FPN exposes the raw stride-4 lateral L2 (raw-T-map
            # mode) and widths line up, merge the two stride-4 upsamples:
            # P2 + up(x) = (L2 + up(T3)) + up(x) = L2 + up(T3 + x) —
            # nearest upsampling is replication, so up(a) + up(b) ==
            # up(a + b); the merge trades two materialized 4x-size
            # broadcasts (~0.5 ms each at bs=128/512²) for one stride-8
            # add. (Summation order shifts by one association — within
            # 1 ulp, covered by predictor parity tolerances.)
            l2 = pyramid.get("L2")
            if (l2 is not None and l2.shape[-1] == self.channels
                    and pyramid["P3"].shape[-1] == self.channels):
                z8 = pyramid["P3"] + x
                x = l2 + nearest_upsample_2x(z8)
            else:
                p2 = pyramid["P2"]
                if p2.shape[-1] != self.channels:
                    # Head wider than the FPN: 1x1-project P2 up to the
                    # head width (only exists when the widths differ).
                    p2 = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                 name="p2_lateral")(p2)
                x = p2 + nearest_upsample_2x(x)

        k = self.num_keypoints
        hm_kernel = self.param(
            "heatmaps_kernel", nn.initializers.lecun_normal(),
            (3, 3, self.channels, k), jnp.float32,
        )
        hm_bias = self.param(
            "heatmaps_bias", nn.initializers.zeros, (k,), jnp.float32
        )
        if self.with_segmentation:
            seg_kernel = self.param(
                "segmentation_kernel", nn.initializers.lecun_normal(),
                (3, 3, self.channels, 1), jnp.float32,
            )
            seg_bias = self.param(
                "segmentation_bias", nn.initializers.zeros, (1,),
                jnp.float32,
            )
            kernel = jnp.concatenate([hm_kernel, seg_kernel], axis=-1)
            bias = jnp.concatenate([hm_bias, seg_bias])
        else:
            kernel, bias = hm_kernel, hm_bias

        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + bias.astype(self.dtype)

        out = {"heatmaps": y[..., :k]}
        # ALSO emit the channel-major layout natively from the conv
        # (NCHW out spec): the inference pipeline's decode kernel + PRN
        # crops consume [B, K, H, W], and producing it here beats
        # transposing the NHWC tensor afterwards. Whichever layout a
        # given jitted program doesn't read is dead code — XLA DCEs it —
        # so training (NHWC losses) and inference (cm) each compute the
        # output conv exactly once.
        # The cm conv uses ONLY the heatmap kernel (not the concat with the
        # segmentation head): inference never reads segmentation from the
        # cm path, and slicing [:, :17] off an 18-channel NCHW output
        # forces XLA to materialize relayout copies of the full tensor
        # (2x ~0.5 ms/iter at bs=128, profiled r3).
        from multiposenet_tpu.ops import kp_tail_pallas as tail_mod

        use_tail = (
            self.tail_pallas and not train and z8 is not None
            and x.shape[1] % tail_mod.TILE_ROWS == 0
            and x.shape[2] % 2 == 0
            and (jax.default_backend() == "tpu"
                 or tail_mod.FORCE_INTERPRET)
        )
        if use_tail:
            # Fused Pallas tail: upsample-add + output conv + cm write in
            # one VMEM pass (the NHWC x/y above are DCE'd by XLA when the
            # program reads only heatmaps_cm).
            out["heatmaps_cm"] = tail_mod.kp_tail_cm(
                l2, z8, hm_kernel.astype(self.dtype), hm_bias,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            dn_cm = jax.lax.conv_dimension_numbers(
                x.shape, hm_kernel.shape, ("NHWC", "HWIO", "NCHW")
            )
            y_cm = jax.lax.conv_general_dilated(
                x, hm_kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=dn_cm,
            ) + hm_bias.astype(self.dtype)[:, None, None]
            out["heatmaps_cm"] = y_cm
        if self.with_segmentation:
            out["segmentation"] = y[..., k:]
        return out
