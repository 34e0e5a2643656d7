"""Keypoint subnet: FPN levels → 17-channel COCO keypoint heatmaps.

Reference counterpart: `detector/keypoint_subnet.py` — per-level convs on
P2..P5, upsample all to stride 4, combine, final 3x3 → 17-channel heatmap,
plus an optional 1-channel person-segmentation auxiliary output (SURVEY.md §2
"Keypoint subnet" row; PAPER §3.2; BASELINE.json north star "FPN-style
keypoint subnet emitting 17-channel COCO keypoint heatmaps").

TPU-first notes: all per-level towers run at their native resolution (small
tensors), the repeated nearest 2x upsample is broadcast-based, and the
summed stride-4 map keeps the final convs on a [B,128,128,C] tensor whose
last dim is lane-aligned until the 17-channel projection.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multiposenet_tpu.models.fpn import nearest_upsample_2x


class KeypointHead(nn.Module):
    """P2..P5 → heatmaps[B, H/4, W/4, K] (+ optional segmentation logits)."""

    num_keypoints: int = 17
    channels: int = 128
    num_convs: int = 2
    with_segmentation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pyramid: dict[str, jnp.ndarray], train: bool = False
    ) -> dict[str, jnp.ndarray]:
        del train
        # Per-level towers ("phi heads" in the paper), then upsample to P2
        # resolution (stride 4) and sum.
        summed = None
        for level, ups in (("P2", 0), ("P3", 1), ("P4", 2), ("P5", 3)):
            x = pyramid[level]
            for i in range(self.num_convs):
                x = nn.Conv(
                    self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"tower_{level}_conv{i}",
                )(x)
                x = nn.relu(x)
            for _ in range(ups):
                x = nearest_upsample_2x(x)
            summed = x if summed is None else summed + x

        x = nn.Conv(
            self.channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="fuse",
        )(summed)
        x = nn.relu(x)

        heatmaps = nn.Conv(
            self.num_keypoints, (3, 3), padding="SAME", dtype=self.dtype,
            name="heatmaps",
        )(x)
        out = {"heatmaps": heatmaps}
        if self.with_segmentation:
            out["segmentation"] = nn.Conv(
                1, (3, 3), padding="SAME", dtype=self.dtype,
                name="segmentation",
            )(x)
        return out
