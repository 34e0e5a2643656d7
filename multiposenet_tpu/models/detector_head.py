"""RetinaNet-style single-class person detection head (flax, NHWC).

Reference counterpart: `detector/person_detector.py` — anchor-based
single-class (person) detection subnet on FPN levels with class + box towers
(SURVEY.md §2 "Person detector head" row; PAPER §3.1; BASELINE.json config
"person-detector head + keypoint subnet joint forward").

The towers share weights across pyramid levels (standard RetinaNet), which on
TPU means one set of conv weights resident in VMEM reused across all levels.
Class logits are initialized with a negative prior bias so focal-loss training
starts stable.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DetectorHead(nn.Module):
    """P{min_level}..P{max_level} → per-level class logits and box deltas.

    Outputs, per level: cls[B, H, W, A] (single person class) and
    box[B, H, W, A*4] with deltas in (dy, dx, dh, dw) anchor coding.
    """

    min_level: int = 3
    max_level: int = 7
    anchors_per_cell: int = 9
    channels: int = 128
    num_convs: int = 4
    prior_prob: float = 0.01
    # IoU-aware scoring: extra A-channel conv on the box tower predicting
    # localization quality (DetectorConfig.iou_head).
    with_iou: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pyramid: dict[str, jnp.ndarray], train: bool = False
    ) -> dict[str, dict[str, jnp.ndarray]]:
        del train
        # Shared tower weights across levels: define once, apply per level.
        cls_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"cls_conv{i}")
            for i in range(self.num_convs)
        ]
        box_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"box_conv{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_prob) / self.prior_prob)
        )
        cls_out = nn.Conv(
            self.anchors_per_cell, (3, 3), padding="SAME", dtype=self.dtype,
            bias_init=bias_init, name="cls_out",
        )
        box_out = nn.Conv(
            self.anchors_per_cell * 4, (3, 3), padding="SAME",
            dtype=self.dtype, name="box_out",
        )
        if self.with_iou:
            # Zero-ish init bias → sigmoid ≈ 0.5: neutral quality estimate
            # at step 0 so early NMS ranking matches the plain head.
            iou_out = nn.Conv(
                self.anchors_per_cell, (3, 3), padding="SAME",
                dtype=self.dtype, name="iou_out",
            )

        outputs: dict[str, dict[str, jnp.ndarray]] = {}
        for level in range(self.min_level, self.max_level + 1):
            x = pyramid[f"P{level}"]
            c = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            b = x
            for conv in box_convs:
                b = nn.relu(conv(b))
            out = {"cls": cls_out(c), "box": box_out(b)}
            if self.with_iou:
                out["iou"] = iou_out(b)  # rides the box tower features
            outputs[f"P{level}"] = out
        return outputs
