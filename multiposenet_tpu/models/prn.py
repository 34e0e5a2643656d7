"""Pose Residual Network (PRN) — assigns keypoints to a person box.

Reference counterpart: `detector/prn.py` (SURVEY.md §2 "PRN" row; PAPER
§3.3; BASELINE.json config "PRN keypoint-to-person assignment"): the 17ch
heatmap cropped inside a person box and resized to a fixed grid is flattened,
passed through one hidden fully-connected layer (ReLU) with a residual add of
the input, then a per-channel spatial softmax; the argmax per channel is the
keypoint belonging to THIS person.

TPU-first notes: the two Dense layers are large matmuls ([N, H*W*K] x
[H*W*K, hidden]) that map straight onto the MXU; the whole padded
max-persons batch runs as ONE matmul pair instead of the reference's
per-box Python loop (SURVEY.md §3.4 device boundary #3).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PRN(nn.Module):
    """[N, crop_h, crop_w, K] heatmap crops → refined per-person heatmaps.

    Returns per-channel spatial softmax maps of the same shape; downstream
    argmax per channel picks this person's keypoint.
    """

    crop_height: int = 56
    crop_width: int = 36
    num_keypoints: int = 17
    hidden_units: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, crops: jnp.ndarray, return_logits: bool = False
    ) -> jnp.ndarray:
        n = crops.shape[0]
        hw = self.crop_height * self.crop_width
        flat_dim = hw * self.num_keypoints
        x = crops.astype(self.dtype).reshape(n, flat_dim)

        h = nn.Dense(self.hidden_units, dtype=self.dtype, name="hidden")(x)
        h = nn.relu(h)
        out = nn.Dense(flat_dim, dtype=self.dtype, name="out")(h)
        out = out + x  # residual add of the input crop (PAPER §3.3)

        out = out.reshape(n, hw, self.num_keypoints)
        if not return_logits:
            # Per-channel spatial softmax over the crop grid.
            out = _spatial_softmax(out)
        return out.reshape(
            n, self.crop_height, self.crop_width, self.num_keypoints
        )


def _spatial_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over axis 1 (the flattened spatial axis) of [N, HW, K]."""
    x = x - jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=1, keepdims=True)
