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
import jax
import jax.numpy as jnp


class PRN(nn.Module):
    """[N, K, hw] channel-major heatmap crops → refined per-person maps.

    Returns per-channel spatial softmax maps of the same shape; downstream
    argmax per channel picks this person's keypoint.

    Input comes from ops/prn_ops.to_channel_major: the flat spatial axis
    (hw = crop_w * crop_h, column-major) is MINOR, so the flatten here is
    a free contiguous reshape, the residual add runs at full lane density,
    and the per-channel softmax/argmax reduce over lanes. The Dense
    weights' row order simply follows this layout (our convention; the
    reference's flatten order is equally arbitrary)."""

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

        # Layout-versioned names: the flatten order changed from row-major
        # [i*cw+j interleaved with K] to channel-major [K, j*ch+i] in
        # round 2; the Dense shapes are identical, so params trained
        # against the OLD order would restore silently-permuted. The "_cm"
        # (channel-major) names make any stale-layout checkpoint fail
        # loudly with a tree mismatch instead (ADVICE r2).
        h = nn.Dense(self.hidden_units, dtype=self.dtype,
                     name="hidden_cm")(x)
        h = nn.relu(h)
        out = nn.Dense(flat_dim, dtype=self.dtype, name="out_cm")(h)
        out = out + x  # residual add of the input crop (PAPER §3.3)

        out = out.reshape(n, self.num_keypoints, hw)
        if not return_logits:
            # Per-channel spatial softmax over the (lane-minor) crop grid.
            out = jax.nn.softmax(out, axis=-1)
        return out


def migrate_param_keys(variables: dict) -> dict:
    """Rename PRN Dense keys `hidden`/`out` → `hidden_cm`/`out_cm`.

    ONLY for checkpoints trained AFTER the round-2 channel-major flatten
    change but BEFORE the layout-versioned rename (ADVICE r3): those weights
    are correct for the current layout and differ only in param-tree key
    names. Checkpoints trained against the row-major layout must NOT be
    migrated — their weights are permuted; retrain instead. No-op if the
    keys are already current.
    """
    params = dict(variables.get("params", {}))
    for old, new in (("hidden", "hidden_cm"), ("out", "out_cm")):
        if old in params and new not in params:
            params[new] = params.pop(old)
    return {**variables, "params": params}
