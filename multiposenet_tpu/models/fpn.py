"""Feature Pyramid Network neck (flax, NHWC).

Reference counterpart: `detector/fpn.py` — top-down pathway with 1x1 lateral
projections of C2..C5 to a common width, nearest-neighbor upsample + add, and
3x3 smoothing convs producing P2..P5 (SURVEY.md §2 "FPN neck" row; PAPER
§3.2). P6/P7 for the RetinaNet-style person detector are produced here too
(stride-2 convs on P5), matching the standard RetinaNet FPN extension
(SURVEY.md §2 "Person detector head" row).

TPU-first notes: nearest upsampling is a reshape+broadcast (no gather), which
XLA fuses into the following add; the common width (default 128) is one full
lane register so every lateral 1x1 conv is a dense MXU matmul.

The raw (pre-smooth) top-down maps are also returned as T2..T5: the
keypoint head's per-level towers can consume those directly (its first conv
subsumes the smoothing conv), in which case smooth_P2 — a 3x3 128-ch conv
on the 128² map, ~4.5 ms/iter at bs=128, whose output nothing else reads —
is skipped entirely via `smooth_p2=False`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample for NHWC via broadcast (fusable)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds P2..P5 (smoothed) and T2..T5 (raw top-down) from C2..C5,
    plus P6/P7 detector levels."""

    channels: int = 128
    with_p6_p7: bool = True
    smooth_p2: bool = True  # False skips the (keypoint-only) P2 smooth conv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: dict[str, jnp.ndarray], train: bool = False
    ) -> dict[str, jnp.ndarray]:
        del train  # FPN has no BN in the reference design.
        laterals = {
            level: nn.Conv(
                self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                name=f"lateral_{level}",
            )(features[level])
            for level in ("C2", "C3", "C4", "C5")
        }

        # Top-down pathway.
        p5 = laterals["C5"]
        p4 = laterals["C4"] + nearest_upsample_2x(p5)
        p3 = laterals["C3"] + nearest_upsample_2x(p4)
        p2 = laterals["C2"] + nearest_upsample_2x(p3)

        # L2 = the stride-4 lateral BEFORE the top-down add. The p2_late
        # keypoint head uses it to merge the two stride-4 upsample-adds
        # into one (T2 + up(h) == L2 + up(T3 + h) for nearest upsampling):
        # one materialized full-res broadcast instead of two. Unused keys
        # are dead code under jit — XLA DCEs whichever of L2/T2 a program
        # doesn't read.
        out = {"T2": p2, "T3": p3, "T4": p4, "T5": p5, "L2": laterals["C2"]}
        for name, p in (("P2", p2), ("P3", p3), ("P4", p4), ("P5", p5)):
            if name == "P2" and not self.smooth_p2:
                continue
            out[name] = nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"smooth_{name}",
            )(p)

        if self.with_p6_p7:
            p6 = nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name="p6",
            )(out["P5"])
            p7 = nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name="p7",
            )(nn.relu(p6))
            out["P6"] = p6
            out["P7"] = p7
        return out
