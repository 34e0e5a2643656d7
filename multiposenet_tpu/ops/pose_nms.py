"""Pose-level OKS NMS: dedupe near-identical skeletons after the PRN.

Reference counterpart: none — the reference relies on box-level NMS
alone (SURVEY.md §3.4). With Gaussian soft-NMS (ops/nms.py) keeping
overlapping BOXES alive for crowd recall, two surviving boxes on the
same person produce two near-identical POSES (the PRN snaps both crops
to the same heatmap peaks); the OKS evaluator counts the duplicate as a
false positive. This pass suppresses detections whose keypoints land on
a higher-scoring detection's keypoints, measured by the same OKS the
evaluator scores (constants.OKS_SIGMAS, scale = keeper's box area) —
box IoU cannot make this call because two DIFFERENT people can share a
box while two duplicate poses always share keypoints.

Fixed shapes throughout: one [B, D, D, K] distance tensor (D = NMS
output slots ≤ ~20, K = 17 → kilobytes) and a D-round fori loop; fuses
into the inference XLA program like everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multiposenet_tpu.utils.constants import OKS_SIGMAS


@functools.partial(jax.jit, static_argnames=("oks_threshold",))
def pose_nms(
    keypoints: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    oks_threshold: float,
) -> jnp.ndarray:
    """Greedy pose dedup → updated valid mask.

    keypoints [B, D, K, 3] rows (x, y, score), boxes [B, D, 4]
    (y0, x0, y1, x1) in the same pixel space, valid [B, D] bool. Slots
    are score-descending (the contract of ops/nms.py's sequential
    selection), so slot order IS the greedy order: slot i, if still
    alive, kills every later slot j whose pose OKS against it exceeds
    `oks_threshold`. OKS follows eval/oks.py: mean_k exp(-d_k² /
    (2·area_i·(2σ_k)²)) with the keeper's box area as scale, all 17
    keypoints counted (predictions always carry 17).
    """
    b, d = keypoints.shape[0], keypoints.shape[1]
    k2 = jnp.asarray((2.0 * OKS_SIGMAS) ** 2, jnp.float32)
    x = keypoints[..., 0].astype(jnp.float32)  # [B, D, K]
    y = keypoints[..., 1].astype(jnp.float32)
    dx = x[:, :, None, :] - x[:, None, :, :]   # [B, Di, Dj, K]
    dy = y[:, :, None, :] - y[:, None, :, :]
    area = jnp.maximum(
        (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]),
        1e-9,
    ).astype(jnp.float32)                      # [B, D]
    e = (dx * dx + dy * dy) / (2.0 * area[:, :, None, None] * k2)
    oks = jnp.mean(jnp.exp(-e), axis=-1)       # [B, Di, Dj], keeper-i scale

    slot = jnp.arange(d)

    def body(i, keep):
        is_keeper = keep[:, i] & valid[:, i]   # [B]
        suppress = (
            (oks[:, i, :] > oks_threshold)
            & (slot[None, :] > i)
            & is_keeper[:, None]
        )
        return keep & ~suppress

    return jax.lax.fori_loop(0, d, body, valid)
