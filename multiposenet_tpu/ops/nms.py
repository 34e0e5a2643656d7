"""Fixed-shape batched NMS, XLA-idiomatic (no dynamic shapes).

Reference counterpart: `batch_nms` / per-image NMS in the person detector
(SURVEY.md §2 "Person detector head" row). The reference used TF's dynamic
NMS on host-visible tensors; here NMS runs on device with static shapes:
`max_out` sequential selections over the pre-top-k candidate set inside a
`lax.fori_loop` (compiler-friendly control flow), suppressed candidates
masked to -inf. O(max_out * N) vectorized IoU work on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multiposenet_tpu.ops.boxes import pairwise_iou

# Hard-NMS (vote_iou == soft_sigma == 0) via the parallel fixpoint instead
# of the max_out-iteration greedy loop. Exact: greedy hard NMS's kept set
# is the unique solution of kept[i] = "no higher-ranked kept box overlaps
# i" (induction on rank), the fixpoint iteration reaches it in
# suppression-chain-depth rounds (typically 2-4 vs max_out=20 sequential
# picks — the greedy while-loop costs 0.40 ms/iter at bs=128, NOTES_r5
# profile), and the output slots are the first max_out kept boxes in rank
# order — exactly greedy's pick sequence. A/B flag; the winner measured
# on v5e ships as the default. Soft-NMS and box voting are inherently
# sequential (each pick rescores/averages against the LIVE set) and keep
# the greedy loop.
HARD_FIXPOINT = False


@functools.partial(jax.jit, static_argnames=("max_out",))
def _nms_hard_fixpoint(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy-equivalent hard NMS as a parallel fixpoint (see
    HARD_FIXPOINT). vmap-safe: the body is idempotent at the fixpoint, so
    vmap's lifted while_loop (run until every batch element converges)
    over-runs harmlessly."""
    n = boxes.shape[0]
    scores0 = scores.astype(jnp.float32)
    # Rank = descending score, ties by ascending index — the greedy
    # loop's argmax tie order.
    order = jnp.argsort(-scores0, stable=True)
    b = boxes[order]
    s = scores0[order]
    # Suppression graph: j can suppress i iff j outranks i and overlaps.
    # pairwise_iou shares the greedy iou_row's semantics exactly (clamped
    # areas/intersection, 1e-8 union floor).
    rank = jnp.arange(n)
    sup = (pairwise_iou(b, b) >= iou_threshold) & (
        rank[None, :] < rank[:, None]
    )

    def cond(state):
        kept, prev = state
        return jnp.any(kept != prev)

    def body(state):
        kept, _ = state
        return ~jnp.any(sup & kept[None, :], axis=1), kept

    kept, _ = jax.lax.while_loop(
        cond, body, (jnp.ones((n,), bool), jnp.zeros((n,), bool))
    )
    # Output slots: first max_out kept boxes in rank order (greedy's pick
    # sequence). Not-kept entries sort behind every kept one; slots past
    # the candidate count (max_out > n — the greedy loop emits invalid
    # slots there) are padded after the top_k.
    slot_key = jnp.where(kept, rank, n).astype(jnp.int32)
    k_sel = min(max_out, n)
    _, sel = jax.lax.top_k(-slot_key, k_sel)
    picked = slot_key[sel] < n
    out_boxes = jnp.where(picked[:, None], b[sel], 0.0).astype(boxes.dtype)
    out_scores = jnp.where(picked, s[sel], 0.0)
    if max_out > n:
        pad = max_out - n
        out_boxes = jnp.concatenate(
            [out_boxes, jnp.zeros((pad, 4), out_boxes.dtype)], axis=0)
        out_scores = jnp.concatenate(
            [out_scores, jnp.zeros((pad,), out_scores.dtype)], axis=0)
        picked = jnp.concatenate(
            [picked, jnp.zeros((pad,), bool)], axis=0)
    # Same contract as the greedy loop: zero-score candidates can occupy
    # slots (box written) but report valid False.
    return out_boxes, out_scores, picked & (out_scores > 0.0)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float = 0.5,
    vote_iou: float = 0.0,
    soft_sigma: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over boxes[N, 4] / scores[N] → fixed max_out outputs.

    Plain-Python dispatcher (HARD_FIXPOINT is read at trace time — a
    module-level jit cache here would pin the flag's value at first call);
    both implementations below carry the jit.

    Returns (boxes[max_out, 4], scores[max_out], valid[max_out]); unselected
    slots have score 0 and valid False. Selection order is by descending
    score, exactly like the reference's sequential NMS.

    vote_iou > 0 enables box voting: each selected box is replaced by the
    score-weighted average of the still-live candidates with IoU ≥
    vote_iou against it (itself included) — the cluster of anchors the
    selection suppresses refines its localization instead of being
    discarded. 0 keeps the reference's plain greedy NMS (winner box
    verbatim). Adds one [N]-wide weighted sum per selection — noise next
    to the IoU row already computed.

    soft_sigma > 0 enables Gaussian soft-NMS (Bodla et al. 2017):
    instead of hard-killing every candidate with IoU ≥ iou_threshold,
    each selection DECAYS the still-live candidates' scores by
    exp(-IoU²/σ) — overlapping boxes survive with reduced scores and can
    still win later rounds, which keeps genuinely-overlapping people
    alive in crowded scenes. iou_threshold is unused in this mode (the
    decay replaces the hard cut); later picks are re-ranked by decayed
    scores and report them (detection.postprocess_detections still
    filters `score > 0`, and the caller's score_threshold was applied
    pre-NMS). Same O(max_out · N) VPU shape as the hard path.
    """
    if HARD_FIXPOINT and vote_iou == 0.0 and soft_sigma == 0.0:
        return _nms_hard_fixpoint(boxes, scores, max_out, iou_threshold)
    return _nms_greedy(
        boxes, scores, max_out, iou_threshold, vote_iou, soft_sigma
    )


@functools.partial(
    jax.jit, static_argnames=("max_out", "vote_iou", "soft_sigma")
)
def _nms_greedy(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float = 0.5,
    vote_iou: float = 0.0,
    soft_sigma: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    scores0 = scores.astype(jnp.float32)

    def iou_row(best):
        """IoU of boxes[best] vs all boxes — computed on the fly so the
        [N, N] matrix (4 MB/image at N=1000) is never materialized."""
        b = boxes[best]
        y0 = jnp.maximum(b[0], boxes[:, 0])
        x0 = jnp.maximum(b[1], boxes[:, 1])
        y1 = jnp.minimum(b[2], boxes[:, 2])
        x1 = jnp.minimum(b[3], boxes[:, 3])
        inter = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
        return inter / jnp.maximum(areas[best] + areas - inter, 1e-8)

    def body(i, state):
        live_scores, out_idx, out_scores, out_boxes = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        picked = best_score > neg_inf
        out_idx = out_idx.at[i].set(jnp.where(picked, best, -1))
        out_scores = out_scores.at[i].set(
            jnp.where(picked, best_score, 0.0)
        )
        ious = iou_row(best)
        if vote_iou > 0.0:
            live = live_scores > neg_inf
            w = jnp.where(live & (ious >= vote_iou), scores0, 0.0)
            voted = (w @ boxes) / jnp.maximum(w.sum(), 1e-8)
        else:
            voted = boxes[best]
        out_boxes = out_boxes.at[i].set(
            jnp.where(picked, voted, jnp.zeros_like(voted))
        )
        if soft_sigma > 0.0:
            # Gaussian soft-NMS: decay live scores by overlap with the
            # pick instead of hard suppression. exp() is never exactly 0
            # so -inf (dead) slots stay -inf; sigmoid scores are >= 0 so
            # the decay only ever lowers them.
            decay = jnp.exp(-(ious * ious) / soft_sigma)
            live_scores = jnp.where(picked, live_scores * decay,
                                    live_scores)
        else:
            # Suppress everything overlapping the chosen box.
            suppress = ious >= iou_threshold
            live_scores = jnp.where(
                picked & suppress, neg_inf, live_scores
            )
        # The chosen box itself never competes again (either mode).
        live_scores = live_scores.at[best].set(
            jnp.where(picked, neg_inf, live_scores[best])
        )
        return live_scores, out_idx, out_scores, out_boxes

    init = (
        scores0,
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out, 4), boxes.dtype),
    )
    _, out_idx, out_scores, out_boxes = jax.lax.fori_loop(
        0, max_out, body, init
    )
    # Soft mode never drives scores to -inf, so `picked` stays true once
    # real candidates run out and score-0 padding slots would report
    # valid=True. Mask by score > 0 so the documented contract ("unselected
    # slots have score 0 and valid False") holds in both modes regardless
    # of the caller (sigmoid scores of real candidates are > 0).
    valid = (out_idx >= 0) & (out_scores > 0.0)
    return out_boxes, out_scores, valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float = 0.5,
    vote_iou: float = 0.0,
    soft_sigma: float = 0.0,
):
    """vmap of `nms` over a leading batch dim: boxes[B, N, 4], scores[B, N]."""
    return jax.vmap(
        lambda b, s: nms(b, s, max_out, iou_threshold, vote_iou,
                         soft_sigma)
    )(boxes, scores)
