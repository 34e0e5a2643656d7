"""Pure-NumPy oracle implementations of the reference algorithms.

These re-state the reference's host post-processing semantics (SURVEY.md §3.4
DECODE block) independently of any JAX code, so the jnp and Pallas
implementations can be tested against them (SURVEY.md §4 "decode ... vs a
NumPy oracle implementing the reference algorithm").
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel_1d(sigma: float, size: int) -> np.ndarray:
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-8)) ** 2)
    return k / k.sum()


def smooth_oracle(hm: np.ndarray, sigma: float, size: int) -> np.ndarray:
    """Zero-padded separable Gaussian blur of one [H, W] map."""
    if sigma <= 0:
        return hm.astype(np.float64)
    taps = gaussian_kernel_1d(sigma, size)
    half = size // 2
    padded = np.pad(hm.astype(np.float64), half)
    h, w = hm.shape
    out_rows = np.zeros((h, w + 2 * half))
    for i in range(h):
        for j in range(w + 2 * half):
            out_rows[i, j] = np.dot(padded[i : i + size, j], taps)
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            out[i, j] = np.dot(out_rows[i, j : j + size], taps)
    return out


def peak_mask_oracle(sm: np.ndarray, window: int) -> np.ndarray:
    """maximum_filter(sm, window) == sm with -inf padding (plateaus kept)."""
    h, w = sm.shape
    half = window // 2
    padded = np.full((h + 2 * half, w + 2 * half), -np.inf)
    padded[half : half + h, half : half + w] = sm
    out = np.zeros((h, w), dtype=bool)
    for i in range(h):
        for j in range(w):
            out[i, j] = sm[i, j] >= padded[i : i + window, j : j + window].max()
    return out


def decode_oracle(
    heatmaps: np.ndarray,
    sigma: float,
    kernel_size: int,
    nms_window: int,
    max_peaks: int,
    score_threshold: float,
    subpixel_shift: float,
):
    """Decode [H, W, K] → per-channel (positions[K,P,2], scores, valid).

    Mirrors multiposenet_tpu.ops.decode.decode_heatmaps for a single image.
    """
    h, w, k = heatmaps.shape
    positions = np.zeros((k, max_peaks, 2), dtype=np.float64)
    scores = np.zeros((k, max_peaks), dtype=np.float64)
    valid = np.zeros((k, max_peaks), dtype=bool)
    for c in range(k):
        sm = smooth_oracle(heatmaps[:, :, c], sigma, kernel_size)
        mask = peak_mask_oracle(sm, nms_window)
        cand = np.where(mask, sm, -np.inf).reshape(-1)
        # Stable top-k matching jax.lax.top_k (ties → lower index first).
        order = np.argsort(-cand, kind="stable")[:max_peaks]
        for p, idx in enumerate(order):
            y, x = divmod(int(idx), w)
            s = cand[idx]
            ok = s > score_threshold
            right = sm[y, min(x + 1, w - 1)]
            left = sm[y, max(x - 1, 0)]
            down = sm[min(y + 1, h - 1), x]
            up = sm[max(y - 1, 0), x]
            fy = y + np.sign(down - up) * subpixel_shift
            fx = x + np.sign(right - left) * subpixel_shift
            positions[c, p] = (fy, fx)
            scores[c, p] = s if ok else 0.0
            valid[c, p] = ok
    return positions, scores, valid
