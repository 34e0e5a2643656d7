"""On-device image preprocessing: resize + pad + per-channel normalize.

Reference counterpart: host-side PIL/cv2/tf.image preprocessing
(SURVEY.md §3.4 step 1: "resize so min-side≈512 / pad to x stride,
normalize"). BASELINE.json's north star mandates a "fused image input path
(JPEG decode, resize, per-channel normalize)": JPEG entropy decode stays on
the host (no TPU JPEG unit), but the uint8 pixels are donated to the device
and everything after — resize, pad, normalize, dtype cast — runs inside the
same XLA program as the network forward, eliminating the reference's host
preprocessing round-trip.

Convention: images are resized with a single scale factor
`s = target / max(h, w)` (aspect preserved), bilinearly, then zero-padded
bottom/right to (target, target). Predictions map back with
`coords_original = coords_model / s`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [.., 3] pixels in [0, 255] → ImageNet-normalized float32."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


@functools.partial(jax.jit,
                   static_argnames=("target_size", "normalize_out"))
def resize_pad_normalize(
    image: jnp.ndarray, target_size: int, normalize_out: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One uint8 [H, W, 3] image → ([target, target, 3] float32, scale).

    normalize_out=False returns raw 0-255 pixels (for fold_input_norm
    models, which normalize inside the stem conv).

    Returns the normalized padded image and the scalar scale factor applied
    (model coords = original coords * scale). The resize output shape must be
    static under jit, so we resize to (target, target) *then* mask off the
    region beyond the aspect-preserving extent — same arithmetic as
    resize-to-(round(h*s), round(w*s))-then-pad but with fixed shapes.
    """
    h, w = image.shape[0], image.shape[1]
    scale = target_size / jnp.maximum(h, w).astype(jnp.float32)
    # Aspect-preserving extent inside the padded square.
    out_h = jnp.round(h * scale).astype(jnp.int32)
    out_w = jnp.round(w * scale).astype(jnp.int32)

    # Bilinear sample on a fixed (target, target) grid; out-of-extent pixels
    # are zeroed. Grid positions use the half-pixel convention of
    # jax.image.resize(method='linear').
    yy = (jnp.arange(target_size, dtype=jnp.float32) + 0.5) * (
        h / jnp.maximum(out_h.astype(jnp.float32), 1.0)
    ) - 0.5
    xx = (jnp.arange(target_size, dtype=jnp.float32) + 0.5) * (
        w / jnp.maximum(out_w.astype(jnp.float32), 1.0)
    ) - 0.5
    img = image.astype(jnp.float32)
    sampled = _bilinear_sample_2d(img, yy, xx)

    row_valid = jnp.arange(target_size) < out_h
    col_valid = jnp.arange(target_size) < out_w
    mask = (row_valid[:, None] & col_valid[None, :])[..., None]
    sampled = jnp.where(mask, sampled, 0.0)
    return (normalize(sampled) if normalize_out else sampled), scale


def _bilinear_sample_2d(
    img: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray
) -> jnp.ndarray:
    """Sample img[H, W, C] at the outer product of row coords yy and col
    coords xx (border-clamped bilinear)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(yy), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(yy - y0, 0.0, 1.0)
    wx = jnp.clip(xx - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = img[y0i][:, x0i] * (1 - wx)[None, :, None] + (
        img[y0i][:, x1i] * wx[None, :, None]
    )
    bot = img[y1i][:, x0i] * (1 - wx)[None, :, None] + (
        img[y1i][:, x1i] * wx[None, :, None]
    )
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def space_to_depth_flat(images: np.ndarray) -> np.ndarray:
    """HOST-side staging: uint8 [B, H, W, 3] → [B, H/2, (W/2)*12] uint8.

    Why: on TPU every elementwise op over a [.., W, 3] image runs at 3/128
    lane density (tiles pad the 3-channel minor dim), so the plain cast of
    a 512^2 uint8 batch alone costs ~6 ms at bs=64. Staging the 2x2
    space-to-depth FLAT layout on host loader threads lets the device
    normalize at full lane density and feed the stem's s2d conv directly
    (models/mobilenet._S2DStemConv). Channel order (py, px, c) matches
    space_to_depth_2x.
    """
    b, h, w, c = images.shape
    x = images.reshape(b, h // 2, 2, w // 2, 2, c)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, (w // 2) * 4 * c)


def space_to_depth_flat4(images: np.ndarray) -> np.ndarray:
    """HOST-side staging for stem_stride=4 models: uint8 [B, H, W, 3] →
    [B, H/4, (W/4)*48] uint8 — 4x4 cells in the composed double-s2d
    channel order ((dy//2)*2+dx//2 major, (dy%2)*2+dx%2 middle, rgb
    minor; see models/mobilenet.stem_kernel_to_s4). The device consumes
    the cells with a free reshape instead of the two-level retile copy
    (~1.9 ms/iter at bs=128 measured on the device path)."""
    b, h, w, c = images.shape
    x = images.reshape(b, h // 4, 2, 2, w // 4, 2, 2, c)
    # target channel order: (py1, px1, py0, px0, c) where full-res offset
    # dy = 2*py1 + py0, dx = 2*px1 + px0.
    x = np.ascontiguousarray(x.transpose(0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, h // 4, (w // 4) * 16 * c)


def space_to_depth_flat4_t(images: np.ndarray) -> np.ndarray:
    """HOST-side staging, TRANSPOSED s4-flat: uint8 [B, H, W, 3] →
    [B, (W/4)*48, H/4] — space_to_depth_flat4 with the minor two dims
    swapped on host.

    Why: at bs=128/512² XLA relayouts the [B, Hq, Wq*48] staged parameter
    to minor-to-major {0,2,1} (physical [B][Wf][Hq]) before the stem —
    a 0.43 ms/iter HBM copy (NOTES_r5 profile, image.py:141). Staging the
    bytes in that physical order up front makes the in-model transpose
    back to [B, Hq, Wf] a pure layout-change bitcast. (Requesting the
    {0,2,1} layout on the untransposed parameter via
    jax.experimental.layout measured WORSE — NOTES_r5 "informat";
    changing the LOGICAL format keeps every layout default.) The
    predictor dispatches on the shape: shape[1] == shape[2] * 48.
    """
    return np.ascontiguousarray(
        space_to_depth_flat4(images).transpose(0, 2, 1)
    )


def s4_flat_to_cells(
    flat: jnp.ndarray, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """Device-side: s4-flat uint8 [B, Hq, Wq*48] → RAW-pixel
    [B, Hq, Wq, 48] cells in `dtype` (fold_input_norm models normalize
    inside the stem matmul)."""
    b, hq, wf = flat.shape
    return flat.reshape(b, hq, wf // 48, 48).astype(dtype)


def normalize_s4_flat(
    flat: jnp.ndarray, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """Device-side: s4-flat uint8 [B, Hq, Wq*48] → normalized
    [B, Hq, Wq, 48] (mean/std repeat with period 3 in the flat minor
    dim, full lane density)."""
    b, hq, wf = flat.shape
    mean = jnp.asarray(
        np.tile(np.asarray(IMAGENET_MEAN, np.float32), wf // 3)
    )
    std = jnp.asarray(
        np.tile(np.asarray(IMAGENET_STD, np.float32), wf // 3)
    )
    x = (flat.astype(jnp.float32) / 255.0 - mean) / std
    return x.astype(dtype).reshape(b, hq, wf // 48, 48)


def normalize_s2d_flat(
    flat: jnp.ndarray, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """Device-side: s2d-flat uint8 [B, Hh, Wh*12] → normalized
    [B, Hh, Wh, 12] in `dtype`.

    The per-channel ImageNet mean/std repeat with period 3 in the flat
    minor dim, so normalization is one dense elementwise pass (full lane
    utilization); the trailing reshape into s2d cells is a free row-major
    split.
    """
    b, hh, wf = flat.shape
    mean = jnp.asarray(
        np.tile(np.asarray(IMAGENET_MEAN, np.float32), wf // 3)
    )
    std = jnp.asarray(
        np.tile(np.asarray(IMAGENET_STD, np.float32), wf // 3)
    )
    x = (flat.astype(jnp.float32) / 255.0 - mean) / std
    return x.astype(dtype).reshape(b, hh, wf // 12, 12)


def s2d_flat_to_cells(
    flat: jnp.ndarray, dtype: jnp.dtype = jnp.float32
) -> jnp.ndarray:
    """Device-side: s2d-flat uint8 [B, Hh, Wh*12] → RAW-pixel
    [B, Hh, Wh, 12] in `dtype` (no normalization — for models with
    fold_input_norm, which absorb the normalize affine into the stem
    conv). The retile copy runs on uint8 (1/2 the bytes of the
    normalized-bf16 variant)."""
    b, hh, wf = flat.shape
    return flat.reshape(b, hh, wf // 12, 12).astype(dtype)


def _resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] bilinear interpolation matrix, half-pixel convention
    (matches jax.image.resize(method='linear') for down/upscaling)."""
    i = np.arange(out_size, dtype=np.float64)
    coords = (i + 0.5) * (in_size / out_size) - 0.5
    lo = np.floor(coords)
    frac = coords - lo
    lo0 = np.clip(lo, 0, in_size - 1).astype(np.int64)
    lo1 = np.clip(lo + 1, 0, in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo0] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), lo1] += frac.astype(np.float32)
    return m


def resize_normalize_batch(
    images: jnp.ndarray, target_size: int, dtype: jnp.dtype = jnp.float32,
    normalize_out: bool = True,
) -> jnp.ndarray:
    """On-device batched resize + normalize: uint8 [B, Hs, Ws, 3] staging
    batch → normalized [B, target, target, 3].

    The staging shape is fixed across the batch, so bilinear resize is two
    constant interpolation matrices applied as batched matmuls — pure MXU
    work fused into the same XLA program as the network forward
    (BASELINE.json "fused image input path ... resize, per-channel
    normalize"). Host only decodes JPEGs and letterboxes to the staging
    shape; scale bookkeeping is the caller's (one factor per image).
    """
    b, hs, ws, c = images.shape
    ry = jnp.asarray(_resize_matrix(target_size, hs), dtype)
    rx = jnp.asarray(_resize_matrix(target_size, ws), dtype)
    x = images.astype(dtype)
    # rows[b, i, w, c] = sum_h ry[i, h] x[b, h, w, c]
    x = jnp.einsum("ih,bhwc->biwc", ry, x)
    x = jnp.einsum("jw,biwc->bijc", rx, x)
    if not normalize_out:
        return x
    mean = jnp.asarray(IMAGENET_MEAN * 255.0, dtype)
    std = jnp.asarray(IMAGENET_STD * 255.0, dtype)
    return (x - mean) / std
