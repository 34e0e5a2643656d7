"""Host-side training augmentations (NumPy), annotation-aware.

Reference counterpart: the tf.data augmentations (SURVEY.md §2 "Input
pipeline" row): random crop/resize keeping keypoints, random horizontal flip
WITH the left/right keypoint index swap, color jitter, then resize to the
train size. These run on CPU worker threads (like the reference's tf.data);
everything after (normalize, target heatmaps) runs on device.
"""

from __future__ import annotations

import numpy as np

from multiposenet_tpu.utils.constants import FLIP_PERMUTATION


def hflip(
    image: np.ndarray, keypoints: np.ndarray, boxes: np.ndarray,
    masks: np.ndarray | None = None,
):
    """Horizontal flip with the COCO L/R keypoint index swap. `masks` is an
    optional [H, W, M] stack of aux maps (e.g. segmentation-derived loss
    masks) flipped with the image."""
    w = image.shape[1]
    image = image[:, ::-1]
    if masks is not None:
        masks = np.ascontiguousarray(masks[:, ::-1])
    keypoints = keypoints.copy()
    keypoints[..., 0] = np.where(
        keypoints[..., 2] > 0, (w - 1) - keypoints[..., 0], keypoints[..., 0]
    )
    keypoints = keypoints[:, FLIP_PERMUTATION]
    boxes = boxes.copy()
    x0 = boxes[:, 1].copy()
    boxes[:, 1] = (w - 1) - boxes[:, 3]
    boxes[:, 3] = (w - 1) - x0
    return np.ascontiguousarray(image), keypoints, boxes, masks


def random_crop(
    rng: np.random.RandomState,
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    masks: np.ndarray | None = None,
    min_fraction: float = 0.6,
):
    """Random crop keeping annotations consistent; keypoints falling outside
    the crop get v=0 (treated as unlabeled, exactly like occluded GT)."""
    h, w = image.shape[:2]
    ch = int(h * rng.uniform(min_fraction, 1.0))
    cw = int(w * rng.uniform(min_fraction, 1.0))
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    image = image[y0 : y0 + ch, x0 : x0 + cw]
    if masks is not None:
        masks = np.ascontiguousarray(masks[y0 : y0 + ch, x0 : x0 + cw])

    keypoints = keypoints.copy()
    keypoints[..., 0] -= x0
    keypoints[..., 1] -= y0
    outside = (
        (keypoints[..., 0] < 0) | (keypoints[..., 0] > cw - 1)
        | (keypoints[..., 1] < 0) | (keypoints[..., 1] > ch - 1)
    )
    keypoints[..., 2] = np.where(outside, 0.0, keypoints[..., 2])

    boxes = boxes.copy()
    boxes[:, 0] = np.clip(boxes[:, 0] - y0, 0, ch - 1)
    boxes[:, 2] = np.clip(boxes[:, 2] - y0, 0, ch - 1)
    boxes[:, 1] = np.clip(boxes[:, 1] - x0, 0, cw - 1)
    boxes[:, 3] = np.clip(boxes[:, 3] - x0, 0, cw - 1)
    return np.ascontiguousarray(image), keypoints, boxes, masks


def color_jitter(
    rng: np.random.RandomState,
    image: np.ndarray,
    brightness: float = 0.25,
    contrast: float = 0.25,
    hue: float = 0.05,
    saturation: float = 0.25,
) -> np.ndarray:
    """Brightness/contrast/hue/saturation jitter on uint8 pixels
    (SURVEY.md §2 Input pipeline: "color augment
    (brightness/contrast/hue/sat)"). Hue is a fraction of the full hue
    circle; saturation a multiplicative factor range."""
    img = image.astype(np.float32)
    img = img * rng.uniform(1 - contrast, 1 + contrast)
    img = img + rng.uniform(-brightness, brightness) * 255.0
    img = np.clip(img, 0, 255).astype(np.uint8)
    if hue > 0 or saturation > 0:
        import cv2

        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        # OpenCV uint8 hue range is [0, 180).
        hsv[..., 0] = (
            hsv[..., 0] + rng.uniform(-hue, hue) * 180.0
        ) % 180.0
        hsv[..., 1] = np.clip(
            hsv[..., 1] * rng.uniform(1 - saturation, 1 + saturation),
            0, 255,
        )
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return img


def resize_to(
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    target: int,
    masks: np.ndarray | None = None,
    mode: str = "max_side",
):
    """Resize + bottom/right zero pad/crop to (target, target).

    mode="max_side" (default, the pinned convention — matches
    ops.image.resize_pad_normalize): one scale target/max(h, w), whole
    image visible, bottom/right zero pad.
    mode="min_side" (opt-in, the reference's convention per SURVEY §3.4):
    scale target/min(h, w) — fills the square, the long axis is cropped at
    `target` (keypoints beyond it get v=0, like crop augmentation).
    """
    import cv2

    h, w = image.shape[:2]
    if mode == "min_side":
        scale = target / min(h, w)
    elif mode == "max_side":
        scale = target / max(h, w)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((target, target, 3), image.dtype)
    out[: min(nh, target), : min(nw, target)] = resized[:target, :target]
    keypoints = keypoints.copy()
    keypoints[..., :2] *= scale
    boxes = boxes * scale
    if mode == "min_side":
        boxes = np.clip(boxes, 0.0, target - 1)
        outside = (
            (keypoints[..., 0] > target - 1)
            | (keypoints[..., 1] > target - 1)
        )
        keypoints[..., 2] = np.where(outside, 0.0, keypoints[..., 2])
    if masks is not None:
        mr = cv2.resize(masks.astype(np.float32), (nw, nh),
                        interpolation=cv2.INTER_LINEAR)
        if mr.ndim == 2:
            mr = mr[..., None]
        mout = np.zeros((target, target, mr.shape[-1]), np.float32)
        mout[: min(nh, target), : min(nw, target)] = mr[:target, :target]
        masks = mout
    return out, keypoints, boxes, masks


def augment_record(
    rng: np.random.RandomState,
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    target: int,
    masks: np.ndarray | None = None,
    flip_prob: float = 0.5,
    crop_prob: float = 0.7,
):
    """Full training augmentation chain → fixed (target, target) image."""
    if rng.rand() < crop_prob:
        image, keypoints, boxes, masks = random_crop(
            rng, image, keypoints, boxes, masks
        )
    if rng.rand() < flip_prob:
        image, keypoints, boxes, masks = hflip(
            image, keypoints, boxes, masks
        )
    image = color_jitter(rng, image)
    return resize_to(image, keypoints, boxes, target, masks)
