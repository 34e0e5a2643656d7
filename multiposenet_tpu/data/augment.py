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
    image: np.ndarray, keypoints: np.ndarray, boxes: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Horizontal flip with the COCO L/R keypoint index swap."""
    w = image.shape[1]
    image = image[:, ::-1]
    keypoints = keypoints.copy()
    keypoints[..., 0] = np.where(
        keypoints[..., 2] > 0, (w - 1) - keypoints[..., 0], keypoints[..., 0]
    )
    keypoints = keypoints[:, FLIP_PERMUTATION]
    boxes = boxes.copy()
    x0 = boxes[:, 1].copy()
    boxes[:, 1] = (w - 1) - boxes[:, 3]
    boxes[:, 3] = (w - 1) - x0
    return np.ascontiguousarray(image), keypoints, boxes


def random_crop(
    rng: np.random.RandomState,
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    min_fraction: float = 0.6,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random crop keeping annotations consistent; keypoints falling outside
    the crop get v=0 (treated as unlabeled, exactly like occluded GT)."""
    h, w = image.shape[:2]
    ch = int(h * rng.uniform(min_fraction, 1.0))
    cw = int(w * rng.uniform(min_fraction, 1.0))
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    image = image[y0 : y0 + ch, x0 : x0 + cw]

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
    return np.ascontiguousarray(image), keypoints, boxes


def color_jitter(
    rng: np.random.RandomState,
    image: np.ndarray,
    brightness: float = 0.25,
    contrast: float = 0.25,
) -> np.ndarray:
    """Brightness/contrast jitter on uint8 pixels."""
    img = image.astype(np.float32)
    img = img * rng.uniform(1 - contrast, 1 + contrast)
    img = img + rng.uniform(-brightness, brightness) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def resize_to(
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    target: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Aspect-preserving resize + bottom/right zero pad to (target, target),
    matching ops.image.resize_pad_normalize's geometry so train and
    inference see identical coordinate conventions."""
    import cv2

    h, w = image.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((target, target, 3), image.dtype)
    out[:nh, :nw] = resized
    keypoints = keypoints.copy()
    keypoints[..., :2] *= scale
    boxes = boxes * scale
    return out, keypoints, boxes


def augment_record(
    rng: np.random.RandomState,
    image: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    target: int,
    flip_prob: float = 0.5,
    crop_prob: float = 0.7,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full training augmentation chain → fixed (target, target) image."""
    if rng.rand() < crop_prob:
        image, keypoints, boxes = random_crop(rng, image, keypoints, boxes)
    if rng.rand() < flip_prob:
        image, keypoints, boxes = hflip(image, keypoints, boxes)
    image = color_jitter(rng, image)
    return resize_to(image, keypoints, boxes, target)
