"""Synthetic multi-person fixtures: images + COCO-style annotations.

Reference counterpart: the reference's de-facto smoke fixtures were a
handful of JPEGs in notebooks (SURVEY.md §4). This environment has no COCO
data or network (SURVEY.md §7: "Training configs must support
synthetic/fixture data"), so this module synthesizes deterministic
multi-person scenes: stick-figure-ish keypoint layouts with Gaussian blob
rendering, returning both the image and exact GT — enough for integration
tests, PRN training, and benchmarks (BASELINE.json config 4 needs ≥8-person
images).
"""

from __future__ import annotations

import numpy as np

from multiposenet_tpu.utils.constants import NUM_KEYPOINTS

# Canonical upright-person keypoint template in a unit box (x, y in [0, 1]).
_TEMPLATE = np.array([
    [0.50, 0.08],  # nose
    [0.46, 0.06], [0.54, 0.06],   # eyes
    [0.42, 0.08], [0.58, 0.08],   # ears
    [0.35, 0.22], [0.65, 0.22],   # shoulders
    [0.28, 0.40], [0.72, 0.40],   # elbows
    [0.24, 0.56], [0.76, 0.56],   # wrists
    [0.40, 0.55], [0.60, 0.55],   # hips
    [0.38, 0.75], [0.62, 0.75],   # knees
    [0.37, 0.95], [0.63, 0.95],   # ankles
], dtype=np.float32)


def synth_person(
    rng: np.random.RandomState,
    img_h: int,
    img_w: int,
    min_size: float = 0.2,
    max_size: float = 0.6,
) -> tuple[np.ndarray, np.ndarray]:
    """One random person → (keypoints[17, 3], box[4] (y0,x0,y1,x1))."""
    ph = rng.uniform(min_size, max_size) * img_h
    pw = ph * rng.uniform(0.4, 0.6)
    y0 = rng.uniform(0, max(img_h - ph, 1))
    x0 = rng.uniform(0, max(img_w - pw, 1))
    jitter = rng.normal(0, 0.015, _TEMPLATE.shape).astype(np.float32)
    pts = np.clip(_TEMPLATE + jitter, 0.0, 1.0)
    kx = x0 + pts[:, 0] * pw
    ky = y0 + pts[:, 1] * ph
    vis = np.full((NUM_KEYPOINTS,), 2.0, np.float32)
    # Randomly hide a couple of keypoints (v=0, like unlabeled).
    hide = rng.rand(NUM_KEYPOINTS) < 0.1
    vis[hide] = 0.0
    kps = np.stack([kx, ky, vis], axis=-1).astype(np.float32)
    box = np.asarray([y0, x0, y0 + ph, x0 + pw], np.float32)
    return kps, box


def render_scene(
    keypoints: np.ndarray, img_h: int, img_w: int, blob_sigma: float = 3.0
) -> np.ndarray:
    """Render persons as bright keypoint blobs on noise → uint8 [H, W, 3].

    The blobs make the scene learnable end-to-end: a trained network can
    locate keypoints, and tests can assert decoded peaks near GT.
    """
    yy, xx = np.mgrid[0:img_h, 0:img_w].astype(np.float32)
    canvas = np.zeros((img_h, img_w, 3), np.float32)
    for person in keypoints:
        for c, (x, y, v) in enumerate(person):
            if v <= 0:
                continue
            g = np.exp(
                -((yy - y) ** 2 + (xx - x) ** 2) / (2 * blob_sigma**2)
            )
            canvas[..., c % 3] = np.maximum(canvas[..., c % 3], g)
    img = canvas * 200.0 + 20.0
    return np.clip(img, 0, 255).astype(np.uint8)


def make_dataset(
    num_images: int,
    img_h: int = 256,
    img_w: int = 256,
    min_persons: int = 1,
    max_persons: int = 4,
    seed: int = 0,
) -> list[dict]:
    """Deterministic synthetic dataset in the coco.py record layout."""
    rng = np.random.RandomState(seed)
    records = []
    for i in range(num_images):
        n = rng.randint(min_persons, max_persons + 1)
        kps, boxes = [], []
        for _ in range(n):
            k, b = synth_person(rng, img_h, img_w)
            kps.append(k)
            boxes.append(b)
        kps = np.asarray(kps, np.float32)
        boxes = np.asarray(boxes, np.float32)
        records.append({
            "id": i,
            "file_name": f"synthetic_{i:06d}.png",
            "height": img_h,
            "width": img_w,
            "keypoints": kps,
            "boxes": boxes,
            "iscrowd": np.zeros((n,), bool),
            "area": (
                (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            ).astype(np.float32),
            "image": render_scene(kps, img_h, img_w),
        })
    return records
