"""Batching data loader: records → padded fixed-shape NumPy batches.

Reference counterpart: the tf.data pipeline (SURVEY.md §2 "Input pipeline"
row: parse → decode → augment → batch → prefetch). Here the host does JPEG
decode + augmentation + padding on worker threads and hands the device a
dict of fixed-shape arrays; target heatmap generation moved on-device
(data/targets.py), so batches carry raw padded annotations, not heatmaps.

Batch layout (all fixed shapes):
    images:    uint8  [B, S, S, 3]
    keypoints: f32    [B, P, 17, 3]   (x, y, v) in model-input pixels
    boxes:     f32    [B, P, 4]       (y0, x0, y1, x1) model-input pixels
    iscrowd:   bool   [B, P]
    valid:     bool   [B, P]
plus, when records carry segmentation-derived masks (data/masks.py via
prepare.read_shards):
    exclude_cov: f32 [B, S/stride, S/stride]  crowd/unlabeled coverage
    person_cov:  f32 [B, S/stride, S/stride]  all-person coverage
    has_mask:    bool [B]                      image had real masks
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Iterator

import numpy as np

from multiposenet_tpu.data import augment as aug
from multiposenet_tpu.data.coco import pad_record
from multiposenet_tpu.utils.constants import NUM_KEYPOINTS


def load_image(record: dict, image_dir: str | None) -> np.ndarray:
    """Record → uint8 RGB array. Synthetic records embed the image; COCO
    records reference a file under image_dir."""
    if "image" in record:
        return record["image"]
    if image_dir is None:
        raise ValueError("record has no embedded image and image_dir unset")
    import cv2

    path = str(Path(image_dir) / record["file_name"])
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return np.ascontiguousarray(bgr[:, :, ::-1])


def make_batch(
    records: list[dict],
    image_size: int,
    max_persons: int,
    rng: np.random.RandomState | None = None,
    image_dir: str | None = None,
    train: bool = True,
    mask_stride: int = 4,
) -> dict[str, np.ndarray]:
    """Assemble one fixed-shape batch from records (augment iff train).

    When any record carries segmentation-derived masks ("exclude_mask" /
    "person_mask" bool arrays from prepare.read_shards), the batch gains
    float coverage maps at heatmap resolution — transformed through the
    SAME augmentation chain as the image — plus a per-image has_mask flag
    (images without real masks keep the on-device box-union fallback).
    """
    import cv2

    b = len(records)
    hm = image_size // mask_stride
    with_masks = any(r.get("exclude_mask") is not None
                     or r.get("person_mask") is not None for r in records)
    images = np.zeros((b, image_size, image_size, 3), np.uint8)
    keypoints = np.zeros((b, max_persons, NUM_KEYPOINTS, 3), np.float32)
    boxes = np.zeros((b, max_persons, 4), np.float32)
    iscrowd = np.zeros((b, max_persons), bool)
    valid = np.zeros((b, max_persons), bool)
    if with_masks:
        exclude_cov = np.zeros((b, hm, hm), np.float32)
        person_cov = np.zeros((b, hm, hm), np.float32)
        has_mask = np.zeros((b,), bool)

    for i, rec in enumerate(records):
        img = load_image(rec, image_dir)
        kps, bxs = rec["keypoints"], rec["boxes"]
        masks = None
        if with_masks and (rec.get("exclude_mask") is not None
                           or rec.get("person_mask") is not None):
            h, w = img.shape[:2]
            zero = np.zeros((h, w), np.float32)
            exc = rec.get("exclude_mask")
            per = rec.get("person_mask")
            masks = np.stack([
                zero if exc is None else exc.astype(np.float32),
                zero if per is None else per.astype(np.float32),
            ], axis=-1)
            has_mask[i] = True
        if train and rng is not None:
            img, kps, bxs, masks = aug.augment_record(
                rng, img, kps, bxs, image_size, masks
            )
        else:
            img, kps, bxs, masks = aug.resize_to(
                img, kps, bxs, image_size, masks
            )
        images[i] = img
        if masks is not None:
            cov = cv2.resize(masks, (hm, hm),
                             interpolation=cv2.INTER_AREA)
            exclude_cov[i] = cov[..., 0]
            person_cov[i] = cov[..., 1]
        padded = pad_record(
            {"keypoints": kps, "boxes": bxs, "iscrowd": rec["iscrowd"]},
            max_persons,
        )
        keypoints[i] = padded["keypoints"]
        boxes[i] = padded["boxes"]
        iscrowd[i] = padded["iscrowd"]
        valid[i] = padded["valid"]
    out = {
        "images": images,
        "keypoints": keypoints,
        "boxes": boxes,
        "iscrowd": iscrowd,
        "valid": valid,
    }
    if with_masks:
        out["exclude_cov"] = exclude_cov
        out["person_cov"] = person_cov
        out["has_mask"] = has_mask
    return out


def batch_iterator(
    records: list[dict],
    batch_size: int,
    image_size: int,
    max_persons: int,
    seed: int = 0,
    image_dir: str | None = None,
    train: bool = True,
    augment: bool | None = None,
    prefetch: int = 2,
    mask_stride: int = 4,
) -> Iterator[dict[str, np.ndarray]]:
    """Infinite (train) or single-pass (eval) prefetching batch iterator.

    `augment` defaults to `train`; pass augment=False with train=True for
    an infinite shuffled loop WITHOUT augmentation (e.g. overfit smokes).
    `mask_stride` must equal the model's output_stride so the coverage
    maps land at heatmap-loss resolution (callers pass
    config.model.output_stride).
    """
    if augment is None:
        augment = train
    rng = np.random.RandomState(seed)

    def gen():
        if train:
            while True:
                idx = rng.permutation(len(records))
                for s in range(0, len(idx) - batch_size + 1, batch_size):
                    yield [records[j] for j in idx[s : s + batch_size]]
        else:
            for s in range(0, len(records), batch_size):
                chunk = [records[j] for j in
                         range(s, min(s + batch_size, len(records)))]
                # Pad the final eval batch by repeating the last record;
                # callers track true counts.
                while len(chunk) < batch_size:
                    chunk.append(chunk[-1])
                yield chunk

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        wrng = np.random.RandomState(seed + 1)
        for chunk in gen():
            q.put(
                make_batch(chunk, image_size, max_persons,
                           rng=wrng if augment else None,
                           image_dir=image_dir, train=augment,
                           mask_stride=mask_stride)
            )
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
