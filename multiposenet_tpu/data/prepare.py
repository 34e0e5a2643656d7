"""Offline data preparation: COCO JSON + images → packed npz shards.

Reference counterpart: `create_tfrecords.py` (SURVEY.md §2 "Data prep" row,
§3.1): the reference serializes image bytes + keypoints + boxes + crowd
flags into sharded tfrecords once, offline. The TPU-native equivalent packs
the same fields into sharded compressed .npz files (no TF dependency):
images stay JPEG-encoded bytes (decoded on loader worker threads), and
annotations are stored padded to fixed shapes so shards are directly
mmap-friendly.

Shard layout (npz keys), N records per shard:
    image_bytes:  object array [N] of encoded JPEG/PNG bytes
    file_name:    object array [N]
    height/width: int32 [N]
    keypoints:    float32 [N, P, 17, 3]
    boxes:        float32 [N, P, 4]
    iscrowd:      bool [N, P]
    valid:        bool [N, P]
    area:         float32 [N, P]
    exclude_mask: object array [N] of PNG bytes (or b"") — union of
                  crowd/unlabeled-person segmentations (data/masks.py)
    person_mask:  object array [N] of PNG bytes (or b"") — union of all
                  person segmentations (aux seg-head target)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from multiposenet_tpu.data.coco import load_coco_keypoints, pad_record
from multiposenet_tpu.data.masks import region_masks
from multiposenet_tpu.utils.constants import NUM_KEYPOINTS


def write_shards(
    records: Sequence[dict],
    output_dir: str | Path,
    image_dir: str | Path | None = None,
    shard_size: int = 1024,
    max_persons: int = 32,
) -> list[Path]:
    """Pack records into npz shards; returns the shard paths.

    Synthetic records (with an embedded 'image') are PNG-encoded; COCO
    records read the original encoded bytes straight from disk (no
    re-encode, like the reference).
    """
    import cv2

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for s in range(0, len(records), shard_size):
        chunk = records[s : s + shard_size]
        n = len(chunk)
        image_bytes = np.empty(n, dtype=object)
        file_name = np.empty(n, dtype=object)
        height = np.zeros(n, np.int32)
        width = np.zeros(n, np.int32)
        keypoints = np.zeros((n, max_persons, NUM_KEYPOINTS, 3), np.float32)
        boxes = np.zeros((n, max_persons, 4), np.float32)
        iscrowd = np.zeros((n, max_persons), bool)
        valid = np.zeros((n, max_persons), bool)
        area = np.zeros((n, max_persons), np.float32)
        exclude_mask = np.empty(n, dtype=object)
        person_mask = np.empty(n, dtype=object)

        def encode_mask(m):
            if m is None or not m.any():
                return b""
            ok, buf = cv2.imencode(".png", m.astype(np.uint8) * 255)
            assert ok
            return buf.tobytes()

        for i, rec in enumerate(chunk):
            if "image" in rec:
                ok, buf = cv2.imencode(
                    ".png", np.ascontiguousarray(rec["image"][:, :, ::-1])
                )
                assert ok
                image_bytes[i] = buf.tobytes()
            else:
                if image_dir is None:
                    raise ValueError(
                        "records reference files; image_dir required"
                    )
                image_bytes[i] = (
                    Path(image_dir) / rec["file_name"]
                ).read_bytes()
            file_name[i] = rec["file_name"]
            height[i] = rec["height"]
            width[i] = rec["width"]
            padded = pad_record(rec, max_persons)
            keypoints[i] = padded["keypoints"]
            boxes[i] = padded["boxes"]
            iscrowd[i] = padded["iscrowd"]
            valid[i] = padded["valid"]
            p = min(len(rec["area"]), max_persons)
            area[i, :p] = rec["area"][:p]
            if rec.get("segmentation"):
                exc, per = region_masks(
                    rec["segmentation"], rec["iscrowd"],
                    rec["keypoints"], rec["boxes"],
                    rec["height"], rec["width"],
                )
                exclude_mask[i] = encode_mask(exc)
                person_mask[i] = encode_mask(per)
            else:
                exclude_mask[i] = b""
                person_mask[i] = b""

        path = output_dir / f"shard-{s // shard_size:05d}.npz"
        np.savez_compressed(
            path,
            image_bytes=image_bytes,
            file_name=file_name,
            height=height,
            width=width,
            keypoints=keypoints,
            boxes=boxes,
            iscrowd=iscrowd,
            valid=valid,
            area=area,
            exclude_mask=exclude_mask,
            person_mask=person_mask,
        )
        paths.append(path)
    return paths


def read_shards(directory: str | Path) -> Iterator[dict]:
    """Yield records (coco.py layout + encoded bytes) from npz shards."""
    import cv2

    for path in sorted(Path(directory).glob("shard-*.npz")):
        shard = np.load(path, allow_pickle=True)
        n = len(shard["height"])
        has_masks = "exclude_mask" in shard

        def decode_mask(buf):
            if not buf:
                return None
            m = cv2.imdecode(np.frombuffer(buf, np.uint8),
                             cv2.IMREAD_GRAYSCALE)
            return m > 127

        for i in range(n):
            v = shard["valid"][i]
            raw = np.frombuffer(shard["image_bytes"][i], np.uint8)
            bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
            rec = {
                "id": i,
                "file_name": str(shard["file_name"][i]),
                "height": int(shard["height"][i]),
                "width": int(shard["width"][i]),
                "keypoints": shard["keypoints"][i][v],
                "boxes": shard["boxes"][i][v],
                "iscrowd": shard["iscrowd"][i][v],
                "area": shard["area"][i][v],
                "image": np.ascontiguousarray(bgr[:, :, ::-1]),
            }
            if has_masks:
                rec["exclude_mask"] = decode_mask(shard["exclude_mask"][i])
                rec["person_mask"] = decode_mask(shard["person_mask"][i])
            yield rec


def prepare_coco(
    annotations_path: str | Path,
    image_dir: str | Path,
    output_dir: str | Path,
    shard_size: int = 1024,
    max_persons: int = 32,
) -> list[Path]:
    """One-call COCO → shards (the reference's create_tfrecords main)."""
    records = load_coco_keypoints(annotations_path)
    return write_shards(
        records, output_dir, image_dir=image_dir, shard_size=shard_size,
        max_persons=max_persons,
    )
