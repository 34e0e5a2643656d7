"""Data pipeline tests: COCO JSON reader, augmentations, loader."""

import json
import tempfile

import numpy as np

from multiposenet_tpu.data import augment as aug
from multiposenet_tpu.data.coco import load_coco_keypoints, pad_record
from multiposenet_tpu.data.loader import batch_iterator, make_batch
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.utils.constants import FLIP_PERMUTATION


def _fake_coco_json(path):
    kp = [0] * 51
    kp[0:3] = [100, 50, 2]   # nose at (100, 50) visible
    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": 200, "width": 300},
            {"id": 2, "file_name": "b.jpg", "height": 100, "width": 100},
            {"id": 3, "file_name": "c.jpg", "height": 64, "width": 64},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1,
             "bbox": [90.0, 40.0, 60.0, 80.0], "keypoints": kp,
             "iscrowd": 0, "area": 4800.0},
            {"id": 11, "image_id": 1, "category_id": 1,
             "bbox": [0.0, 0.0, 30.0, 30.0],
             "keypoints": [0] * 51, "iscrowd": 1, "area": 900.0},
            {"id": 12, "image_id": 2, "category_id": 18,  # not a person
             "bbox": [0, 0, 10, 10], "keypoints": [0] * 51,
             "iscrowd": 0, "area": 100.0},
        ],
    }
    path.write_text(json.dumps(data))


def test_coco_reader_parses_and_filters():
    with tempfile.TemporaryDirectory() as d:
        from pathlib import Path

        p = Path(d) / "ann.json"
        _fake_coco_json(p)
        records = load_coco_keypoints(p)
    # Image 2's only annotation is non-person; image 3 has none → only 1.
    assert len(records) == 1
    r = records[0]
    assert r["id"] == 1 and r["file_name"] == "a.jpg"
    assert r["keypoints"].shape == (2, 17, 3)
    # bbox xywh [90, 40, 60, 80] → (y0, x0, y1, x1) = (40, 90, 120, 150).
    np.testing.assert_allclose(r["boxes"][0], [40, 90, 120, 150])
    assert r["iscrowd"].tolist() == [False, True]


def test_pad_record_prefers_noncrowd_and_masks():
    rec = {
        "keypoints": np.ones((3, 17, 3), np.float32),
        "boxes": np.arange(12, dtype=np.float32).reshape(3, 4),
        "iscrowd": np.asarray([True, False, False]),
    }
    padded = pad_record(rec, max_persons=2)
    # Truncation keeps the two non-crowd persons (indices 1, 2).
    np.testing.assert_allclose(padded["boxes"][0], rec["boxes"][1])
    np.testing.assert_allclose(padded["boxes"][1], rec["boxes"][2])
    assert padded["valid"].tolist() == [True, True]
    padded4 = pad_record(rec, max_persons=4)
    assert padded4["valid"].tolist() == [True, True, True, False]


def test_hflip_swaps_lr_keypoints_and_boxes():
    img = np.zeros((10, 20, 3), np.uint8)
    img[:, 0] = 255  # left column marked
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 1] = [5.0, 2.0, 2.0]   # left_eye
    kps[0, 2] = [15.0, 2.0, 2.0]  # right_eye
    boxes = np.asarray([[0.0, 2.0, 8.0, 10.0]], np.float32)
    fimg, fkps, fboxes, _ = aug.hflip(img, kps, boxes)
    assert fimg[0, -1, 0] == 255  # marked column moved to the right
    # left_eye slot now holds the flipped right_eye coords: (20-1) - 15 = 4.
    np.testing.assert_allclose(fkps[0, 1, :2], [4.0, 2.0])
    np.testing.assert_allclose(fkps[0, 2, :2], [14.0, 2.0])
    np.testing.assert_allclose(fboxes[0], [0.0, 9.0, 8.0, 17.0])


def test_hflip_involution():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 24, 3), np.uint8)
    kps = rng.rand(2, 17, 3).astype(np.float32) * 10
    kps[..., 2] = 2.0
    boxes = np.asarray([[1, 2, 10, 20], [0, 0, 5, 5]], np.float32)
    i2, k2, b2, _ = aug.hflip(*aug.hflip(img, kps, boxes)[:3])
    np.testing.assert_array_equal(i2, img)
    np.testing.assert_allclose(k2, kps, atol=1e-5)
    np.testing.assert_allclose(b2, boxes, atol=1e-5)


def test_random_crop_marks_outside_keypoints_invisible():
    rng = np.random.RandomState(3)
    img = np.zeros((100, 100, 3), np.uint8)
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 0] = [95.0, 95.0, 2.0]  # near bottom-right corner
    kps[0, 1] = [50.0, 50.0, 2.0]  # center
    boxes = np.asarray([[40, 40, 99, 99]], np.float32)
    found_invisible = False
    for _ in range(20):
        _, k, _, _ = aug.random_crop(rng, img, kps, boxes,
                                     min_fraction=0.5)
        if k[0, 0, 2] == 0.0:
            found_invisible = True
        # Center keypoint coords stay consistent when visible.
        if k[0, 1, 2] > 0:
            assert 0 <= k[0, 1, 0] < 100 and 0 <= k[0, 1, 1] < 100
    assert found_invisible


def test_resize_to_geometry_matches_device_preprocess():
    img = np.full((50, 100, 3), 128, np.uint8)
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 0] = [100.0, 50.0, 2.0]
    boxes = np.asarray([[0, 0, 50, 100]], np.float32)
    out, k, b, _ = aug.resize_to(img, kps, boxes, 128)
    assert out.shape == (128, 128, 3)
    scale = 128 / 100
    np.testing.assert_allclose(k[0, 0, :2], [100 * scale, 50 * scale])
    np.testing.assert_allclose(b[0], boxes[0] * scale)
    # Padding rows are zero.
    assert (out[int(round(50 * scale)) :] == 0).all()


def test_batch_iterator_shapes_and_determinism():
    records = make_dataset(6, img_h=96, img_w=80, seed=1)
    b1 = list(batch_iterator(records, 2, 64, 4, seed=7, train=False))
    b2 = list(batch_iterator(records, 2, 64, 4, seed=7, train=False))
    assert len(b1) == 3
    for x, y in zip(b1, b2):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
    assert b1[0]["images"].shape == (2, 64, 64, 3)
    assert b1[0]["keypoints"].shape == (2, 4, 17, 3)


def test_make_batch_train_augments_deterministically():
    records = make_dataset(2, img_h=96, img_w=96, seed=2)
    rng1 = np.random.RandomState(5)
    rng2 = np.random.RandomState(5)
    a = make_batch(records, 64, 4, rng=rng1, train=True)
    b = make_batch(records, 64, 4, rng=rng2, train=True)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])


def test_min_side_resize_mode():
    """Opt-in min-side mode (the reference's convention): scale by the
    short side, crop the long side, invalidate cropped-out keypoints."""
    img = np.full((50, 100, 3), 128, np.uint8)
    kps = np.zeros((2, 17, 3), np.float32)
    kps[0, 0] = [10.0, 25.0, 2.0]    # stays visible
    kps[1, 0] = [90.0, 25.0, 2.0]    # cropped away (x*scale > 127)
    boxes = np.asarray([[0, 0, 50, 40], [0, 60, 50, 100]], np.float32)
    out, k, b, _ = aug.resize_to(img, kps, boxes, 128, mode="min_side")
    scale = 128 / 50
    assert out.shape == (128, 128, 3)
    np.testing.assert_allclose(k[0, 0, :2], [10 * scale, 25 * scale])
    assert k[0, 0, 2] == 2.0
    assert k[1, 0, 2] == 0.0
    assert b[1, 3] == 127.0  # box clipped at the crop edge


def test_color_jitter_hue_saturation_changes_chroma():
    rng = np.random.RandomState(5)
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 200  # saturated red
    out = aug.color_jitter(rng, img, brightness=0.0, contrast=0.0,
                           hue=0.2, saturation=0.5)
    assert out.shape == img.shape
    # Some chroma change must have happened (hue rotation or saturation).
    assert not np.array_equal(out, img)
