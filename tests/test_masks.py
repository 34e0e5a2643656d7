"""COCO segmentation decoding (data/masks.py): RLE (both encodings),
polygons, per-image region unions, shard round-trip, and the device-side
loss-mask combination (SURVEY.md §2 Data-prep/Input-pipeline rows)."""

import numpy as np
import pytest

from multiposenet_tpu.data import masks as masks_lib


def test_uncompressed_rle_hand_case():
    # 3x4 mask, column-major runs: start with 2 zeros, 3 ones, ...
    # flat (F order, 12 cells): [0,0,1,1,1,0,0,0,0,1,1,1]
    m = masks_lib.rle_counts_to_mask([2, 3, 4, 3], 3, 4)
    want = np.array(
        [0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1], bool
    ).reshape((3, 4), order="F")
    np.testing.assert_array_equal(m, want)


def test_rle_counts_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = rng.rand(17, 23) > 0.6
        counts = masks_lib.mask_to_rle_counts(mask)
        back = masks_lib.rle_counts_to_mask(counts, 17, 23)
        np.testing.assert_array_equal(back, mask)


def test_rle_counts_bad_total_raises():
    with pytest.raises(ValueError, match="counts sum"):
        masks_lib.rle_counts_to_mask([2, 3], 3, 4)


def test_compressed_rle_string_hand_case():
    """Hand-computed rleToString example: counts [6, 1, 40, 4, 5].

    Encoding (5 value bits/char, 0x20 continuation, +48 offset, deltas
    vs counts[i-2] from i=3): 6→'6'; 1→'1'; 40→(40&31|32)+48,40>>5=1→'X1';
    4-6=-2→sign-extended negative→'>'; 5-40=-35→two chars.
    """
    counts = [6, 1, 40, 4, 5]
    s = masks_lib.encode_rle_string(counts)
    assert masks_lib.decode_rle_string(s) == counts


def test_compressed_rle_string_roundtrip_random():
    rng = np.random.RandomState(1)
    for _ in range(10):
        n = rng.randint(1, 30)
        counts = rng.randint(0, 5000, n).tolist()
        s = masks_lib.encode_rle_string(counts)
        assert masks_lib.decode_rle_string(s) == counts


def test_compressed_rle_mask_roundtrip():
    rng = np.random.RandomState(2)
    mask = rng.rand(31, 19) > 0.5
    counts = masks_lib.mask_to_rle_counts(mask)
    seg = {"size": [31, 19],
           "counts": masks_lib.encode_rle_string(counts)}
    back = masks_lib.annotation_mask(seg, 31, 19)
    np.testing.assert_array_equal(back, mask)


def test_polygon_square():
    # Axis-aligned square [x0,y0 .. ] covering columns 2..5, rows 3..6.
    seg = [[2.0, 3.0, 5.0, 3.0, 5.0, 6.0, 2.0, 6.0]]
    m = masks_lib.polygons_to_mask(seg, 10, 10)
    assert m[4, 3]
    assert m[3, 2] and m[6, 5]  # corners inclusive
    assert not m[0, 0] and not m[9, 9]
    assert not m[2, 2] and not m[7, 5]  # just outside


def test_annotation_mask_none_for_empty():
    assert masks_lib.annotation_mask(None, 4, 4) is None
    assert masks_lib.annotation_mask([], 4, 4) is None


def test_region_masks_box_fallback_and_unions():
    h = w = 20
    # Person 0: polygon square, crowd → exclude + person.
    # Person 1: no segmentation, labeled keypoints → box → person only.
    # Person 2: no segmentation, zero labeled keypoints → box → both.
    segs = [[[1.0, 1.0, 4.0, 1.0, 4.0, 4.0, 1.0, 4.0]], None, None]
    iscrowd = np.array([True, False, False])
    kps = np.zeros((3, 17, 3), np.float32)
    kps[1, :, 2] = 2.0
    boxes = np.array([
        [1, 1, 4, 4],
        [10, 10, 13, 14],
        [16, 2, 18, 6],
    ], np.float32)
    exc, per = masks_lib.region_masks(segs, iscrowd, kps, boxes, h, w)
    assert per[2, 2] and exc[2, 2]            # crowd polygon
    assert per[11, 12] and not exc[11, 12]    # labeled person's box
    assert per[17, 4] and exc[17, 4]          # unlabeled person's box
    assert not per[8, 8] and not exc[8, 8]


def test_shard_roundtrip_with_masks(tmp_path):
    from multiposenet_tpu.data import prepare
    from multiposenet_tpu.data.synthetic import make_dataset

    records = make_dataset(3, img_h=48, img_w=40, seed=0)
    # Attach a crowd person with an RLE segmentation to record 0.
    rec = records[0]
    mask = np.zeros((48, 40), bool)
    mask[5:15, 8:20] = True
    seg = {"size": [48, 40], "counts": masks_lib.encode_rle_string(
        masks_lib.mask_to_rle_counts(mask))}
    n = len(rec["boxes"])
    rec["segmentation"] = [None] * n + [seg]
    rec["keypoints"] = np.concatenate(
        [rec["keypoints"], np.zeros((1, 17, 3), np.float32)]
    )
    rec["boxes"] = np.concatenate(
        [rec["boxes"], np.asarray([[5, 8, 15, 20]], np.float32)]
    )
    rec["iscrowd"] = np.concatenate([rec["iscrowd"], [True]])
    rec["area"] = np.concatenate([rec["area"], [120.0]])

    prepare.write_shards(records, tmp_path, shard_size=2, max_persons=8)
    out = list(prepare.read_shards(tmp_path))
    assert len(out) == 3
    r0 = out[0]
    assert r0["exclude_mask"] is not None
    assert r0["exclude_mask"][10, 10] and not r0["exclude_mask"][0, 0]
    # Person mask covers the crowd seg AND every (box-fallback) person.
    assert r0["person_mask"][10, 10]


def test_batch_coverage_and_device_mask():
    """Coverage maps ride the loader and override the box-union mask on
    device only where has_mask is set."""
    import jax.numpy as jnp

    from multiposenet_tpu.config import Config, ModelConfig, TrainConfig
    from multiposenet_tpu.data.loader import make_batch
    from multiposenet_tpu.data.synthetic import make_dataset
    from multiposenet_tpu.train.steps import _device_targets

    size = 64
    records = make_dataset(2, img_h=size, img_w=size, seed=3)
    mask = np.zeros((size, size), bool)
    mask[0:32, 0:32] = True
    records[0]["exclude_mask"] = mask
    records[0]["person_mask"] = mask

    batch = make_batch(records, size, max_persons=6, train=False)
    assert batch["exclude_cov"].shape == (2, 16, 16)
    assert batch["has_mask"].tolist() == [True, False]
    np.testing.assert_allclose(batch["exclude_cov"][0, :8, :8], 1.0)
    np.testing.assert_allclose(batch["exclude_cov"][0, 8:, 8:], 0.0)

    cfg = Config(train=TrainConfig(image_size=size))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    _, loss_mask, seg, _, _ = _device_targets(batch_j, cfg)
    # Image 0: mask-driven — excluded quadrant zeroed, elsewhere 1.
    np.testing.assert_allclose(np.asarray(loss_mask)[0, :8, :8, 0], 0.0)
    np.testing.assert_allclose(np.asarray(loss_mask)[0, 8:, 8:, 0], 1.0)
    np.testing.assert_allclose(np.asarray(seg)[0, :8, :8, 0], 1.0)
    # Image 1: no real mask → box-union fallback (no crowd → all ones).
    np.testing.assert_allclose(np.asarray(loss_mask)[1, ..., 0], 1.0)
