"""Offline shard prep round-trip + profiling utils."""

import tempfile

import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.data.prepare import read_shards, write_shards
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.utils import profiling


def test_shard_roundtrip_preserves_annotations():
    records = make_dataset(5, img_h=64, img_w=48, seed=0)
    with tempfile.TemporaryDirectory() as d:
        paths = write_shards(records, d, shard_size=2, max_persons=6)
        assert len(paths) == 3
        back = list(read_shards(d))
    assert len(back) == 5
    for orig, rec in zip(records, back):
        assert rec["image"].shape == orig["image"].shape
        # PNG is lossless → image bytes identical.
        np.testing.assert_array_equal(rec["image"], orig["image"])
        np.testing.assert_allclose(rec["keypoints"], orig["keypoints"])
        np.testing.assert_allclose(rec["boxes"], orig["boxes"])
        np.testing.assert_array_equal(rec["iscrowd"], orig["iscrowd"])


def test_timeit_and_fence():
    x = jnp.ones((64, 64))

    def step():
        return x @ x

    sec = profiling.timeit(step, n_iters=3, n_warmup=1, n_repeats=2)
    assert sec > 0


def test_find_nans():
    tree = {
        "good": np.ones(3, np.float32),
        "bad": np.asarray([1.0, np.nan], np.float32),
        "ints": np.ones(2, np.int32),
    }
    bad = profiling.find_nans(tree)
    assert len(bad) == 1 and "bad" in bad[0]
