"""Data-parallel sharding over 8 virtual devices (SURVEY.md §4: exercise the
DP mesh/sharding path without a TPU slice)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import (
    Config, DecodeConfig, DetectorConfig, ModelConfig, PRNConfig,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.parallel import mesh as mesh_lib


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_shardings():
    mesh = mesh_lib.make_mesh()
    assert mesh.shape == {"data": 8}
    x = np.zeros((16, 4), np.float32)
    sharded = mesh_lib.shard_batch(x, mesh)
    # Each device holds 16/8 = 2 rows.
    assert sharded.sharding.shard_shape(sharded.shape) == (2, 4)
    r = mesh_lib.replicate(x, mesh)
    assert r.sharding.shard_shape(r.shape) == (16, 4)


def _tiny_predictor():
    cfg = Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        ),
        detector=DetectorConfig(score_threshold=0.0, max_detections=8,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32),
        decode=DecodeConfig(max_peaks_per_channel=4),
    )
    return Predictor(config=cfg, image_size=128)


def test_sharded_batch_inference_matches_single_device():
    pred = _tiny_predictor()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (8, 128, 128, 3), dtype=np.uint8)

    run = pred.make_batch_runner()
    out = run(images)
    # Batch dim sharded 8-way.
    assert out["keypoints"].shape == (8, 8, 17, 3)
    assert out["boxes"].shape == (8, 8, 4)
    shard_shape = out["boxes"].sharding.shard_shape(out["boxes"].shape)
    assert shard_shape[0] == 1

    # Parity with the unsharded path on one image.
    single = pred._batch_forward_impl(
        pred.variables, pred.prn_variables, jnp.asarray(images[:1])
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes"])[0], np.asarray(single["boxes"])[0],
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["keypoints"])[0],
        np.asarray(single["keypoints"])[0],
        rtol=1e-4, atol=1e-3,
    )


@pytest.mark.slow  # fold-norm parity also covered by test_models fold tests (fast)
def test_batch_runner_fold_input_norm():
    """The DP-sharded batched path with fold_input_norm (raw uint8 pixels
    into the folded stem) runs under an 8-device mesh and matches the
    unsharded single-device forward."""
    import dataclasses

    import jax
    import numpy as np

    from multiposenet_tpu.config import (Config, DecodeConfig,
                                         DetectorConfig, ModelConfig,
                                         PRNConfig, TrainConfig)
    from multiposenet_tpu.infer.predictor import Predictor
    from multiposenet_tpu.parallel import mesh as mesh_lib

    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32, fold_input_norm=True),
        detector=DetectorConfig(pre_nms_top_k=64, max_detections=4,
                                score_threshold=0.0),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32,
                      max_persons=4),
        decode=DecodeConfig(max_peaks_per_channel=4),
        train=TrainConfig(image_size=64, batch_size=8),
    )
    predictor = Predictor(config=cfg, image_size=64,
                          use_pallas_decode=False)
    mesh = mesh_lib.make_mesh()
    run = predictor.make_batch_runner(mesh)
    images = np.random.RandomState(0).randint(
        0, 255, (8, 64, 64, 3), dtype=np.uint8
    )
    out = run(images)
    single = predictor._batch_forward_impl(
        predictor.variables, predictor.prn_variables,
        jax.numpy.asarray(images),
    )
    np.testing.assert_allclose(
        np.asarray(out["keypoints"]), np.asarray(single["keypoints"]),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow  # shipped-layout parity; basic sharded-vs-single parity stays fast
def test_shipped_layouts_sharded_parity():
    """VERDICT r3 #6: the fast() operating point's inference layouts —
    s4-flat host staging + the Pallas decode kernel (interpret mode off
    TPU) at a lane-aligned map size (512² image → 128² stride-4 maps) —
    under the 8-device mesh, sharded == single-device."""
    from multiposenet_tpu.config import TrainConfig
    from multiposenet_tpu.ops.image import space_to_depth_flat4

    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32, kp_head_convs=1,
                          kp_smooth_pyramid=False, kp_p2_late=True,
                          stem_stride=4, fold_input_norm=True,
                          backbone_max_channels=64),
        detector=DetectorConfig(pre_nms_top_k=64, max_detections=4,
                                score_threshold=0.0),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32,
                      max_persons=4),
        decode=DecodeConfig(max_peaks_per_channel=4),
        train=TrainConfig(image_size=512, batch_size=8),
    )
    predictor = Predictor(config=cfg, image_size=512,
                          use_pallas_decode=True, pallas_interpret=True)
    mesh = mesh_lib.make_mesh()
    staged = space_to_depth_flat4(
        np.random.RandomState(2).randint(
            0, 255, (8, 512, 512, 3), dtype=np.uint8
        )
    )
    out = predictor.make_batch_runner(mesh)(staged)
    single = predictor._batch_forward_impl(
        predictor.variables, predictor.prn_variables, jnp.asarray(staged)
    )
    kp_sh = np.asarray(out["keypoints"])
    kp_1 = np.asarray(single["keypoints"])
    assert np.isfinite(kp_sh).all()
    np.testing.assert_allclose(kp_sh, kp_1, rtol=1e-5, atol=1e-4)
