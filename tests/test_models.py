"""Shape/dtype/jit invariance tests for the model stack (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiposenet_tpu.config import Config, ModelConfig
from multiposenet_tpu.models.fpn import FPN, nearest_upsample_2x
from multiposenet_tpu.models.keypoint_head import KeypointHead
from multiposenet_tpu.models.mobilenet import MobileNetV1
from multiposenet_tpu.models.posenet import MultiPoseNet
from multiposenet_tpu.models.prn import PRN

SIZE = 128  # small image keeps CPU tests fast; strides still exact


def test_nearest_upsample_2x():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    up = nearest_upsample_2x(x)
    assert up.shape == (2, 6, 8, 5)
    np.testing.assert_array_equal(np.asarray(up)[:, ::2, ::2], np.asarray(x))
    np.testing.assert_array_equal(np.asarray(up)[:, 1::2, 1::2], np.asarray(x))


def test_backbone_feature_strides():
    model = MobileNetV1(width=0.25)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats["C2"].shape[1:3] == (SIZE // 4, SIZE // 4)
    assert feats["C3"].shape[1:3] == (SIZE // 8, SIZE // 8)
    assert feats["C4"].shape[1:3] == (SIZE // 16, SIZE // 16)
    assert feats["C5"].shape[1:3] == (SIZE // 32, SIZE // 32)


@pytest.mark.slow  # caps variant compile; stride/shape backbone tests stay fast
def test_backbone_stage_caps():
    """backbone_stage_caps caps channels per output-stride stage (after
    the width multiplier; backbone_max_channels still applies)."""
    model = MobileNetV1(width=0.75, max_channels=256,
                        stage_caps=(48, 128, 0, 0), stem_stride=4)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats["C2"].shape[-1] == 48     # 96 capped to 48
    assert feats["C3"].shape[-1] == 128    # 192 capped to 128
    assert feats["C4"].shape[-1] == 256    # max_channels cap only
    assert feats["C5"].shape[-1] == 256
    # Stage caps also hold under the stride-2 stem block layout.
    model2 = MobileNetV1(width=0.75, stage_caps=(48, 0, 0, 0))
    v2 = model2.init(jax.random.PRNGKey(0), x)
    f2 = model2.apply(v2, x)
    assert f2["C2"].shape[-1] == 48
    assert f2["C3"].shape[-1] == 192


def test_fpn_levels_and_width():
    feats = {
        "C2": jnp.zeros((1, 32, 32, 16)),
        "C3": jnp.zeros((1, 16, 16, 32)),
        "C4": jnp.zeros((1, 8, 8, 64)),
        "C5": jnp.zeros((1, 4, 4, 128)),
    }
    fpn = FPN(channels=64)
    variables = fpn.init(jax.random.PRNGKey(0), feats)
    p = fpn.apply(variables, feats)
    assert set(p) == {"P2", "P3", "P4", "P5", "P6", "P7",
                      "T2", "T3", "T4", "T5", "L2"}
    # Raw top-down maps share shape with their smoothed counterparts;
    # the pre-top-down C2 lateral shares T2's shape.
    assert p["T2"].shape == p["P2"].shape
    assert p["L2"].shape == p["T2"].shape
    assert p["P2"].shape == (1, 32, 32, 64)
    assert p["P5"].shape == (1, 4, 4, 64)
    assert p["P6"].shape == (1, 2, 2, 64)
    assert p["P7"].shape == (1, 1, 1, 64)


def test_keypoint_head_output():
    pyramid = {
        "P2": jnp.zeros((2, 32, 32, 64)),
        "P3": jnp.zeros((2, 16, 16, 64)),
        "P4": jnp.zeros((2, 8, 8, 64)),
        "P5": jnp.zeros((2, 4, 4, 64)),
    }
    head = KeypointHead(num_keypoints=17, channels=64)
    variables = head.init(jax.random.PRNGKey(0), pyramid)
    out = head.apply(variables, pyramid)
    assert out["heatmaps"].shape == (2, 32, 32, 17)
    assert out["segmentation"].shape == (2, 32, 32, 1)


def _tiny_config():
    return Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        )
    )


def test_posenet_joint_forward():
    cfg = _tiny_config()
    model = MultiPoseNet(config=cfg, with_detector=True)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["heatmaps"].shape == (1, SIZE // 4, SIZE // 4, 17)
    assert out["heatmaps"].dtype == jnp.float32
    det = out["detector"]
    assert set(det) == {"P3", "P4", "P5", "P6", "P7"}
    a = cfg.detector.num_scales * len(cfg.detector.aspect_ratios)
    assert det["P3"]["cls"].shape == (1, SIZE // 8, SIZE // 8, a)
    assert det["P3"]["box"].shape == (1, SIZE // 8, SIZE // 8, a * 4)


@pytest.mark.slow  # bf16 variant compile; f32 joint forward stays fast
def test_posenet_bf16_compute():
    cfg = Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32,
            compute_dtype="bfloat16",
        )
    )
    model = MultiPoseNet(config=cfg, with_detector=False)
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # Params stay fp32; outputs are cast back to fp32 for decode.
    assert out["heatmaps"].dtype == jnp.float32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.slow  # BN stats move during smoke-gate training too (fast)
def test_posenet_batchnorm_train_mode_updates_stats():
    cfg = _tiny_config()
    model = MultiPoseNet(config=cfg, with_detector=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_prn_shapes_and_softmax():
    prn = PRN(crop_height=28, crop_width=18, num_keypoints=17,
              hidden_units=64)
    crops = jax.random.normal(jax.random.PRNGKey(0), (4, 17, 28 * 18))
    variables = prn.init(jax.random.PRNGKey(1), crops)
    out = prn.apply(variables, crops)
    assert out.shape == (4, 17, 28 * 18)
    sums = np.asarray(out).sum(axis=2)  # per-channel spatial softmax
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_fold_input_norm_stem_parity():
    """fold_input_norm consumes RAW pixels; the stem conv output is
    EXACTLY the unfolded (normalize-then-conv) result everywhere except
    the SAME-pad bottom/right ring, where zero padding means raw-black
    instead of normalized-zero (both arbitrary out-of-image content; the
    deviation spreads spatially through downstream 3x3 convs, so parity
    is asserted at the stem where the contract is provable)."""
    from multiposenet_tpu.models.mobilenet import _S2DStemConv
    from multiposenet_tpu.ops.image import normalize

    img = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 64, 64, 3), dtype=np.uint8))
    m = _S2DStemConv(features=8)
    mf = _S2DStemConv(features=8, fold_norm=True)
    variables = m.init(jax.random.PRNGKey(0), normalize(img))
    a = np.asarray(m.apply(variables, normalize(img)))
    b = np.asarray(mf.apply(variables, img.astype(jnp.float32)))
    np.testing.assert_allclose(a[:, :-1, :-1], b[:, :-1, :-1],
                               rtol=1e-5, atol=1e-5)
    # And the ring genuinely differs (the documented deviation is real).
    assert np.abs(a[:, -1] - b[:, -1]).max() > 1e-3


def test_fold_input_norm_model_runs_raw():
    """Full model with fold_input_norm consumes raw uint8-ranged pixels
    and produces finite heatmaps of the right shape."""
    import dataclasses

    cfg = _tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                fold_input_norm=True))
    model = MultiPoseNet(config=cfg, with_detector=False)
    img = jnp.asarray(np.random.RandomState(1).randint(
        0, 255, (1, SIZE, SIZE, 3), dtype=np.uint8)).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    out = model.apply(variables, img, train=False)
    assert out["heatmaps"].shape == (1, SIZE // 4, SIZE // 4, 17)
    assert np.isfinite(np.asarray(out["heatmaps"])).all()


def test_p2_late_and_max_channels_variants():
    """Round-3 operating-point knobs: stride-8 keypoint head (kp_p2_late)
    and capped backbone tail widths keep the output contract."""
    import jax

    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import MultiPoseNet

    cfg = Config(model=ModelConfig(
        backbone_width=0.5, fpn_channels=32, head_channels=32,
        kp_head_convs=1, kp_p2_late=True, kp_smooth_pyramid=False,
        backbone_max_channels=128,
    ))
    model = MultiPoseNet(config=cfg, with_detector=True)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["heatmaps"].shape == (1, 32, 32, 17)
    # No P2 tower params in the late head.
    kp = variables["params"]["keypoint_head"]
    assert "tower_P2_conv0" not in kp
    assert "tower_P3_conv0" in kp
    # Backbone tail capped at 128 channels.
    bb = variables["params"]["backbone"]
    pw = bb["block_11"]["pointwise"]["conv"]["kernel"]
    assert pw.shape[-1] == 128


def test_s4_stem_exact_remap():
    """stem_stride=4: the double-s2d matmul stem is EXACTLY the 4x4/s4
    convolution (non-overlapping taps), from both raw images and
    host-staged s2d2x cells."""
    import jax

    from multiposenet_tpu.models.mobilenet import (
        space_to_depth_2x, stem_kernel_to_s4,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    k = jnp.asarray(rng.rand(4, 4, 3, 8).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
    )
    want = jax.lax.conv_general_dilated(x, k, (4, 4), "VALID",
                                        dimension_numbers=dn)
    cells = space_to_depth_2x(space_to_depth_2x(x))
    got = jnp.einsum("bhwc,co->bhwo", cells, stem_kernel_to_s4(k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s4_stem_model_shapes_and_fold_norm():
    """stem_stride=4 keeps the C2..C5 stride contract, and folding the
    input normalization into the s4 stem matches normalize-then-forward."""
    import jax

    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import MultiPoseNet
    from multiposenet_tpu.ops.image import normalize

    base = dict(backbone_width=0.25, fpn_channels=32, head_channels=32,
                kp_head_convs=1, stem_stride=4)
    cfg = Config(model=ModelConfig(**base))
    model = MultiPoseNet(config=cfg, with_detector=False)
    img = np.random.RandomState(1).randint(0, 255, (1, 64, 64, 3))
    x = np.asarray(normalize(jnp.asarray(img)))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    out = model.apply(variables, jnp.asarray(x), train=False)
    assert out["heatmaps"].shape == (1, 16, 16, 17)

    cfg_f = Config(model=ModelConfig(**base, fold_input_norm=True))
    model_f = MultiPoseNet(config=cfg_f, with_detector=False)
    out_f = model_f.apply(variables, jnp.asarray(img, np.float32),
                          train=False)
    np.testing.assert_allclose(
        np.asarray(out_f["heatmaps"]), np.asarray(out["heatmaps"]),
        rtol=2e-3, atol=2e-3,
    )


def test_native_cm_heatmaps_match_transpose():
    """The head's native channel-major output conv equals the NHWC output
    transposed (same kernel, different conv layout)."""
    import jax

    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import MultiPoseNet

    cfg = Config(model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                                   head_channels=32))
    model = MultiPoseNet(config=cfg, with_detector=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    want = np.transpose(np.asarray(out["heatmaps"]), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out["heatmaps_cm"]), want,
                               rtol=1e-5, atol=1e-5)


def test_p2_late_merged_upsample_matches_cm_transpose():
    """With kp_p2_late over raw T-maps, the merged-upsample stride-4 path
    (L2 + up(T3 + h8), models/keypoint_head.py) must still produce cm
    heatmaps equal to the NHWC output transposed (one add reassociation
    vs the two-broadcast form — tolerance, not bit-exact)."""
    import jax

    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import MultiPoseNet

    cfg = Config(model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                                   head_channels=32, kp_head_convs=1,
                                   kp_smooth_pyramid=False,
                                   kp_p2_late=True, kp_fuse_conv=False))
    model = MultiPoseNet(config=cfg, with_detector=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    want = np.transpose(np.asarray(out["heatmaps"]), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out["heatmaps_cm"]), want,
                               rtol=1e-5, atol=1e-5)
