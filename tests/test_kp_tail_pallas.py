"""Parity tests for the fused stride-4 tail kernel (interpret mode).

Contract (ops/kp_tail_pallas.py): kp_tail_cm(l2, z8, kernel, bias) ==
NCHW-transposed conv3x3_SAME(l2 + nearest_upsample_2x(z8)) + bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiposenet_tpu.models.fpn import nearest_upsample_2x
from multiposenet_tpu.ops.kp_tail_pallas import kp_tail_cm


def _reference(l2, z8, kernel, bias):
    x = l2 + nearest_upsample_2x(z8)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NCHW")
    )
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=dn
    ) + bias[:, None, None]


@pytest.mark.parametrize("h,w,c,k", [(32, 32, 16, 17), (32, 64, 8, 5)])
def test_kp_tail_matches_conv(h, w, c, k):
    rng = np.random.RandomState(0)
    l2 = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
    z8 = jnp.asarray(rng.randn(2, h // 2, w // 2, c), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, k) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(k), jnp.float32)
    got = kp_tail_cm(l2, z8, kernel, bias, interpret=True)
    want = _reference(l2, z8, kernel, bias)
    assert got.shape == want.shape == (2, k, h, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_kp_tail_bf16_parity():
    """The shipped compute dtype: bf16 inputs, f32 accumulation."""
    rng = np.random.RandomState(1)
    l2 = jnp.asarray(rng.randn(2, 32, 32, 16), jnp.bfloat16)
    z8 = jnp.asarray(rng.randn(2, 16, 16, 16), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, 3, 16, 17) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(17), jnp.float32)
    got = kp_tail_cm(l2, z8, kernel, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _reference(
        l2.astype(jnp.float32), z8.astype(jnp.float32),
        kernel.astype(jnp.bfloat16).astype(jnp.float32), bias
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_kp_tail_tile_rows_sweep_knob():
    """TILE_ROWS is a perf knob only — results identical across values."""
    from multiposenet_tpu.ops import kp_tail_pallas

    rng = np.random.RandomState(2)
    l2 = jnp.asarray(rng.randn(1, 64, 32, 8), jnp.float32)
    z8 = jnp.asarray(rng.randn(1, 32, 16, 8), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 8, 17) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(17), jnp.float32)
    want = _reference(l2, z8, kernel, bias)
    old = kp_tail_pallas.TILE_ROWS
    try:
        for tile in (8, 16, 32):
            kp_tail_pallas.TILE_ROWS = tile
            got = kp_tail_cm(l2, z8, kernel, bias, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=f"tile_rows={tile}"
            )
    finally:
        kp_tail_pallas.TILE_ROWS = old


def test_kp_tail_rejects_bad_shapes():
    l2 = jnp.zeros((1, 30, 32, 8))  # H not a multiple of the row tile
    z8 = jnp.zeros((1, 15, 16, 8))
    with pytest.raises(ValueError, match="shape mismatch"):
        kp_tail_cm(l2, z8, jnp.zeros((3, 3, 8, 17)), jnp.zeros(17),
                   interpret=True)


def test_model_wiring_through_tail_kernel():
    """With kp_tail_pallas forced on (interpret), the model's heatmaps_cm
    must match the jnp path's output."""
    from multiposenet_tpu.config import Config, ModelConfig
    from multiposenet_tpu.models.posenet import MultiPoseNet
    from multiposenet_tpu.ops import kp_tail_pallas

    kwargs = dict(backbone_width=0.25, fpn_channels=32, head_channels=32,
                  kp_head_convs=1, kp_smooth_pyramid=False,
                  kp_p2_late=True, kp_fuse_conv=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3),
                    jnp.float32)
    cfg = Config(model=ModelConfig(**kwargs))
    model = MultiPoseNet(config=cfg, with_detector=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)["heatmaps_cm"]

    cfg_t = Config(model=ModelConfig(kp_tail_pallas=True, **kwargs))
    model_t = MultiPoseNet(config=cfg_t, with_detector=False)
    old = kp_tail_pallas.FORCE_INTERPRET
    try:
        kp_tail_pallas.FORCE_INTERPRET = True
        got = model_t.apply(variables, x, train=False)["heatmaps_cm"]
    finally:
        kp_tail_pallas.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
