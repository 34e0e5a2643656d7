"""Pallas depthwise conv parity vs lax.conv (SURVEY.md §4 kernel parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiposenet_tpu.ops.depthwise_pallas import depthwise_conv3x3


def lax_dw(x, kernel):
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    )


@pytest.mark.parametrize("shape", [(2, 16, 128, 8), (1, 32, 128, 32)])
def test_depthwise_matches_lax(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    kernel = jnp.asarray(
        rng.randn(3, 3, 1, shape[-1]).astype(np.float32)
    )
    got = depthwise_conv3x3(x, kernel, interpret=True)
    want = lax_dw(x, kernel)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_depthwise_borders_zero_padded():
    """SAME zero-padding semantics at the borders (matches the reference's
    TF 'SAME' convention, SURVEY.md §7 hard part 3)."""
    x = jnp.ones((1, 8, 128, 8), jnp.float32)
    kernel = jnp.ones((3, 3, 1, 8), jnp.float32)
    out = np.asarray(depthwise_conv3x3(x, kernel, interpret=True))
    assert out[0, 4, 64, 0] == pytest.approx(9.0)
    assert out[0, 0, 64, 0] == pytest.approx(6.0)   # top edge
    assert out[0, 0, 0, 0] == pytest.approx(4.0)    # corner
