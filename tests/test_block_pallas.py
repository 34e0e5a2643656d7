"""Fused block kernels (ops/block_pallas.py) vs the XLA composition
(interpret mode on CPU — SURVEY.md §4 kernel-parity strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiposenet_tpu.ops.block_pallas import (
    fused_dwsep_block,
    fused_dwsep_chain,
)


def ref_block(x, wdw, a1, b1, wpw, a2, b2):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, wdw.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x, wdw.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=x.shape[-1],
    )
    y = jnp.clip(y.astype(jnp.float32) * a1 + b1, 0, 6).astype(x.dtype)
    y = jnp.einsum("bhwc,co->bhwo", y, wpw.astype(x.dtype))
    return jnp.clip(y.astype(jnp.float32) * a2 + b2, 0, 6).astype(x.dtype)


def make_params(rng, c, co, n=None):
    shape = lambda *s: (n, *s) if n is not None else s  # noqa: E731
    wdw = jnp.asarray(rng.randn(*shape(3, 3, c)).astype(np.float32) * 0.3)
    a1 = jnp.asarray(rng.rand(*shape(c)).astype(np.float32) + 0.5)
    b1 = jnp.asarray(rng.randn(*shape(c)).astype(np.float32) * 0.1)
    wpw = jnp.asarray(rng.randn(*shape(c, co)).astype(np.float32) * 0.05)
    a2 = jnp.asarray(rng.rand(*shape(co)).astype(np.float32) + 0.5)
    b2 = jnp.asarray(rng.randn(*shape(co)).astype(np.float32) * 0.1)
    return wdw, a1, b1, wpw, a2, b2


@pytest.mark.parametrize("shape", [(2, 32, 16, 128), (1, 64, 8, 256)])
def test_fused_block_matches_xla(shape):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wdw, a1, b1, wpw, a2, b2 = make_params(rng, c, c)
    got = fused_dwsep_block(
        x, wdw[:, :, None], a1, b1, wpw, a2, b2, interpret=True
    )
    want = ref_block(x, wdw[:, :, None], a1, b1, wpw, a2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,nb", [(1, 1), (3, 1), (2, 2)])
def test_fused_chain_matches_xla(n, nb):
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 16, 8, 128
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    wdw, a1, b1, wpw, a2, b2 = make_params(rng, c, c, n=n)
    got = fused_dwsep_chain(
        x, wdw, a1, b1, wpw, a2, b2, images_per_step=nb, interpret=True
    )
    want = x
    for k in range(n):
        want = ref_block(want, wdw[k][:, :, None], a1[k], b1[k], wpw[k],
                         a2[k], b2[k])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
