"""Space-to-depth stem + host-staged flat input path: exact-math parity
with the plain conv stem (models/mobilenet, ops/image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiposenet_tpu.models.mobilenet import (
    MobileNetV1,
    space_to_depth_2x,
    stem_kernel_to_s2d,
)
from multiposenet_tpu.ops import image as image_ops


def test_s2d_stem_matches_plain_stem():
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    )
    plain = MobileNetV1(width=0.25, s2d_stem=False)
    s2d = MobileNetV1(width=0.25, s2d_stem=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        s2d.init(jax.random.PRNGKey(0), x)
    )
    o1 = plain.apply(v, x)
    o2 = s2d.apply(v, x)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # fallback-path compile; main s2d parity tests stay fast
def test_s2d_stem_odd_size_falls_back():
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 63, 65, 3).astype(np.float32)
    )
    m = MobileNetV1(width=0.25, s2d_stem=True)
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert feats["C2"].shape[1:3] == (16, 17)


def test_s2d_stem_consumes_prestaged_input():
    """Host-staged s2d cells produce the same features as raw images."""
    raw = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3),
                                           dtype=np.uint8)
    xn = np.asarray(
        jax.jit(image_ops.normalize)(jnp.asarray(raw))
    )  # [B, H, W, 3] float32
    m = MobileNetV1(width=0.25, s2d_stem=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(xn))
    o_raw = m.apply(v, jnp.asarray(xn))
    o_s2d = m.apply(v, space_to_depth_2x(jnp.asarray(xn)))
    for k in o_raw:
        np.testing.assert_allclose(np.asarray(o_raw[k]),
                                   np.asarray(o_s2d[k]),
                                   rtol=1e-5, atol=1e-5)


def test_space_to_depth_flat_roundtrip():
    raw = np.random.RandomState(1).randint(0, 255, (2, 8, 12, 3),
                                           dtype=np.uint8)
    flat = image_ops.space_to_depth_flat(raw)
    assert flat.shape == (2, 4, 6 * 12)
    # flat cell (i, j) channel (py*2+px)*3+c == raw[2i+py, 2j+px, c]
    cells = flat.reshape(2, 4, 6, 4, 3)
    for py in range(2):
        for px in range(2):
            np.testing.assert_array_equal(
                cells[:, :, :, py * 2 + px],
                raw[:, py::2, px::2],
            )


def test_normalize_s2d_flat_matches_normalize():
    raw = np.random.RandomState(2).randint(0, 255, (2, 16, 24, 3),
                                           dtype=np.uint8)
    flat = jnp.asarray(image_ops.space_to_depth_flat(raw))
    got = np.asarray(image_ops.normalize_s2d_flat(flat))  # [B,8,12,12]
    want = np.asarray(
        space_to_depth_2x(image_ops.normalize(jnp.asarray(raw)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_stem_kernel_remap_shapes():
    k = jnp.asarray(np.random.RandomState(0).randn(3, 3, 3, 8)
                    .astype(np.float32))
    ks = stem_kernel_to_s2d(k)
    assert ks.shape == (2, 2, 12, 8)
    # The never-touched quadrant (dy%2==1 and dx%2==1 of cell (+1,+1))
    # stays zero: phase (1,1) channels of cell offset (1,1).
    np.testing.assert_array_equal(np.asarray(ks[1, 1, 9:12]), 0.0)


def test_s4_flat_transposed_staging_matches():
    """space_to_depth_flat4_t == transpose of space_to_depth_flat4, and
    the predictor's shape-dispatch routes it through the identical cell
    path (the transpose back is exact)."""
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    flat = image_ops.space_to_depth_flat4(imgs)
    flat_t = image_ops.space_to_depth_flat4_t(imgs)
    assert flat_t.shape == (2, flat.shape[2], flat.shape[1])
    np.testing.assert_array_equal(flat_t, flat.transpose(0, 2, 1))
    # Shape dispatch is unambiguous: [B, Wf, Hq] has dim1 == dim2 * 48.
    assert flat_t.shape[1] == flat_t.shape[2] * 48
    cells = image_ops.s4_flat_to_cells(jnp.asarray(flat))
    cells_t = image_ops.s4_flat_to_cells(
        jnp.transpose(jnp.asarray(flat_t), (0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(cells), np.asarray(cells_t))


def test_predictor_transposed_staging_parity():
    """Full _batch_forward_impl on transposed vs plain s4-flat staging —
    identical outputs (the transposed format is a pure layout change)."""
    import dataclasses

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.infer.predictor import Predictor

    cfg = Config.fast()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone_width=0.25, fpn_channels=32, head_channels=32))
    pred = Predictor(config=cfg, image_size=64)
    rng = np.random.RandomState(6)
    imgs = rng.randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    a = pred._batch_forward_impl(
        pred.variables, pred.prn_variables,
        jnp.asarray(image_ops.space_to_depth_flat4(imgs)))
    b = pred._batch_forward_impl(
        pred.variables, pred.prn_variables,
        jnp.asarray(image_ops.space_to_depth_flat4_t(imgs)))
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
