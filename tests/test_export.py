"""Export/load round-trip and TF-checkpoint import."""

import tempfile

import jax
import numpy as np
import pytest

from multiposenet_tpu.config import Config, ModelConfig, PRNConfig
from multiposenet_tpu.infer import export
from multiposenet_tpu.infer.predictor import Predictor


def tiny_cfg():
    return Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32),
    )


def test_save_load_roundtrip_predictions_identical():
    cfg = tiny_cfg()
    pred = Predictor(config=cfg, image_size=128)
    img = np.random.RandomState(0).randint(0, 255, (128, 128, 3),
                                           dtype=np.uint8)
    hm1 = pred.predict_heatmaps(img)

    with tempfile.TemporaryDirectory() as d:
        export.save_model(d, cfg, pred.variables, pred.prn_variables)
        cfg2, variables, prn_vars = export.load_model(d)
        assert cfg2 == cfg
        pred2 = Predictor(config=cfg2, variables=variables,
                          prn_variables=prn_vars, image_size=128)
        hm2 = pred2.predict_heatmaps(img)
    np.testing.assert_array_equal(hm1, hm2)


@pytest.mark.slow  # TF import; name-map, shape-mismatch and slim roundtrip stay fast
def test_import_tf_checkpoint_by_name():
    tf = pytest.importorskip("tensorflow")
    cfg = tiny_cfg()
    pred = Predictor(config=cfg, image_size=64)
    params = pred.variables["params"]

    # Write a TF checkpoint holding one variable destined for the stem conv.
    flat = jax.tree_util.tree_leaves(params["backbone"]["stem"]["conv"])
    stem_shape = params["backbone"]["stem"]["conv"]["kernel"].shape
    want = np.random.RandomState(0).rand(*stem_shape).astype(np.float32)

    with tempfile.TemporaryDirectory() as d:
        v = tf.Variable(want, name="MobilenetV1/Conv2d_0/weights")
        ckpt = tf.train.Checkpoint(w=v)
        path = ckpt.save(d + "/ck")

        def name_map(p):
            if p == "backbone/stem/conv/kernel":
                # tf.train.Checkpoint stores under this object path:
                return "w/.ATTRIBUTES/VARIABLE_VALUE"
            return None

        new_params = export.import_tf_checkpoint(path, params, name_map)

    got = np.asarray(new_params["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, want)
    # Unmapped leaves unchanged.
    np.testing.assert_array_equal(
        np.asarray(new_params["fpn"]["lateral_C2"]["kernel"]),
        np.asarray(params["fpn"]["lateral_C2"]["kernel"]),
    )


@pytest.mark.slow  # imports TF (~15 s alone on this box); fast tier stays TF-free
def test_import_tf_checkpoint_shape_mismatch_raises():
    tf = pytest.importorskip("tensorflow")
    cfg = tiny_cfg()
    pred = Predictor(config=cfg, image_size=64)
    params = pred.variables["params"]
    with tempfile.TemporaryDirectory() as d:
        v = tf.Variable(np.zeros((1, 2), np.float32), name="bad")
        path = tf.train.Checkpoint(w=v).save(d + "/ck")
        with pytest.raises(ValueError, match="shape mismatch"):
            export.import_tf_checkpoint(
                path, params,
                {"backbone/stem/conv/kernel":
                 "w/.ATTRIBUTES/VARIABLE_VALUE"},
            )


def test_mobilenet_slim_name_map():
    from multiposenet_tpu.infer.export import mobilenet_v1_slim_name_map as m

    assert m("backbone/stem/conv/kernel") == "MobilenetV1/Conv2d_0/weights"
    assert m("backbone/stem/bn/scale") == "MobilenetV1/Conv2d_0/BatchNorm/gamma"
    assert (m("backbone/block_0/depthwise/conv/kernel")
            == "MobilenetV1/Conv2d_1_depthwise/depthwise_weights")
    assert (m("backbone/block_2/pointwise/conv/kernel")
            == "MobilenetV1/Conv2d_3_pointwise/weights")
    assert (m("backbone/block_12/pointwise/bn/mean")
            == "MobilenetV1/Conv2d_13_pointwise/BatchNorm/moving_mean")
    assert m("fpn/lateral_C2/kernel") is None
    assert m("backbone/stem/conv/bias") is None


def test_bn_folding_preserves_outputs():
    """Folded-BN inference flavor must reproduce the unfolded model."""
    import dataclasses

    import jax.numpy as jnp

    from multiposenet_tpu.infer.folding import fold_batch_norm

    cfg = tiny_cfg()
    pred = Predictor(config=cfg, image_size=128, rng_seed=3)
    img = np.random.RandomState(0).randint(0, 255, (128, 128, 3),
                                           dtype=np.uint8)
    hm_ref = pred.predict_heatmaps(img)

    folded = Predictor(config=cfg, image_size=128, rng_seed=3,
                       fold_bn=True)
    assert folded.config.model.bn_folded
    # No BN params remain in the folded tree.
    leaves = jax.tree_util.tree_flatten_with_path(
        folded.variables["params"]
    )[0]
    assert not any("bn" in jax.tree_util.keystr(p) for p, _ in leaves)
    hm_folded = folded.predict_heatmaps(img)
    np.testing.assert_allclose(hm_folded, hm_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # imports TF; the no-TF name-map + BN-fold tests stay fast
def test_slim_warm_start_roundtrip():
    """Write a tiny TF checkpoint with literal TF-slim MobileNetV1 variable
    names (incl. (3,3,C,1) depthwise kernels) and import the full backbone
    via mobilenet_v1_slim_name_map — the offline stand-in for warm-starting
    from the real ImageNet checkpoint (SURVEY.md §7 hard part 6)."""
    tf = pytest.importorskip("tensorflow")
    import flax

    cfg = tiny_cfg()
    pred = Predictor(config=cfg, image_size=64)
    params = pred.variables["params"]
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(params), sep="/"
    )

    rng = np.random.RandomState(0)
    want = {}          # flax path -> expected array (flax layout)
    slim_tensors = {}  # slim name -> stored array (slim layout)
    n_depthwise = 0
    for path, value in flat.items():
        name = export.mobilenet_v1_slim_name_map(path)
        if name is None:
            continue
        arr = rng.rand(*value.shape).astype(np.float32)
        want[path] = arr
        store = arr
        if name.endswith("depthwise_weights"):
            store = arr.transpose(0, 1, 3, 2)  # flax (3,3,1,C)→slim (3,3,C,1)
            n_depthwise += 1
        slim_tensors[name] = store
    assert n_depthwise >= 1
    assert len(want) > 20  # full backbone: stem + 13 blocks, conv + 4 BN each

    g = tf.Graph()
    with g.as_default():
        tf_vars = [
            tf.compat.v1.get_variable(name, initializer=tensor)
            for name, tensor in slim_tensors.items()
        ]
        saver = tf.compat.v1.train.Saver(tf_vars)
        with tempfile.TemporaryDirectory() as d:
            with tf.compat.v1.Session(graph=g) as sess:
                sess.run(tf.compat.v1.global_variables_initializer())
                ckpt_path = saver.save(sess, d + "/model.ckpt")
            new_params = export.import_tf_checkpoint(
                ckpt_path, params, export.mobilenet_v1_slim_name_map
            )

    new_flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(new_params), sep="/"
    )
    for path, value in flat.items():
        if path in want:
            np.testing.assert_array_equal(
                np.asarray(new_flat[path]), want[path], err_msg=path
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(new_flat[path]), np.asarray(value), err_msg=path
            )
