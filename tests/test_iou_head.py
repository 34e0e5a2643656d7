"""IoU-aware scoring head (DetectorConfig.iou_head, round-4 knob):
head output shape, loss semantics, and the rescored NMS ranking."""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import (
    Config,
    DecodeConfig,
    DetectorConfig,
    ModelConfig,
    PRNConfig,
    TrainConfig,
)
from multiposenet_tpu.ops import detection as detection_lib
from multiposenet_tpu.train import losses as losses_lib


@pytest.mark.slow  # default-off knob head compile; loss/rescore semantics stay fast
def test_head_emits_iou_logits_per_level():
    from multiposenet_tpu.models.detector_head import DetectorHead

    head = DetectorHead(min_level=3, max_level=5, anchors_per_cell=9,
                        channels=16, num_convs=1, with_iou=True)
    pyramid = {
        f"P{l}": jnp.zeros((2, 64 >> (l - 3), 64 >> (l - 3), 16))
        for l in (3, 4, 5)
    }
    out = head.init_with_output(jax.random.PRNGKey(0), pyramid)[0]
    for l in (3, 4, 5):
        assert out[f"P{l}"]["iou"].shape == out[f"P{l}"]["cls"].shape
    flat = detection_lib.flatten_iou_outputs(out, 3, 5)
    n = sum(out[f"P{l}"]["cls"].reshape(2, -1).shape[1] for l in (3, 4, 5))
    assert flat.shape == (2, n)


def test_iou_pred_loss_semantics():
    # One positive anchor with a perfect box: target IoU = 1, so the BCE
    # equals -log(sigmoid(logit)). One negative anchor: ignored.
    boxes = jnp.asarray([[[0.0, 0.0, 10.0, 10.0],
                          [20.0, 20.0, 30.0, 30.0]]])
    cls_t = jnp.asarray([[1.0, 0.0]])
    logit = 2.0
    logits = jnp.asarray([[logit, -5.0]])
    loss = losses_lib.iou_pred_loss(logits, boxes, boxes, cls_t)
    expected = -np.log(1.0 / (1.0 + np.exp(-logit)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    # Disjoint pred vs target: IoU target 0 → BCE = -log(1 - sigmoid).
    pred = jnp.asarray([[[100.0, 100.0, 110.0, 110.0],
                         [20.0, 20.0, 30.0, 30.0]]])
    loss0 = losses_lib.iou_pred_loss(logits, pred, boxes, cls_t)
    expected0 = -np.log(1.0 - 1.0 / (1.0 + np.exp(-logit)))
    np.testing.assert_allclose(float(loss0), expected0, rtol=1e-5)


def _tiny_cfg(**det_overrides):
    return Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        detector=DetectorConfig(score_threshold=0.0, max_detections=4,
                                pre_nms_top_k=32, approx_top_k=False,
                                **det_overrides),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32,
                      max_persons=4),
        decode=DecodeConfig(max_peaks_per_channel=4),
        train=TrainConfig(image_size=64, batch_size=2),
    )


def test_postprocess_scores_are_cls_times_iou():
    """With the iou head, the reported score is
    sigmoid(cls) * sigmoid(iou)^p — and a better-localized lower-cls
    candidate outranks a sloppier higher-cls one."""
    cfg = _tiny_cfg(iou_head=True, iou_score_power=1.0)
    d = cfg.detector
    from multiposenet_tpu.ops.anchors import all_anchors

    n_per = {}
    size = 64
    det_out = {}
    for level in range(d.min_level, d.max_level + 1):
        feat = int(np.ceil(size / 2**level))
        a = d.num_scales * len(d.aspect_ratios)
        det_out[f"P{level}"] = {
            "cls": jnp.full((1, feat, feat, a), -8.0),
            "box": jnp.zeros((1, feat, feat, a * 4)),
            "iou": jnp.full((1, feat, feat, a), -8.0),
        }
        n_per[level] = feat * feat * a

    # Two candidates at level 3, far-apart cells (no NMS interaction):
    # A: cls 3.0, iou -1.0 → combined 0.953 * 0.269 = 0.256
    # B: cls 1.0, iou  3.0 → combined 0.731 * 0.953 = 0.697  (wins)
    cls = np.array(det_out["P3"]["cls"])
    iou = np.array(det_out["P3"]["iou"])
    cls[0, 1, 1, 0], iou[0, 1, 1, 0] = 3.0, -1.0
    cls[0, 6, 6, 0], iou[0, 6, 6, 0] = 1.0, 3.0
    det_out["P3"]["cls"] = jnp.asarray(cls)
    det_out["P3"]["iou"] = jnp.asarray(iou)

    dets = detection_lib.postprocess_detections(det_out, size, d)
    s = jax.nn.sigmoid
    exp_b = float(s(1.0) * s(3.0))
    exp_a = float(s(3.0) * s(-1.0))
    np.testing.assert_allclose(float(dets.scores[0, 0]), exp_b, rtol=1e-4)
    np.testing.assert_allclose(float(dets.scores[0, 1]), exp_a, rtol=1e-4)
    assert bool(dets.valid[0, 0]) and bool(dets.valid[0, 1])

    # Power 0 degrades to plain cls ranking: A outranks B again.
    d0 = dataclasses.replace(d, iou_score_power=0.0)
    dets0 = detection_lib.postprocess_detections(det_out, size, d0)
    np.testing.assert_allclose(float(dets0.scores[0, 0]), float(s(3.0)),
                               rtol=1e-4)
