"""End-to-end quality gate: train → PRN → predict → OKS AP floor.

SURVEY.md §4 "integration: tiny fixture dataset → e2e predict → OKS eval"
and the round-1 verdict's quality mandate: nothing previously proved the
framework can pose-estimate. This trains the tiny operating point from
scratch on synthetic blob scenes, then asserts AP floors under both the
GT-box protocol (the reference's PRN evaluation) and the detector-driven
end-to-end protocol, plus a sub-pixel localization floor.

Fixture choice (round 5): **fixtures v1** — round 4 switched this gate to
v2 with floors from a never-completed calibration and it went red
(GT-box AP50 0.02 vs floor 0.8; VERDICT r4 weak #1). The round-5
diagnosis (NOTES_r5.md, 12 arms) showed v2 is plain underfitting at gate
budgets — see test_integration_smoke.py's docstring for the full chain.
A trainability gate needs v1; v2 stays the benchmark distribution.

This tier trains through the DP-sharded path (conftest's 8 virtual
devices; the smoke tier pins single-device — see its docstring for the
trajectory-drift finding): at 500 steps the DP trajectory lands green,
so this doubles as the DP-training integration gate.

Floors are ~half of round-5 calibration measured ON THIS CONFIG in
this environment from a completed run (NOTES_r5.md "gate
recalibration", log /tmp/r5_cal_v1_500_8dev.log), 500 training steps /
150 PRN steps on v1 at min_size 0.3:

  * GT-box: measured AP50 1.0 / AP 0.687 / AP75 0.937 → floors
    0.8 / 0.35 / 0.45 (AP50 floor kept at the round-3 0.8 — the
    protocol saturates AP50; the others get the half rule).
  * Mean matched keypoint error: floor 1.0 hm px (decoded-peak median
    at calibration 2.88 image px = 0.72 hm px; the PRN snap path
    measured 0.45 at round 3).
  * e2e: measured AP50 0.738 / AR50 0.765 → floors 0.35 / 0.35.

Determinism: all seeds fixed; training uses the infinite unaugmented
loader so the data stream is identical across runs.
"""

import json

import jax
import numpy as np
import pytest

# The 500-step fixture takes ~12 min on a 1-core box — over typical CI
# command budgets (VERDICT r3 weak #6). The <10-min tier keeps an e2e AP
# assertion via tests/test_integration_smoke.py; run `-m slow` for the
# full floors.
pytestmark = pytest.mark.slow

from multiposenet_tpu.config import (
    Config,
    DecodeConfig,
    DetectorConfig,
    ModelConfig,
    PRNConfig,
    TrainConfig,
)
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.eval.runner import (
    evaluate_predictor,
    record_ground_truths,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train

SIZE = 96


def _config() -> Config:
    return Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32, bn_momentum=0.9),
        detector=DetectorConfig(score_threshold=0.05, max_detections=6,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=128,
                      max_persons=4),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(image_size=SIZE, batch_size=8, num_steps=500,
                          warmup_steps=20, learning_rate=3e-3, seed=0),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = _config()
    # Fixtures v1 (module docstring: v2 underfits at gate budgets), with
    # the scale floor raised for the 96² gate (a 0.15-scale person is
    # 14 px — sub-stride at this size).
    records = make_dataset(64, img_h=SIZE, img_w=SIZE, min_persons=1,
                           max_persons=2, seed=0, style="v1",
                           min_size=0.3, max_size=0.65)
    eval_records = make_dataset(12, img_h=SIZE, img_w=SIZE, min_persons=1,
                                max_persons=2, seed=77, style="v1",
                                min_size=0.3, max_size=0.65)
    state = train(
        cfg,
        batch_iterator(records, 8, SIZE, cfg.prn.max_persons, train=True,
                       augment=False),
        checkpoint=False,
    )
    prn_state = prn_train.train_prn(
        cfg,
        batch_iterator(records, 8, SIZE, cfg.prn.max_persons, train=True,
                       augment=False),
        num_steps=150,
    )
    state = jax.device_get(state)
    predictor = Predictor(
        config=cfg,
        variables={"params": state.ema_params,
                   "batch_stats": state.batch_stats},
        prn_variables=jax.device_get(prn_state.params),
        image_size=SIZE,
    )
    return predictor, eval_records


def test_gt_box_ap_floor_and_localization(trained):
    predictor, eval_records = trained
    ev = KeypointEvaluator()
    errs = []
    for rec in eval_records:
        kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
        dts = []
        for p in range(len(rec["boxes"])):
            dts.append(DetectionKP(
                keypoints=kps[p].astype(np.float32), score=1.0
            ))
            gt = rec["keypoints"][p]
            vis = gt[:, 2] > 0
            errs.append(np.linalg.norm(
                kps[p][vis, :2] - gt[vis, :2], axis=-1
            ))
        ev.add_image(record_ground_truths(rec), dts)
    stats = ev.summarize()
    err_hm_px = float(np.concatenate(errs).mean()) / 4.0
    print(json.dumps({"gtbox": stats, "mean_err_hm_px": err_hm_px}))
    assert stats["AP50"] >= 0.8, stats
    assert stats["AP"] >= 0.35, stats
    assert stats["AP75"] >= 0.45, stats
    assert err_hm_px < 1.0, err_hm_px


def test_detector_e2e_ap_floor(trained):
    predictor, eval_records = trained
    stats = evaluate_predictor(predictor, eval_records)
    print(json.dumps({"e2e": stats}))
    assert stats["AP50"] >= 0.35, stats
    assert stats["AR50"] >= 0.35, stats
