"""A/B: person-score calibration for OKS AP ranking (scratch, round 3).

Trains main model + PRN once, then re-scores the SAME predictions under
several rules and reports AP per rule. AP is ranking-sensitive, so the
person score fed to the evaluator matters; the reference scores people
by the detector box score [RECON]. Candidate rules blend the PRN
keypoint confidences.

Usage: python score_ab.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from multiposenet_tpu.config import (
    Config, DecodeConfig, DetectorConfig, ModelConfig, PRNConfig,
    TrainConfig,
)
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
import functools as _functools
# Round-3 harness: recorded numbers + cached /tmp weights are fixtures
# v1; pin it so the round-4 v2 default can't mismatch (NOTES_r4.md trap).
make_dataset = _functools.partial(make_dataset, style="v1",
                                  min_size=0.2, max_size=0.6)
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.eval.runner import record_ground_truths
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train

SIZE = 128

RULES = {
    "box": lambda box, kp: box,
    "mean_kp": lambda box, kp: float(np.mean(kp)),
    "box_x_mean": lambda box, kp: box * float(np.mean(kp)),
    "box_x_mean_pos": lambda box, kp: box * float(
        np.mean(kp[kp > 0.05]) if (kp > 0.05).any() else 0.0),
    "box_x_frac_pos": lambda box, kp: box * float(np.mean(kp > 0.05)),
}


def main() -> None:
    cfg = Config(
        model=ModelConfig(backbone_width=0.5, fpn_channels=64,
                          head_channels=64, bn_momentum=0.9),
        detector=DetectorConfig(score_threshold=0.05, max_detections=8,
                                pre_nms_top_k=200),
        prn=PRNConfig(crop_height=28, crop_width=18, hidden_units=512,
                      max_persons=6),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(
            image_size=SIZE, batch_size=8, num_steps=500,
            warmup_steps=20, learning_rate=2e-3, log_interval_steps=100,
        ),
    )
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=4, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=1, max_persons=4, seed=999)

    t0 = time.time()
    state = train(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, SIZE,
                       cfg.prn.max_persons, train=True),
        checkpoint=False,
        log_fn=lambda m: None,
    )
    state = jax.device_get(state)
    prn_state = prn_train.train_prn(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, SIZE,
                       cfg.prn.max_persons, train=True, augment=False),
        num_steps=300,
        log_fn=lambda m: None,
    )
    print(f"# trained in {time.time() - t0:.0f}s", flush=True)

    predictor = Predictor(
        config=cfg,
        variables={"params": state.ema_params,
                   "batch_stats": state.batch_stats},
        prn_variables=jax.device_get(prn_state.params),
        image_size=SIZE,
    )

    # One predict pass; re-score per rule.
    preds = []
    for rec in eval_records:
        preds.append((rec, predictor.predict(rec["image"])))

    for name, rule in RULES.items():
        ev = KeypointEvaluator()
        for rec, people in preds:
            dts = [
                DetectionKP(
                    keypoints=p.keypoints.astype(np.float32),
                    score=rule(p.score, p.keypoints[:, 2]),
                )
                for p in people
            ]
            ev.add_image(record_ground_truths(rec), dts)
        s = ev.summarize()
        print(json.dumps({"rule": name, "AP": s["AP"], "AP50": s["AP50"],
                          "AP75": s["AP75"], "AR": s["AR"]}), flush=True)


if __name__ == "__main__":
    main()
