"""A/B: detector box-regression loss form — Huber-on-deltas (reference)
vs GIoU-on-decoded-boxes (128², CPU, 1-4-person scenes).

Motivation: the e2e-vs-GT-box AP gap (0.695 vs 0.907 at 512²) is
detector box localization. GIoU optimizes the overlap NMS and the OKS
evaluator actually score, and couples the 4 coordinates. The main model
must retrain per arm (the loss shapes the shared backbone/FPN too), so
each arm is a full train → PRN → eval run under the candidate shipping
quality setting (prn.crop_margin=0.1, nms_vote_iou=0.75).

Usage: python benchmarks/ab/giou_ab.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import dataclasses
import json
import os
import pickle
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from snap_ab import base_config
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
import functools as _functools
# Round-3 harness: recorded numbers + cached /tmp weights are fixtures
# v1; pin it so the round-4 v2 default can't mismatch (NOTES_r4.md trap).
make_dataset = _functools.partial(make_dataset, style="v1",
                                  min_size=0.2, max_size=0.6)
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.eval.runner import (
    evaluate_predictor,
    record_ground_truths,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train

SIZE = 128

ARMS = [
    ("huber", {"box_loss": "huber"}),
    ("giou_w2", {"box_loss": "giou", "giou_loss_weight": 2.0}),
    ("giou_w5", {"box_loss": "giou", "giou_loss_weight": 5.0}),
]


def run_arm(name: str, det_overrides: dict, seed_off: int = 0) -> None:
    cfg = base_config()
    cfg = cfg.replace(
        detector=dataclasses.replace(cfg.detector, **det_overrides),
        train=dataclasses.replace(cfg.train, seed=cfg.train.seed + seed_off),
    )
    train_records = make_dataset(256, img_h=SIZE, img_w=SIZE, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE, seed=999)

    cache = f"/tmp/ab_giou_{name}_s{seed_off}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            variables, prn_variables = pickle.load(f)
    else:
        t0 = time.time()
        state = train(
            cfg,
            batch_iterator(train_records, cfg.train.batch_size, SIZE,
                           cfg.prn.max_persons, train=True),
            checkpoint=False,
            log_fn=lambda m: None,
        )
        state = jax.device_get(state)
        variables = {"params": state.ema_params,
                     "batch_stats": state.batch_stats}
        prn_state = prn_train.train_prn(
            cfg,
            batch_iterator(train_records, cfg.train.batch_size, SIZE,
                           cfg.prn.max_persons, train=True, augment=False),
            num_steps=300,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)
        with open(cache, "wb") as f:
            pickle.dump((variables, prn_variables), f)
        print(f"# arm {name} s{seed_off} trained in {time.time()-t0:.0f}s",
              flush=True)

    predictor = Predictor(config=cfg, variables=variables,
                          prn_variables=prn_variables, image_size=SIZE)
    s = evaluate_predictor(predictor, eval_records)
    ev = KeypointEvaluator()
    for rec in eval_records:
        kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
        dts = [DetectionKP(keypoints=kps[p].astype(np.float32), score=1.0)
               for p in range(len(rec["boxes"]))]
        ev.add_image(record_ground_truths(rec), dts)
    g = ev.summarize()
    print(json.dumps({"arm": name, "seed_off": seed_off,
                      "e2e_AP": s["AP"], "e2e_AP50": s["AP50"],
                      "e2e_AP75": s["AP75"],
                      "gtbox_AP": g["AP"], "gtbox_AP75": g["AP75"]}),
          flush=True)


def main() -> None:
    for name, over in ARMS:
        run_arm(name, over, seed_off=0)


if __name__ == "__main__":
    main()
