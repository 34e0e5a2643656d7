"""Margin+vote confirmation at 256² on the Config.fast() architecture
(scratch, round 3, CPU — the 512² TPU run is blocked on the outage).

One main model (fast() arch, f32 train dynamics per the 512 script's
recipe), PRNs per margin, voting eval-only; GT-box protocol per margin.

Usage: python benchmarks/ab/confirm256.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import dataclasses
import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from multiposenet_tpu.config import Config, DecodeConfig, TrainConfig
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

SIZE = 256


def main() -> None:
    cfg = Config.fast()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, compute_dtype="float32", bn_momentum=0.95),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(
            image_size=SIZE, batch_size=16, num_steps=800,
            warmup_steps=50, learning_rate=2e-3, log_interval_steps=100,
        ),
    )
    train_records = make_dataset(192, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=8, seed=0)
    eval_records = make_dataset(48, img_h=SIZE, img_w=SIZE,
                                min_persons=2, max_persons=8, seed=999)

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
    print(f"# fast() main model trained at 256² in {time.time()-t0:.0f}s",
          flush=True)

    for margin in (0.0, 0.1):
        mcfg = cfg.replace(prn=dataclasses.replace(
            cfg.prn, crop_margin=margin))
        prn_state = prn_train.train_prn(
            mcfg,
            batch_iterator(train_records, cfg.train.batch_size, SIZE,
                           cfg.prn.max_persons, train=True, augment=False),
            num_steps=400,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)
        for vote in (0.0, 0.75):
            vcfg = mcfg.replace(detector=dataclasses.replace(
                mcfg.detector, nms_vote_iou=vote))
            predictor = Predictor(
                config=vcfg, variables=variables,
                prn_variables=prn_variables, image_size=SIZE,
            )
            s = evaluate_predictor(predictor, eval_records)
            print(json.dumps({"margin": margin, "vote": vote,
                              "AP": s["AP"], "AP50": s["AP50"],
                              "AP75": s["AP75"], "AR": s["AR"]}),
                  flush=True)
        # GT-box protocol (margin applies; vote does not).
        predictor = Predictor(
            config=mcfg, variables=variables,
            prn_variables=prn_variables, image_size=SIZE,
        )
        ev = KeypointEvaluator()
        for rec in eval_records:
            kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
            dts = [DetectionKP(keypoints=kps[p].astype(np.float32),
                               score=1.0)
                   for p in range(len(rec["boxes"]))]
            ev.add_image(record_ground_truths(rec), dts)
        s = ev.summarize()
        print(json.dumps({"margin": margin, "gt_box_AP": s["AP"],
                          "gt_box_AR": s["AR"]}), flush=True)


if __name__ == "__main__":
    main()
