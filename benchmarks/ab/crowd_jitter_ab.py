"""A/B: PRN window-jitter on CROWDED scenes (5-9 persons, 128², CPU).

The 1-4-person A/B (jitter_ab.py) replicated +0.01-0.015 AP for
prn.window_jitter=0.1 across three PRN seeds. Crowds are the risk case:
a jittered window overlaps neighboring people more often, so the PRN
sees more distractor peaks in training — does the gain hold? One
crowded main model, fresh PRN per (jitter, seed) arm, e2e + GT-box AP.

Usage: python benchmarks/ab/crowd_jitter_ab.py
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
CACHE = "/tmp/ab_crowd_state.pkl"


def main() -> None:
    cfg0 = base_config()
    # Crowded scenes need more PRN slots and detections than the 1-4
    # person base config.
    cfg0 = cfg0.replace(
        prn=dataclasses.replace(cfg0.prn, max_persons=12),
        detector=dataclasses.replace(cfg0.detector, max_detections=12),
    )
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=5, max_persons=9, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=5, max_persons=9, seed=999)

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            variables = pickle.load(f)
    else:
        t0 = time.time()
        state = train(
            cfg0,
            batch_iterator(train_records, cfg0.train.batch_size, SIZE,
                           cfg0.prn.max_persons, train=True),
            checkpoint=False,
            log_fn=lambda m: None,
        )
        state = jax.device_get(state)
        variables = {"params": state.ema_params,
                     "batch_stats": state.batch_stats}
        with open(CACHE, "wb") as f:
            pickle.dump(variables, f)
        print(f"# crowded main model trained in {time.time()-t0:.0f}s",
              flush=True)

    for seed_off in (0, 7):
        for jitter in (0.0, 0.1):
            cfg = cfg0.replace(
                prn=dataclasses.replace(cfg0.prn, window_jitter=jitter),
                train=dataclasses.replace(cfg0.train,
                                          seed=cfg0.train.seed + seed_off))
            prn_state = prn_train.train_prn(
                cfg,
                batch_iterator(train_records, cfg.train.batch_size, SIZE,
                               cfg.prn.max_persons, train=True,
                               augment=False),
                num_steps=300,
                log_fn=lambda m: None,
            )
            prn_variables = jax.device_get(prn_state.params)
            predictor = Predictor(config=cfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            s = evaluate_predictor(predictor, eval_records)
            ev = KeypointEvaluator()
            for rec in eval_records:
                kps = predictor.predict_given_boxes(rec["image"],
                                                    rec["boxes"])
                dts = [DetectionKP(keypoints=kps[p].astype(np.float32),
                                   score=1.0)
                       for p in range(len(rec["boxes"]))]
                ev.add_image(record_ground_truths(rec), dts)
            g = ev.summarize()
            print(json.dumps({"seed_off": seed_off, "jitter": jitter,
                              "e2e_AP": s["AP"], "e2e_AP75": s["AP75"],
                              "gtbox_AP": g["AP"],
                              "gtbox_AP75": g["AP75"]}), flush=True)


if __name__ == "__main__":
    main()
