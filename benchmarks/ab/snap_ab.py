"""A/B: PRN snap radius under the candidate margin+vote setting
(scratch, round 3). Caches trained weights in /tmp/ab_state.pkl so
eval-only sweeps rerun instantly.

Usage: python snap_ab.py
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import dataclasses
import json
import os
import pickle
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
from multiposenet_tpu.eval.runner import evaluate_predictor
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train

SIZE = 128
CACHE = "/tmp/ab_state.pkl"
MARGIN = 0.1


def base_config() -> Config:
    return Config(
        model=ModelConfig(backbone_width=0.5, fpn_channels=64,
                          head_channels=64, bn_momentum=0.9),
        detector=DetectorConfig(score_threshold=0.05, max_detections=8,
                                pre_nms_top_k=200, nms_vote_iou=0.75),
        prn=PRNConfig(crop_height=28, crop_width=18, hidden_units=512,
                      max_persons=6, crop_margin=MARGIN),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(
            image_size=SIZE, batch_size=8, num_steps=500,
            warmup_steps=20, learning_rate=2e-3, log_interval_steps=100,
        ),
    )


def get_weights(cfg: Config, train_records) -> tuple[dict, dict]:
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
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
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}
    prn_variables = jax.device_get(prn_state.params)
    with open(CACHE, "wb") as f:
        pickle.dump((variables, prn_variables), f)
    print(f"# trained in {time.time() - t0:.0f}s (cached to {CACHE})",
          flush=True)
    return variables, prn_variables


def main() -> None:
    cfg = base_config()
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=4, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=1, max_persons=4, seed=999)
    variables, prn_variables = get_weights(cfg, train_records)

    for snap in (0.0, 0.5, 1.0, 1.5, 2.0):
        scfg = cfg.replace(prn=dataclasses.replace(
            cfg.prn, snap_radius_cells=snap))
        predictor = Predictor(
            config=scfg, variables=variables,
            prn_variables=prn_variables, image_size=SIZE,
        )
        s = evaluate_predictor(predictor, eval_records)
        print(json.dumps({"snap": snap, "AP": s["AP"], "AP50": s["AP50"],
                          "AP75": s["AP75"], "AR": s["AR"]}), flush=True)


if __name__ == "__main__":
    main()
