"""End-to-end demo: train on synthetic scenes → PRN → OKS AP eval.

Proves the full loop (SURVEY.md §3.2-3.5) closes without COCO data: the
synthetic fixtures render keypoints as Gaussian blobs (data/synthetic.py),
so a small model can learn to localize them in a few hundred steps; the
detector learns person boxes from the focal-loss targets; the PRN trains on
GT-synthesized heatmaps; evaluation runs the real predict() path and the
pure-NumPy OKS evaluator.

Usage:  python benchmarks/train_synthetic_demo.py [--steps 300]
Prints JSONL progress and a final stats dict (AP expected well above 0
after ~300 steps; exact value depends on the backend RNG).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiposenet_tpu.config import (
    Config, DecodeConfig, DetectorConfig, ModelConfig, PRNConfig,
    TrainConfig,
)
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval.runner import evaluate_predictor
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--prn-steps", type=int, default=150)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--eval-images", type=int, default=24)
    args = parser.parse_args()

    size = args.image_size
    cfg = Config(
        # bn_momentum 0.9: the production default 0.997 needs ~2k steps
        # before the BN running stats track the activations — with the
        # demo's few hundred steps, eval-mode BN would still be at its
        # init stats and the eval forward would output ~zeros while train
        # losses converge (the round-2 "AP exactly 0" bug).
        model=ModelConfig(backbone_width=0.5, fpn_channels=64,
                          head_channels=64, bn_momentum=0.9),
        detector=DetectorConfig(score_threshold=0.05, max_detections=8,
                                pre_nms_top_k=200),
        prn=PRNConfig(crop_height=28, crop_width=18, hidden_units=512,
                      max_persons=6),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(
            image_size=size, batch_size=8, num_steps=args.steps,
            warmup_steps=20, learning_rate=2e-3, log_interval_steps=25,
            checkpoint_dir="/tmp/mpn_synth_demo",
        ),
    )
    train_records = make_dataset(128, img_h=size, img_w=size,
                                 min_persons=1, max_persons=3, seed=0)
    eval_records = make_dataset(args.eval_images, img_h=size, img_w=size,
                                min_persons=1, max_persons=3, seed=999)

    t0 = time.time()
    state = train(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, size,
                       cfg.prn.max_persons, train=True),
        checkpoint=False,
        log_fn=lambda m: print(json.dumps(m)),
    )
    print(f"# trained {args.steps} steps in {time.time() - t0:.0f}s")

    prn_state = prn_train.train_prn(
        cfg,
        # Infinite shuffled loop WITHOUT augmentation (the single-pass
        # eval iterator would silently cap PRN training at one epoch).
        batch_iterator(train_records, cfg.train.batch_size, size,
                       cfg.prn.max_persons, train=True, augment=False),
        num_steps=args.prn_steps,
        log_fn=lambda m: print(json.dumps(m)),
    )

    state = jax.device_get(state)
    predictor = Predictor(
        config=cfg,
        variables={"params": state.ema_params,
                   "batch_stats": state.batch_stats},
        prn_variables=jax.device_get(prn_state.params),
        image_size=size,
    )
    stats = evaluate_predictor(predictor, eval_records)
    print(json.dumps({"eval": stats}))


if __name__ == "__main__":
    main()
