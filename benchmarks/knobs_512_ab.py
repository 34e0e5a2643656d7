"""512² confirmation of the round-3 quality knobs (prn.crop_margin,
detector.nms_vote_iou) at the SHIPPED Config.fast() operating point.

The 128² A/B (NOTES_r3.md) measured margin 0.1 → +0.017 AP, vote 0.75 →
+0.011 AP, combined +0.028, on a shared main model with per-margin PRNs.
This script reproduces that design at the real operating point, in ONE
process (the axon remote-compile has no cross-process cache for Mosaic
programs — NOTES_r3.md):

  1. train the main model once (the margin only affects the PRN crop,
     never the main model graph or targets);
  2. train one PRN per margin arm (the PRN trains and infers with the
     same margin);
  3. evaluate the e2e predict() grid {margin} x {vote} plus the GT-box
     PRN protocol per margin (vote-independent: GT boxes skip NMS).

Emits one JSON line per arm. Ship decision: flip the Config defaults on
iff the combined arm beats (margin 0, vote 0) outside run-to-run noise
(~±0.02 AP at this eval size).

Usage: python benchmarks/knobs_512_ab.py [--steps 1200]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax
import numpy as np

# Honor an explicit CPU request (the axon PJRT plugin re-injects itself
# into jax_platforms at import — both knobs are needed to force CPU for
# dry-runs of this harness; see .claude/skills/verify/SKILL.md).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiposenet_tpu.config import Config, DecodeConfig, TrainConfig
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

# PRN arms: (crop_margin, window_jitter). Margin per the 128² A/B in
# NOTES_r3.md; jitter 0.1 replicated +0.01 AP / +0.07 AP75 across three
# PRN seeds at 128² (benchmarks/ab/jitter_ab.py).
PRN_ARMS = ((0.0, 0.0), (0.1, 0.0), (0.1, 0.1))
# Inference-graph NMS arms: (nms_vote_iou, soft_nms_sigma). Vote per the
# 128² grid; soft-NMS sigma 0.5 won the crowded-scene sweep
# (benchmarks/ab/crowd_nms_ab.py, +0.052 AP with vote) — eval-only, so
# confirming it here costs four extra evals, not a retrain.
NMS_ARMS = ((0.0, 0.0), (0.75, 0.0), (0.0, 0.5), (0.75, 0.5))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--prn-steps", type=int, default=400)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eval-images", type=int, default=32)
    parser.add_argument("--train-images", type=int, default=192)
    parser.add_argument("--size", type=int, default=512,
                        help="override the operating-point resolution "
                             "(CPU dry-runs of the harness itself)")
    parser.add_argument("--box-loss", default="huber",
                        choices=("huber", "giou", "both"),
                        help="main-model box-regression loss arm "
                             "(giou retrains the main model — see "
                             "benchmarks/ab/giou_ab.py for the 128² A/B; "
                             "'both' trains both in ONE process so the "
                             "identical inference/PRN graphs share "
                             "compiles — the axon remote-compile has no "
                             "cross-process Mosaic cache)")
    parser.add_argument("--giou-weight", type=float, default=5.0)
    args = parser.parse_args()
    SIZE = args.size
    box_losses = (("huber", "giou") if args.box_loss == "both"
                  else (args.box_loss,))

    # Identical training-dynamics deltas to benchmarks/train_synthetic_512.py
    # (f32 training compute, short-run bn_momentum); the inference graph is
    # the shipped fast() one.
    train_records = make_dataset(args.train_images, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=8, seed=0)
    eval_records = make_dataset(args.eval_images, img_h=SIZE, img_w=SIZE,
                                min_persons=2, max_persons=8, seed=999)

    for box_loss in box_losses:
        base = Config.fast()
        base = base.replace(
            model=dataclasses.replace(
                base.model, compute_dtype="float32", bn_momentum=0.95),
            detector=dataclasses.replace(
                base.detector, box_loss=box_loss,
                giou_loss_weight=args.giou_weight),
            decode=DecodeConfig(score_threshold=0.1),
            train=TrainConfig(
                image_size=SIZE, batch_size=args.batch_size,
                num_steps=args.steps, warmup_steps=50, learning_rate=2e-3,
                log_interval_steps=50,
            ),
        )
        run_arms(args, base, box_loss, SIZE, train_records, eval_records)


def run_arms(args, base, box_loss, SIZE, train_records, eval_records):
    t0 = time.time()
    state = train(
        base,
        batch_iterator(train_records, base.train.batch_size, SIZE,
                       base.prn.max_persons, train=True),
        checkpoint=False,
        log_fn=lambda m: print(json.dumps(m), flush=True),
    )
    print(f"# [{box_loss}] trained {args.steps} steps in "
          f"{time.time() - t0:.0f}s", flush=True)
    state = jax.device_get(state)
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}

    for margin, jitter in PRN_ARMS:
        cfg_m = base.replace(prn=dataclasses.replace(
            base.prn, crop_margin=margin, window_jitter=jitter))
        prn_state = prn_train.train_prn(
            cfg_m,
            batch_iterator(train_records, cfg_m.train.batch_size, SIZE,
                           cfg_m.prn.max_persons, train=True,
                           augment=False),
            num_steps=args.prn_steps,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)

        for vote, sigma in NMS_ARMS:
            cfg_mv = cfg_m.replace(detector=dataclasses.replace(
                cfg_m.detector, nms_vote_iou=vote, soft_nms_sigma=sigma))
            stats = evaluate_predictor(
                Predictor(config=cfg_mv, variables=variables,
                          prn_variables=prn_variables, image_size=SIZE),
                eval_records,
            )
            print(json.dumps({"arm": {"margin": margin, "jitter": jitter, "vote": vote, "soft_sigma": sigma, "box_loss": box_loss},
                              "e2e_512": stats}), flush=True)

        # GT-box PRN protocol (vote-independent).
        predictor = Predictor(config=cfg_m, variables=variables,
                              prn_variables=prn_variables, image_size=SIZE)
        ev = KeypointEvaluator()
        for rec in eval_records:
            kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
            dts = [DetectionKP(keypoints=kps[p].astype(np.float32),
                               score=1.0)
                   for p in range(len(rec["boxes"]))]
            ev.add_image(record_ground_truths(rec), dts)
        print(json.dumps({"arm": {"margin": margin, "jitter": jitter, "protocol": "gtbox", "box_loss": box_loss},
                          "gtbox_512": ev.summarize()}), flush=True)


if __name__ == "__main__":
    main()
