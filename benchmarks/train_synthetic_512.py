"""Quality evidence at the SHIPPED 512x512 operating point (VERDICT r2
item 2): train the exact Config.fast() architecture that bench.py
benchmarks — same widths, same kp_p2_late head, same backbone trim, bf16
— at 512², on synthetic scenes including ≥8-person crowds, then report
OKS AP from the real predict() pipeline (detector-driven AND GT-box PRN
protocol) next to the throughput headline.

The only deltas from the benchmarked config are training-dynamics knobs
that do not change the inference graph: bn_momentum (short-run BN stat
tracking — NOTES_r2) and f32 compute for training stability (the
benchmark's bf16 inference runs on the SAME trained weights; bf16-vs-f32
inference parity is covered by tests/test_predictor.py).

Usage: python benchmarks/train_synthetic_512.py [--steps 1200]
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

SIZE = 512


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--prn-steps", type=int, default=400)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eval-images", type=int, default=32)
    parser.add_argument("--train-images", type=int, default=192)
    parser.add_argument(
        "--stage-caps", type=str, default="",
        help="comma-separated backbone_stage_caps override, e.g. "
             "48,128,0,0 (quality evidence for a capped architecture "
             "before it ships in Config.fast())")
    parser.add_argument(
        "--prn-crop-margin", type=float, default=None,
        help="config.prn.crop_margin override (PRN trains and infers "
             "with the same margin; 128-squared A/B favored 0.1 — "
             "NOTES_r3.md)")
    parser.add_argument(
        "--style", type=str, default="v2",
        choices=("v1", "v2", "v2flat"),
        help="fixtures distribution (data/synthetic.make_dataset). v2 is "
             "the default long-horizon curve distribution; v1 is the "
             "calibrated quality-control distribution (f32/1200 steps "
             "reproduces the round-3 e2e AP ≈ 0.69 table entry) — used "
             "as the sensitive control for the bf16-training A/B")
    parser.add_argument(
        "--compute-dtype", type=str, default="float32",
        choices=("float32", "bfloat16"),
        help="model compute dtype for TRAINING (losses/optimizer stay "
             "f32 — train/steps.py upcasts at every loss head). float32 "
             "is the calibrated default; bfloat16 is the training-"
             "throughput lever measured in NOTES_r5 (speed + quality "
             "control at the same operating point)")
    parser.add_argument(
        "--checkpoint-dir", type=str, default="",
        help="enable Orbax checkpointing/resume in this dir. Long-horizon "
             "curve runs split into chunks (run chunk 1 with --steps N "
             "--skip-eval, then chunk 2 with --steps 2N resuming here): "
             "the axon client leaks host RAM across very long "
             "single-process runs (the round-5 19 200-step attempt was "
             "host-OOM-killed at step 8 600 with 71 GB RSS — NOTES_r5), "
             "so bound each process. NOTE: a resumed chunk restarts the "
             "shuffled epoch stream, so the data ORDER differs from a "
             "straight-through run of the same total steps.")
    parser.add_argument(
        "--skip-eval", action="store_true",
        help="train only (chunk 1 of a resumed pair) — no PRN train, no "
             "eval")
    args = parser.parse_args()

    cfg = Config.fast()
    caps = (tuple(int(c) for c in args.stage_caps.split(","))
            if args.stage_caps else cfg.model.backbone_stage_caps)
    if args.prn_crop_margin is not None:
        cfg = cfg.replace(prn=dataclasses.replace(
            cfg.prn, crop_margin=args.prn_crop_margin))
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, compute_dtype=args.compute_dtype, bn_momentum=0.95,
            backbone_stage_caps=caps,
        ),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(
            image_size=SIZE, batch_size=args.batch_size,
            num_steps=args.steps, warmup_steps=50, learning_rate=2e-3,
            log_interval_steps=50,
            checkpoint_dir=args.checkpoint_dir or "/tmp/unused_ckpt",
            save_interval_steps=max(args.steps // 4, 1),
        ),
    )
    # Crowded scenes: up to 8 persons (BASELINE.json config 4 regime).
    train_records = make_dataset(args.train_images, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=8, seed=0,
                                 style=args.style)
    eval_records = make_dataset(args.eval_images, img_h=SIZE, img_w=SIZE,
                               min_persons=2, max_persons=8, seed=999,
                               style=args.style)

    t0 = time.time()
    state = train(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, SIZE,
                       cfg.prn.max_persons, train=True),
        checkpoint=bool(args.checkpoint_dir),
        log_fn=lambda m: print(json.dumps(m), flush=True),
    )
    print(f"# trained {args.steps} steps in {time.time() - t0:.0f}s",
          flush=True)
    if args.skip_eval:
        return

    prn_state = prn_train.train_prn(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, SIZE,
                       cfg.prn.max_persons, train=True, augment=False),
        num_steps=args.prn_steps,
        log_fn=lambda m: print(json.dumps(m), flush=True),
    )

    state = jax.device_get(state)
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}
    prn_variables = jax.device_get(prn_state.params)
    # Eval-time memory hygiene (the round-5 9600-step run was host-killed
    # at eval before its controls printed): the train scenes are no longer
    # needed, and at most ONE predictor is live at a time below.
    del train_records
    import gc
    gc.collect()
    predictor = Predictor(
        config=cfg,
        variables=variables,
        prn_variables=prn_variables,
        image_size=SIZE,
    )

    # Detector-driven end-to-end AP (the predict() contract) at the
    # SHIPPED pre-NMS pool, plus a pool-256 control: the pool is an
    # inference-graph-only knob, so one training run provides evidence
    # for both (VERDICT r3: pool128 is the benchmarked operating point).
    stats = evaluate_predictor(predictor, eval_records)
    print(json.dumps({"e2e_512": stats,
                      "pool": cfg.detector.pre_nms_top_k}), flush=True)

    # GT-box PRN protocol (the reference's PRN evaluation) — uses the same
    # predictor, so it runs before the pool-256 control replaces it.
    ev = KeypointEvaluator()
    for rec in eval_records:
        kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
        dts = [DetectionKP(keypoints=kps[p].astype(np.float32), score=1.0)
               for p in range(len(rec["boxes"]))]
        ev.add_image(record_ground_truths(rec), dts)
    print(json.dumps({"gtbox_512": ev.summarize()}), flush=True)

    del predictor
    gc.collect()
    cfg256 = cfg.replace(detector=dataclasses.replace(
        cfg.detector, pre_nms_top_k=256))
    stats256 = evaluate_predictor(
        Predictor(config=cfg256, variables=variables,
                  prn_variables=prn_variables, image_size=SIZE),
        eval_records,
    )
    print(json.dumps({"e2e_512_pool256": stats256}), flush=True)


if __name__ == "__main__":
    main()
