"""A/B: IoU-aware box scoring head (DetectorConfig.iou_head) on crowds.

Round-4 error attribution (NOTES_r4.md): ~36% of crowd GT is lost to box
quality — `poor_box` 0.20 (a detection touches but IoU < 0.5) plus
`bad_kps` 0.16 at mean match IoU 0.60 (sloppy boxes crop the PRN window
off the person). The IoU head predicts each anchor's localization quality
and rescoring NMS by sigmoid(cls)·sigmoid(iou)^p lets the best-LOCALIZED
candidate win instead of the most-confident one.

Arms (each a full 500-step train → PRN → eval at 128²; --style picks
the fixture distribution, default v1: the round-4 error attribution
that motivated this knob was measured on v1 crowds, and the round-4
"v2" rendering was diagnosed in round 5 as unlearnable (NOTES_r5.md
arms 1-7) — a box-scoring knob measured on broken heatmaps is noise.
Pass --style v2 for the round-5 palette-coded default):

  base — iou_head off (crowd-recipe baseline: giou w5)
  iouh — iou_head on, trained with iou_loss_weight 1.0

Per arm, eval under ship NMS and the crowd composition (soft σ=0.5 +
vote 0.75); iou_score_power swept {0.5, 1, 2} EVAL-ONLY (the power only
changes the inference rescoring); GT-box protocol (box-independent
control — must be flat); error-attribution classes (poor_box/bad_kps
must shrink if the mechanism is right).

Usage: python benchmarks/ab/iou_head_ab.py [--seeds 0,11] [--sparse]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import argparse
import collections
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

from snap_ab import base_config
from error_attrib import attribute_scene
from multiposenet_tpu.config import Config
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

SIZE = 128          # --size 512 switches to the shipped-scale mode
STEPS = 500         # (Config.fast() arch, 1200 steps, AP-only eval)
PRN_STEPS = 300

ARMS = [
    ("base", {}),
    ("iouh", {"iou_head": True, "iou_loss_weight": 1.0}),
]
NMS_ARMS = [("ship", {}),
            ("soft+vote", {"soft_nms_sigma": 0.5, "nms_vote_iou": 0.75})]
POWERS = (0.5, 1.0, 2.0)


def crowd_config(seed_off: int, det_overrides: dict):
    if SIZE == 512:
        # Shipped-scale mode: the exact Config.fast() architecture
        # behind the throughput headline (as train_synthetic_512.py),
        # with the crowd giou-w5 recipe both arms.
        cfg = Config.fast()
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, compute_dtype="float32", bn_momentum=0.95),
            train=dataclasses.replace(
                cfg.train, image_size=SIZE, batch_size=16,
                num_steps=STEPS, warmup_steps=50, learning_rate=2e-3),
        )
    else:
        cfg = base_config()
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, num_steps=STEPS))
    return cfg.replace(
        detector=dataclasses.replace(
            cfg.detector, box_loss="giou", giou_loss_weight=5.0,
            max_detections=12, **det_overrides),
        prn=dataclasses.replace(cfg.prn, max_persons=12),
        train=dataclasses.replace(cfg.train,
                                  seed=cfg.train.seed + seed_off),
    )


def get_weights(tag: str, cfg, train_records):
    cache = f"/tmp/ab_iouh_{tag}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
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
    variables = {"params": state.ema_params,
                 "batch_stats": state.batch_stats}
    prn_state = prn_train.train_prn(
        cfg,
        batch_iterator(train_records, cfg.train.batch_size, SIZE,
                       cfg.prn.max_persons, train=True, augment=False),
        num_steps=PRN_STEPS,
        log_fn=lambda m: None,
    )
    prn_variables = jax.device_get(prn_state.params)
    print(f"# [{tag}] trained in {time.time() - t0:.0f}s", flush=True)
    with open(cache, "wb") as f:
        pickle.dump((variables, prn_variables), f)
    return variables, prn_variables


def main() -> None:
    global SIZE, STEPS, PRN_STEPS, POWERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,11")
    ap.add_argument("--sparse", action="store_true",
                    help="1-4-person scenes instead of 5-9 (regression "
                         "check: the knob must not hurt sparse)")
    ap.add_argument("--style", default="v1", choices=["v1", "v2"])
    ap.add_argument("--size", type=int, default=128, choices=[128, 512],
                    help="512 = shipped-scale mode: Config.fast() arch, "
                         "1200 steps / PRN 400, 32 eval scenes, AP-only "
                         "(no per-scene attribution: the tunnel's "
                         "per-predict latency dominates at 512², and the "
                         "error-class mechanism is established at 128²)")
    ap.add_argument("--steps", type=int, default=0,
                    help="override the training budget (long-horizon "
                         "quality points; 0 = the mode default)")
    ap.add_argument("--train-images", type=int, default=0,
                    help="override the train-scene count (0 = default)")
    ap.add_argument("--prn-steps", type=int, default=0,
                    help="override the PRN training budget (0 = default)")
    ap.add_argument("--arms", default="",
                    help="comma-subset of {base,iouh} (default: both)")
    ap.add_argument("--powers", default="",
                    help="comma-subset of iou_score_power values "
                         "(default: the mode's sweep)")
    args = ap.parse_args()
    if args.size == 512:
        SIZE, STEPS, PRN_STEPS, POWERS = 512, 1200, 400, (1.0, 2.0)
    if args.steps:
        STEPS = args.steps
    if args.prn_steps:
        PRN_STEPS = args.prn_steps
    if args.powers:
        POWERS = tuple(float(p) for p in args.powers.split(","))
    arms = ([a for a in ARMS if a[0] in args.arms.split(",")]
            if args.arms else ARMS)
    lo, hi = (1, 4) if args.sparse else (5, 9)
    dens = "sparse" if args.sparse else "crowd"
    if SIZE == 512:
        dens += "512"
    if args.style == "v1":
        # v1 is the default arena; tags stay round-4-comparable.
        skw = dict(style="v1", min_size=0.2, max_size=0.6)
    else:
        dens += "_v2"
        skw = dict(style="v2")

    n_train, n_eval = (192, 32) if SIZE == 512 else (128, 64)
    if args.train_images:
        n_train = args.train_images
    train_records = make_dataset(n_train, img_h=SIZE, img_w=SIZE,
                                 min_persons=lo, max_persons=hi, seed=0,
                                 **skw)
    eval_records = make_dataset(n_eval, img_h=SIZE, img_w=SIZE,
                                min_persons=lo, max_persons=hi, seed=999,
                                **skw)

    for seed_off in [int(s) for s in args.seeds.split(",")]:
        for arm, det_over in arms:
            cfg = crowd_config(seed_off, det_over)
            tag = f"{dens}_{arm}_s{seed_off}"
            if args.steps:
                tag += f"_st{args.steps}"   # budget overrides must not
            if args.train_images:           # reuse default-budget caches
                tag += f"_tr{args.train_images}"
            if args.prn_steps:
                tag += f"_pr{args.prn_steps}"
            variables, prn_variables = get_weights(tag, cfg, train_records)

            powers = POWERS if det_over.get("iou_head") else (1.0,)
            for power in powers:
                cfg_p = cfg.replace(detector=dataclasses.replace(
                    cfg.detector, iou_score_power=power))
                for nname, nover in NMS_ARMS:
                    cfg_n = cfg_p.replace(detector=dataclasses.replace(
                        cfg_p.detector, **nover))
                    predictor = Predictor(config=cfg_n, variables=variables,
                                          prn_variables=prn_variables,
                                          image_size=SIZE)
                    row = {"tag": tag, "arm": arm, "power": power,
                           "nms": nname}
                    if SIZE == 512:
                        # AP-only, one batched program (32 predicts
                        # through the tunnel would dominate otherwise).
                        from multiposenet_tpu.eval.runner import (
                            evaluate_batched)
                        stats = evaluate_batched(predictor, eval_records,
                                                 batch_size=len(
                                                     eval_records))
                    else:
                        stats = evaluate_predictor(predictor, eval_records)
                        attr = collections.Counter()
                        for rec in eval_records:
                            attr += attribute_scene(
                                predictor.predict(rec["image"]), rec)
                        gt_n = max(attr["gt_total"], 1)
                        row.update({
                            "poor_box_rate": round(
                                attr["poor_box"] / gt_n, 3),
                            "bad_kps_rate": round(
                                attr["bad_kps"] / gt_n, 3),
                            "ok_rate": round(attr["ok"] / gt_n, 3),
                        })
                    row.update({"e2e_AP": stats["AP"],
                                "e2e_AP50": stats["AP50"],
                                "e2e_AP75": stats["AP75"],
                                "AR": stats.get("AR")})
                    print(json.dumps(row), flush=True)

            # GT-box protocol: box-independent control, must be flat.
            predictor = Predictor(config=cfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            ev = KeypointEvaluator()
            for rec in eval_records:
                kps = predictor.predict_given_boxes(rec["image"],
                                                    rec["boxes"])
                ev.add_image(
                    record_ground_truths(rec),
                    [DetectionKP(keypoints=kps[p].astype(np.float32),
                                 score=1.0)
                     for p in range(len(rec["boxes"]))],
                )
            s = ev.summarize()
            print(json.dumps({"tag": tag, "arm": arm, "protocol": "gtbox",
                              "AP": s["AP"], "AP75": s["AP75"]}),
                  flush=True)


if __name__ == "__main__":
    main()
