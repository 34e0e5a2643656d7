"""Diagnose the red fixtures-v2 quality gates (VERDICT r4 next-round #1).

The round-4 gates (tests/test_integration_{smoke,ap}.py) switched to
fixtures v2 at 96 px with floors copied from a calibration that never
completed; both tiers are red (smoke e2e AP 0.0; slow GT-box AP50 0.02 vs
0.8). This harness reproduces the gate configuration and separates the
three failure hypotheses the verdict names:

  (a) training budget — loss curve + arms at more steps / larger size;
  (b) rendering learnability — RAW heatmap quality, measured as the
      distance from every visible (v=2) GT keypoint to the nearest decoded
      same-channel peak, independent of detector and PRN;
  (c) OKS-area infeasibility — per-GT area stats plus a decode-oracle AP
      (each GT scored with the nearest-peak-per-channel assignment, the
      upper bound any assignment stage can reach given these heatmaps).

Arms are selected by CLI flags so runs serialize cleanly on the 1-core box:

  python benchmarks/ab/v2_gate_diag.py --style v2 --steps 160 --size 96
  python benchmarks/ab/v2_gate_diag.py --style v1 --steps 160 --size 96
  python benchmarks/ab/v2_gate_diag.py --style v2 --steps 500 --size 128

Interpretation grid:
  v1 arm green + v2 arm red        → the recipe is fine; v2 is the issue.
  peak quality bad                 → training/rendering (hypothesis a/b).
  peak quality good, oracle AP low → OKS-area infeasibility (c).
  oracle AP high, GT-box AP low    → PRN assignment broke on v2.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import argparse
import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

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
from multiposenet_tpu.eval.oks import (
    DetectionKP,
    GroundTruth,
    KeypointEvaluator,
)
from multiposenet_tpu.eval.runner import (
    evaluate_predictor,
    record_ground_truths,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train


def gate_config(size: int, steps: int) -> Config:
    """The exact smoke/slow gate operating point (only num_steps varies)."""
    return Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32, bn_momentum=0.9),
        detector=DetectorConfig(score_threshold=0.05, max_detections=6,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=128,
                      max_persons=4),
        decode=DecodeConfig(score_threshold=0.1),
        train=TrainConfig(image_size=size, batch_size=8, num_steps=steps,
                          warmup_steps=20, learning_rate=3e-3, seed=0),
    )


def peak_quality(predictor: Predictor, records: list[dict]) -> dict:
    """Distance from each visible GT keypoint to the nearest decoded
    same-channel peak (detector- and PRN-independent heatmap quality)."""
    errs, errs_v1 = [], []
    for rec in records:
        pos, _scores, valid = predictor.predict_keypoints(rec["image"])
        for person in rec["keypoints"]:
            for c in range(17):
                x, y, v = person[c]
                if v <= 0:
                    continue
                cand = pos[c][valid[c]]
                if cand.shape[0] == 0:
                    d = float("inf")
                else:
                    d = float(np.min(np.hypot(cand[:, 0] - y,
                                              cand[:, 1] - x)))
                (errs if v == 2 else errs_v1).append(d)
    def stats(e):
        if not e:
            return {}
        e = np.asarray(e)
        fin = e[np.isfinite(e)]
        return {
            "n": int(e.size),
            "median_px": float(np.median(fin)) if fin.size else float("inf"),
            "frac_lt2": float((e < 2).mean()),
            "frac_lt4": float((e < 4).mean()),
            "frac_no_peak": float(np.isinf(e).mean()),
        }
    return {"v2_visible": stats(errs), "v1_occluded": stats(errs_v1)}


def oracle_assign_ap(predictor: Predictor, records: list[dict]) -> dict:
    """Upper-bound AP: each GT person gets, per channel, the decoded peak
    nearest to ITS OWN GT keypoint. No assignment stage can beat this for
    the given heatmaps, so a low value here means decode/OKS-infeasibility,
    not PRN."""
    ev = KeypointEvaluator()
    for rec in records:
        pos, scores, valid = predictor.predict_keypoints(rec["image"])
        dts = []
        for person in rec["keypoints"]:
            kp = np.zeros((17, 3), np.float32)
            for c in range(17):
                x, y, v = person[c]
                cand = pos[c][valid[c]]
                if cand.shape[0] == 0:
                    continue
                i = int(np.argmin(np.hypot(cand[:, 0] - y,
                                           cand[:, 1] - x)))
                kp[c] = [cand[i, 1], cand[i, 0],
                         float(scores[c][valid[c]][i])]
            dts.append(DetectionKP(keypoints=kp, score=1.0))
        ev.add_image(record_ground_truths(rec), dts)
    return ev.summarize()


def gtbox_ap(predictor: Predictor, records: list[dict]) -> dict:
    ev = KeypointEvaluator()
    for rec in records:
        kps = predictor.predict_given_boxes(rec["image"], rec["boxes"])
        ev.add_image(
            record_ground_truths(rec),
            [DetectionKP(keypoints=kps[p].astype(np.float32), score=1.0)
             for p in range(len(rec["boxes"]))],
        )
    return ev.summarize()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="v2",
                    choices=["v1", "v2", "v2flat"])
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--prn-steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--train-images", type=int, default=48)
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--min-size", type=float, default=0.3)
    ap.add_argument("--max-size", type=float, default=0.65)
    ap.add_argument("--overhang", type=float, default=0.35,
                    help="border-truncation allowance as a fraction of "
                         "person size (0 = centers stay in frame)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses
    cfg = gate_config(args.size, args.steps)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, seed=args.seed, log_interval_steps=20))
    kw = dict(img_h=args.size, img_w=args.size, min_persons=1,
              max_persons=2, style=args.style,
              min_size=args.min_size, max_size=args.max_size,
              overhang=args.overhang)
    records = make_dataset(args.train_images, seed=0, **kw)
    eval_records = make_dataset(args.eval_images, seed=77, **kw)

    areas = np.concatenate([r["area"] for r in eval_records])
    n_v1 = sum(int((r["keypoints"][..., 2] == 1).sum())
               for r in eval_records)
    n_v2 = sum(int((r["keypoints"][..., 2] == 2).sum())
               for r in eval_records)
    print(json.dumps({
        "arm": vars(args),
        "eval_gt_areas": [float(areas.min()), float(np.median(areas)),
                          float(areas.max())],
        "eval_kp_counts": {"v2_visible": n_v2, "v1_occluded": n_v1},
    }))

    losses = []
    state = train(
        cfg,
        batch_iterator(records, 8, args.size, cfg.prn.max_persons,
                       train=True, augment=False),
        checkpoint=False,
        log_fn=lambda m: losses.append(m),
    )
    prn_state = prn_train.train_prn(
        cfg,
        batch_iterator(records, 8, args.size, cfg.prn.max_persons,
                       train=True, augment=False),
        num_steps=args.prn_steps,
    )
    state = jax.device_get(state)
    predictor = Predictor(
        config=cfg,
        variables={"params": state.ema_params,
                   "batch_stats": state.batch_stats},
        prn_variables=jax.device_get(prn_state.params),
        image_size=args.size,
    )

    print(json.dumps({"loss_curve": [
        {k: round(v, 4) for k, v in m.items()
         if k in ("step", "loss", "heatmap_loss", "cls_loss", "box_loss")}
        for m in losses
    ]}))
    print(json.dumps({"peak_quality": peak_quality(predictor,
                                                   eval_records)}))
    print(json.dumps({"oracle_assign": oracle_assign_ap(predictor,
                                                        eval_records)}))
    print(json.dumps({"gtbox": gtbox_ap(predictor, eval_records)}))
    print(json.dumps({"e2e": evaluate_predictor(predictor, eval_records)}))


if __name__ == "__main__":
    main()
