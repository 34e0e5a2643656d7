"""Eval-only A/B: pose-level OKS NMS on top of the crowd composition.

Soft-NMS keeps decayed duplicate boxes alive; the PRN's peak-snap then
often lands those duplicates on the SAME peaks, producing duplicate
skeletons that cost precision. `detector.pose_nms_oks` suppresses a
detection whose keypoints duplicate a higher-scoring detection's pose
(OKS above the threshold). This harness measures the knob layered on
the best known crowd composition (giou w=5 model + soft-NMS sigma 0.5 +
vote 0.75) AND on the plain shipped baseline, on both cached crowd
model seeds, eval-only (deterministic arms, deltas are real).

Usage: python benchmarks/ab/pose_nms_ab.py [--sparse]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import dataclasses
import json
import os
import pickle

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snap_ab import base_config
from multiposenet_tpu.data.synthetic import make_dataset
import functools as _functools
# Round-3 harness: recorded numbers + cached /tmp weights are fixtures
# v1; pin it so the round-4 v2 default can't mismatch (NOTES_r4.md trap).
make_dataset = _functools.partial(make_dataset, style="v1",
                                  min_size=0.2, max_size=0.6)
from multiposenet_tpu.eval.runner import evaluate_predictor
from multiposenet_tpu.infer.predictor import Predictor

SIZE = 128


def run(tag, cfg0, variables, prn_variables, eval_records):
    # Two base compositions x pose-NMS thresholds (0 = off).
    bases = {
        "ship": {},
        "soft+vote": {"soft_nms_sigma": 0.5, "nms_vote_iou": 0.75},
    }
    for bname, base in bases.items():
        for oks in (0.0, 0.7, 0.8, 0.9):
            cfg = cfg0.replace(detector=dataclasses.replace(
                cfg0.detector, pose_nms_oks=oks, **base))
            predictor = Predictor(config=cfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            s = evaluate_predictor(predictor, eval_records)
            print(json.dumps({"model": tag, "base": bname, "pose_nms": oks,
                              "e2e_AP": s["AP"], "e2e_AP50": s["AP50"],
                              "e2e_AP75": s["AP75"], "AR": s.get("AR")}),
                  flush=True)


def main() -> None:
    sparse = "--sparse" in _sys.argv
    cfg0 = base_config()
    if not sparse:
        cfg0 = cfg0.replace(
            prn=dataclasses.replace(cfg0.prn, max_persons=12),
            detector=dataclasses.replace(cfg0.detector, max_detections=12),
        )
        eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                    min_persons=5, max_persons=9, seed=999)
        models = [
            ("crowd_giou_s0", "/tmp/ab_crowd_giou_w5.pkl"),
            ("crowd_giou_s11", "/tmp/ab_crowd_giou_w5_s11.pkl"),
        ]
    else:
        eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                    min_persons=1, max_persons=4, seed=999)
        models = [
            ("sparse_giou_s0", "/tmp/ab_giou_giou_w5_s0.pkl"),
        ]
    for tag, main_path in models:
        if not os.path.exists(main_path):
            print(json.dumps({"model": tag, "skipped": "no cache"}))
            continue
        # Caches are (main_variables, prn_variables) tuples.
        with open(main_path, "rb") as f:
            variables, prn_variables = pickle.load(f)
        run(tag, cfg0, variables, prn_variables, eval_records)


if __name__ == "__main__":
    main()
