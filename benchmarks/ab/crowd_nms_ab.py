"""Eval-only A/B: detection knobs on CROWDED scenes (5-9 persons, 128²).

The crowd e2e AP (~0.22) sits far below the GT-box protocol (~0.81):
the detector, not the PRN, is the crowd bottleneck. Greedy NMS at
IoU 0.5 suppresses genuinely-overlapping people, so sweep the
inference-graph-only detection knobs on one cached crowded model
(main model from crowd_jitter_ab.py's cache, one jitter-0 PRN):

  - nms_iou_threshold: 0.5 (ship) / 0.6 / 0.7 — keep more overlapping
    boxes alive;
  - Gaussian soft-NMS (detector.soft_nms_sigma 0.3 / 0.5) — decay
    instead of kill, the classic crowd fix;
  - max_detections head-room already set to 12 (vs 9 GT max);
  - nms_vote_iou on/off interaction at each arm.

Usage: python benchmarks/ab/crowd_nms_ab.py
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

SIZE = 128
MAIN_CACHE = "/tmp/ab_crowd_state.pkl"       # written by crowd_jitter_ab
PRN_CACHE = "/tmp/ab_crowd_prn_j0.pkl"


def main() -> None:
    cfg0 = base_config()
    cfg0 = cfg0.replace(
        prn=dataclasses.replace(cfg0.prn, max_persons=12),
        detector=dataclasses.replace(cfg0.detector, max_detections=12),
    )
    assert os.path.exists(MAIN_CACHE), "run crowd_jitter_ab.py first"
    with open(MAIN_CACHE, "rb") as f:
        variables = pickle.load(f)
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=5, max_persons=9, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=5, max_persons=9, seed=999)

    if os.path.exists(PRN_CACHE):
        with open(PRN_CACHE, "rb") as f:
            prn_variables = pickle.load(f)
    else:
        prn_state = prn_train.train_prn(
            cfg0,
            batch_iterator(train_records, cfg0.train.batch_size, SIZE,
                           cfg0.prn.max_persons, train=True, augment=False),
            num_steps=300,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)
        with open(PRN_CACHE, "wb") as f:
            pickle.dump(prn_variables, f)

    # Hard-NMS threshold arms, then Gaussian soft-NMS arms; vote on/off
    # interaction at each.
    arms = ([{"nms_iou_threshold": t} for t in (0.5, 0.6, 0.7)]
            + [{"soft_nms_sigma": s} for s in (0.3, 0.5)])
    for arm in arms:
        for vote in (0.0, 0.75):
            cfg = cfg0.replace(detector=dataclasses.replace(
                cfg0.detector, nms_vote_iou=vote, **arm))
            predictor = Predictor(config=cfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            s = evaluate_predictor(predictor, eval_records)
            print(json.dumps(arm | {"vote": vote,
                              "e2e_AP": s["AP"], "e2e_AP50": s["AP50"],
                              "e2e_AP75": s["AP75"], "AR": s.get("AR")}),
                  flush=True)


if __name__ == "__main__":
    main()
