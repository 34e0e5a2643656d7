"""Resume the 512² iou_head A/B's last two rows from cached weights.

The main run (`iou_head_ab.py --size 512 --seeds 0`) trained both arms
and recorded base ship/soft+vote/gtbox and iouh p1-ship/p1-soft/p2-ship
before an axon tunnel wedge froze the client (NOTES_r5.md). Weights are
cached in /tmp/ab_iouh_crowd512_{base,iouh}_s0.pkl; this recomputes the
missing iouh p=2 soft+vote row and the iouh GT-box control.

Usage: JAX_PLATFORMS=axon python benchmarks/ab/iou_head_512_resume.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
_sys.path.insert(0, str(_Path(__file__).resolve().parent))

import dataclasses
import json
import pickle

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import iou_head_ab as ab
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.eval.runner import (
    evaluate_batched,
    record_ground_truths,
)
from multiposenet_tpu.infer.predictor import Predictor


def main() -> None:
    ab.SIZE, ab.STEPS, ab.PRN_STEPS = 512, 1200, 400
    cfg = ab.crowd_config(0, {"iou_head": True, "iou_loss_weight": 1.0})
    with open("/tmp/ab_iouh_crowd512_iouh_s0.pkl", "rb") as f:
        variables, prn_variables = pickle.load(f)
    eval_records = make_dataset(32, img_h=512, img_w=512,
                                min_persons=5, max_persons=9, seed=999,
                                style="v1", min_size=0.2, max_size=0.6)

    # Missing row 1: p=2 under the crowd composition.
    cfg_n = cfg.replace(detector=dataclasses.replace(
        cfg.detector, iou_score_power=2.0, soft_nms_sigma=0.5,
        nms_vote_iou=0.75))
    pred = Predictor(config=cfg_n, variables=variables,
                     prn_variables=prn_variables, image_size=512)
    stats = evaluate_batched(pred, eval_records,
                             batch_size=len(eval_records))
    print(json.dumps({"tag": "crowd512_iouh_s0", "arm": "iouh",
                      "power": 2.0, "nms": "soft+vote",
                      "e2e_AP": stats["AP"], "e2e_AP50": stats["AP50"],
                      "e2e_AP75": stats["AP75"], "AR": stats.get("AR")}),
          flush=True)

    # Missing row 2: GT-box control (must be flat vs base's 0.9187).
    pred = Predictor(config=cfg, variables=variables,
                     prn_variables=prn_variables, image_size=512)
    ev = KeypointEvaluator()
    for rec in eval_records:
        kps = pred.predict_given_boxes(rec["image"], rec["boxes"])
        ev.add_image(
            record_ground_truths(rec),
            [DetectionKP(keypoints=kps[p].astype(np.float32), score=1.0)
             for p in range(len(rec["boxes"]))],
        )
    s = ev.summarize()
    print(json.dumps({"tag": "crowd512_iouh_s0", "arm": "iouh",
                      "protocol": "gtbox", "AP": s["AP"],
                      "AP75": s["AP75"]}), flush=True)


if __name__ == "__main__":
    main()
