"""A/B: PRN crop_margin on CROWDS — the keypoint-exclusion counter-lever.

Round-4 error attribution (NOTES_r4.md): `bad_kps` events sit at mean
match IoU 0.60 — matched-but-sloppy boxes crop the PRN window off the
person, excluding keypoints the per-channel softmax can never recover. A
larger crop margin keeps those keypoints in view; the risk in crowds is
the opposite failure (more neighbor peaks in the crop → discrimination
errors). Round 3 measured margin only up to 0.1 and only in the
composed-knobs arm; this sweeps {0.0, 0.1, 0.2, 0.3} on the cached crowd
models (v1 fixtures to match the cached weights), PRN retrained per
margin (the PRN must train with the margin it serves), eval under the
crowd composition (soft σ=0.5 + vote 0.75) + GT-box protocol +
attribution classes.

Usage: python benchmarks/ab/margin_crowd_ab.py [margins...]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import collections
import dataclasses
import json
import os
import pickle

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from snap_ab import base_config
from error_attrib import attribute_scene
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.eval.runner import (
    evaluate_predictor,
    record_ground_truths,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train

SIZE = 128


def main() -> None:
    margins = [float(m) for m in _sys.argv[1:]] or [0.0, 0.1, 0.2, 0.3]
    cfg0 = base_config().replace(
        prn=dataclasses.replace(base_config().prn, max_persons=12),
        detector=dataclasses.replace(
            base_config().detector, max_detections=12,
            soft_nms_sigma=0.5, nms_vote_iou=0.75),
    )
    v1 = dict(style="v1", min_size=0.2, max_size=0.6)
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=5, max_persons=9, seed=0,
                                 **v1)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=5, max_persons=9, seed=999,
                                **v1)

    for tag, path in (("crowd_giou_s0", "/tmp/ab_crowd_giou_w5.pkl"),
                      ("crowd_giou_s11", "/tmp/ab_crowd_giou_w5_s11.pkl")):
        with open(path, "rb") as f:
            variables, _ = pickle.load(f)
        for margin in margins:
            cfg = cfg0.replace(prn=dataclasses.replace(
                cfg0.prn, crop_margin=margin))
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
            stats = evaluate_predictor(predictor, eval_records)
            attr = collections.Counter()
            for rec in eval_records:
                attr += attribute_scene(predictor.predict(rec["image"]),
                                        rec)
            gt_n = max(attr["gt_total"], 1)
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
            g = ev.summarize()
            print(json.dumps({
                "tag": tag, "margin": margin,
                "e2e_AP": stats["AP"], "e2e_AP50": stats["AP50"],
                "e2e_AP75": stats["AP75"], "AR": stats.get("AR"),
                "gtbox_AP": g["AP"], "gtbox_AP75": g["AP75"],
                "bad_kps_rate": round(attr["bad_kps"] / gt_n, 3),
                "poor_box_rate": round(attr["poor_box"] / gt_n, 3),
                "ok_rate": round(attr["ok"] / gt_n, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
