"""Error attribution: decompose e2e AP loss into ranked failure classes.

VERDICT r3 #4: "crowd e2e AP is 0.31" is a number, not a work-list. For
each eval scene this classifies every AP-losing event so the next round's
effort goes to the right subsystem:

  per GT person (recall side):
    undetected   — no detection overlaps it (IoU < 0.1): detector recall
    poor_box     — best detection IoU in [0.1, 0.5): box localization
    prn_miss     — matched box (IoU ≥ 0.5) but keypoints score OKS < 0.5
                   against THIS person while scoring ≥ 0.5 against a
                   DIFFERENT person: the PRN picked a neighbor's peaks
    bad_kps      — matched box, OKS < 0.5 against everyone: heatmap/
                   decode quality (or a hopeless crop)
    ok           — matched box, OKS ≥ 0.5

  per detection (precision side):
    duplicate    — IoU ≥ 0.5 with an already-claimed GT: NMS survivor
    false_pos    — IoU < 0.1 with every GT

Usage:
  python benchmarks/ab/error_attrib.py [--style v1|v2] [--sparse-only]

Models: the cached round-3 A/B weights (GIoU w=5 @128², seeds 0/11 —
trained on v1 fixtures, so --style v1 is the apples-to-apples default;
--style v2 measures the same weights on the harder fixtures-v2 scenes).
Arms: ship NMS and the crowd composition (soft σ=0.5 + vote 0.75).
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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
import numpy as np

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snap_ab import base_config
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval.oks import _oks_matrix, DetectionKP
from multiposenet_tpu.eval.runner import record_ground_truths
from multiposenet_tpu.infer.predictor import Predictor

SIZE = 128
IOU_MATCH = 0.5
IOU_TOUCH = 0.1
OKS_GOOD = 0.5


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    y0 = np.maximum(a[:, None, 0], b[None, :, 0])
    x0 = np.maximum(a[:, None, 1], b[None, :, 1])
    y1 = np.minimum(a[:, None, 2], b[None, :, 2])
    x1 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(y1 - y0, 0, None) * np.clip(x1 - x0, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def attribute_scene(people, rec) -> collections.Counter:
    """Classify every GT person and every detection of one scene."""
    c = collections.Counter()
    gts = record_ground_truths(rec)
    gt_boxes = np.asarray(rec["boxes"], np.float32)
    c["gt_total"] += len(gts)
    if not people:
        c["undetected"] += len(gts)
        return c
    det_boxes = np.stack([p.box for p in people]).astype(np.float32)
    order = np.argsort([-p.score for p in people])
    iou = box_iou(det_boxes, gt_boxes)                     # [D, G]
    oks = _oks_matrix(
        [DetectionKP(np.asarray(p.keypoints, np.float32), p.score)
         for p in people],
        gts,
    )                                                      # [D, G]

    claimed = np.full(len(gts), -1)                        # gt -> det
    det_class = {}
    for d in order:
        cand = np.flatnonzero((claimed < 0) & (iou[d] >= IOU_MATCH))
        if len(cand):
            g = cand[np.argmax(iou[d][cand])]
            claimed[g] = d
            det_class[d] = "matched"
        elif (iou[d] >= IOU_MATCH).any():
            det_class[d] = "duplicate"
        elif (iou[d] >= IOU_TOUCH).any():
            det_class[d] = "det_poor_box"
        else:
            det_class[d] = "false_pos"
    for g, d in enumerate(claimed):
        if d < 0:
            best = iou[:, g].max() if len(people) else 0.0
            c["poor_box" if best >= IOU_TOUCH else "undetected"] += 1
            continue
        if oks[d, g] >= OKS_GOOD:
            cls = "ok"
        elif np.delete(oks[d], g).max(initial=0.0) >= OKS_GOOD:
            cls = "prn_miss"
        else:
            cls = "bad_kps"
        c[cls] += 1
        # Match-IoU sum per class: is bad_kps box-induced (low match IoU)
        # or genuine keypoint failure at a good box?
        c[f"{cls}_iou_sum"] += float(iou[d, g] * 1000)
    for d, k in det_class.items():
        if k != "matched":
            c[k] += 1
    c["det_total"] += len(people)
    return c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="v1", choices=["v1", "v2"])
    ap.add_argument("--sparse-only", action="store_true")
    ap.add_argument("--num-images", type=int, default=64)
    args = ap.parse_args()

    cfg0 = base_config()
    fixture_kw = (
        {"style": "v1", "min_size": 0.2, "max_size": 0.6}
        if args.style == "v1" else {"style": "v2"}
    )
    datasets = [("sparse", 1, 4, cfg0)]
    if not args.sparse_only:
        crowd_cfg = cfg0.replace(
            prn=dataclasses.replace(cfg0.prn, max_persons=12),
            detector=dataclasses.replace(cfg0.detector, max_detections=12),
        )
        datasets.append(("crowd", 5, 9, crowd_cfg))

    models = [("giou_s0", "/tmp/ab_giou_giou_w5_s0.pkl"),
              ("crowd_giou_s0", "/tmp/ab_crowd_giou_w5.pkl")]
    arms = [("ship", {}),
            ("soft+vote", {"soft_nms_sigma": 0.5, "nms_vote_iou": 0.75})]

    for dname, lo, hi, dcfg in datasets:
        records = make_dataset(args.num_images, img_h=SIZE, img_w=SIZE,
                               min_persons=lo, max_persons=hi, seed=999,
                               **fixture_kw)
        tag, path = models[0] if dname == "sparse" else models[1]
        with open(path, "rb") as f:
            variables, prn_variables = pickle.load(f)
        for aname, overrides in arms:
            cfg = dcfg.replace(detector=dataclasses.replace(
                dcfg.detector, **overrides))
            predictor = Predictor(config=cfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            total = collections.Counter()
            for rec in records:
                total += attribute_scene(predictor.predict(rec["image"]),
                                         rec)
            gt_n = max(total["gt_total"], 1)
            out = {
                "dataset": dname, "model": tag, "arm": aname,
                "style": args.style, "gt_total": total["gt_total"],
                "det_total": total["det_total"],
            }
            for k in ("ok", "undetected", "poor_box", "prn_miss",
                      "bad_kps"):
                out[k] = total[k]
                out[f"{k}_rate"] = round(total[k] / gt_n, 3)
                if total[k] and f"{k}_iou_sum" in total:
                    out[f"{k}_mean_iou"] = round(
                        total[f"{k}_iou_sum"] / 1000.0 / total[k], 3)
            for k in ("duplicate", "det_poor_box", "false_pos"):
                out[k] = total[k]
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
