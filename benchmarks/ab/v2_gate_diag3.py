"""v2-gate diagnosis, part 3: single-image overfit + miss taxonomy.

Part 2 (v2_gate_diag2.py) showed the gate model cannot fit its own
training set on v2 geometry at any rendering, that width 0.5 helps but
does not cure, and that upweighting the heatmap loss hurts. Two
questions remain that separate "structurally broken" from "merely
underfit":

  1. OVERFIT-1: train on ONE v2 scene repeated as every batch element.
     Any healthy conv net memorizes one image in a few hundred steps; if
     the per-channel argmax still misses its blob, something structural
     (target alignment, masking, BN, stem aliasing) is wrong.
  2. MISS TAXONOMY: when channel c's argmax lands >4 px from its GT,
     is it at ANOTHER channel's blob (identity confusion), at another
     PERSON's same-channel blob (instance confusion), or in empty space
     (diffuse underfit / misalignment)?

Usage: python benchmarks/ab/v2_gate_diag3.py [--steps 300] [--width 0.25]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import argparse
import dataclasses
import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from v2_gate_diag import gate_config
from v2_gate_diag2 import make_v2_dataset
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train.loop import train
from multiposenet_tpu.utils.constants import NUM_KEYPOINTS


def miss_taxonomy(hm: np.ndarray, persons: np.ndarray) -> dict:
    """Classify each visible GT keypoint's channel-argmax miss."""
    counts = {"hit_lt4": 0, "identity_confusion": 0,
              "instance_confusion": 0, "empty_space": 0}
    details = []
    for p_idx, person in enumerate(persons):
        for c in range(NUM_KEYPOINTS):
            x, y, v = person[c]
            if v != 2.0:
                continue
            ay, ax = np.unravel_index(np.argmax(hm[..., c]), hm.shape[:2])
            ayx = np.array([ay * 4.0, ax * 4.0])
            d_own = float(np.hypot(ayx[0] - y, ayx[1] - x))
            if d_own < 4.0:
                counts["hit_lt4"] += 1
                continue
            # Nearest visible GT keypoint of ANY channel/person to argmax.
            best = ("empty_space", 1e9)
            for q_idx, q in enumerate(persons):
                for c2 in range(NUM_KEYPOINTS):
                    x2, y2, v2 = q[c2]
                    if v2 != 2.0:
                        continue
                    d = float(np.hypot(ayx[0] - y2, ayx[1] - x2))
                    if d < best[1]:
                        if c2 != c:
                            best = ("identity_confusion", d)
                        elif q_idx != p_idx:
                            best = ("instance_confusion", d)
                        else:
                            best = ("own_far", d)
            kind = best[0] if best[1] < 4.0 else "empty_space"
            if kind == "own_far":
                kind = "empty_space"  # nearest is own kp but >4px: diffuse
            counts[kind] = counts.get(kind, 0) + 1
            details.append({"c": c, "d_own": round(d_own, 1),
                            "kind": kind})
    return {"counts": counts, "misses": details[:20]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--fpn", type=int, default=32)
    ap.add_argument("--head", type=int, default=32)
    ap.add_argument("--image-seed", type=int, default=3)
    args = ap.parse_args()

    cfg = gate_config(args.size, args.steps)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, backbone_width=args.width, fpn_channels=args.fpn,
            head_channels=args.head),
        train=dataclasses.replace(cfg.train, log_interval_steps=60),
    )
    # ONE scene, duplicated — the easiest task a heatmap model can face.
    rec = make_v2_dataset(1, args.size, args.size, args.image_seed,
                          "occ")[0]
    records = [rec] * 8
    print(json.dumps({"arm": vars(args),
                      "persons": int(len(rec["boxes"])),
                      "visible_kps": int((rec["keypoints"][..., 2] == 2)
                                         .sum())}))
    losses = []
    state = train(
        cfg,
        batch_iterator(records, 8, args.size, cfg.prn.max_persons,
                       train=True, augment=False),
        checkpoint=False,
        log_fn=lambda m: losses.append(m),
    )
    state = jax.device_get(state)
    predictor = Predictor(
        config=cfg,
        variables={"params": state.ema_params,
                   "batch_stats": state.batch_stats},
        image_size=args.size,
    )
    print(json.dumps({"hm_loss_curve": [
        (m["step"], round(m["heatmap_loss"], 4)) for m in losses]}))
    hm = predictor.predict_heatmaps(rec["image"])
    at_gt, mx = [], []
    for person in rec["keypoints"]:
        for c in range(NUM_KEYPOINTS):
            x, y, v = person[c]
            if v != 2.0:
                continue
            cy = int(np.clip(round(y / 4.0), 0, hm.shape[0] - 1))
            cx = int(np.clip(round(x / 4.0), 0, hm.shape[1] - 1))
            at_gt.append(float(hm[cy, cx, c]))
            mx.append(float(hm[..., c].max()))
    print(json.dumps({"overfit1": {
        "mean_at_gt": round(float(np.mean(at_gt)), 3),
        "mean_ch_max": round(float(np.mean(mx)), 3),
    }}))
    print(json.dumps({"taxonomy": miss_taxonomy(hm, rec["keypoints"])}))


if __name__ == "__main__":
    main()
