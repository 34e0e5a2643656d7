"""v2-gate diagnosis, part 2: isolate the occlusion SILHOUETTE.

Part-1 arms (v2_gate_diag.py, NOTES_r5.md) eliminated truncation, scale,
training budget, and two identity codings (intensity, hue palette) — yet
every v2 arm stays near AP 0 while v1 stays green at the same budget.
The one v2 ingredient never isolated is the occlusion renderer itself:
every v2 arm drew opaque body silhouettes (render_scene_occluded);
v1 never does (render_scene). This harness holds v2 GEOMETRY fixed
(articulation, rotation, truncation — the same synth_person stream) and
flips only the renderer:

  --render occ    render_scene_occluded (silhouettes + erasure), as shipped
  --render plain  render_scene (blobs only) on the SAME persons

plus two measurements part 1 lacked:

  * TRAIN-set peak quality — memorization: if the net cannot even fit
    blobs it has seen 26 times (160 steps x bs 8 / 48 imgs), the failure
    is optimization/rendering, not generalization;
  * raw heatmap response at GT — for each visible train GT keypoint, the
    predicted channel value at the GT cell vs that channel's global max
    (a diffuse-vs-misplaced discriminator decoded peaks can't give).

Usage: python benchmarks/ab/v2_gate_diag2.py --render plain
"""

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

import dataclasses

import numpy as np

from v2_gate_diag import gate_config, gtbox_ap, peak_quality
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import (
    NUM_KEYPOINTS,
    render_scene,
    render_scene_occluded,
    synth_person,
)
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train


def make_v2_dataset(num_images, img_h, img_w, seed, render,
                    min_persons=1, max_persons=2,
                    min_size=0.3, max_size=0.65, overhang=0.35):
    """make_dataset's v2 loop with a renderer switch (same rng stream)."""
    rng = np.random.RandomState(seed)
    records = []
    for i in range(num_images):
        n = rng.randint(min_persons, max_persons + 1)
        kps, boxes, widths = [], [], []
        attempts = 0
        while len(kps) < n and attempts < n * 8:
            attempts += 1
            k, b = synth_person(rng, img_h, img_w, min_size=min_size,
                                max_size=max_size, style="v2",
                                overhang=overhang)
            if (k[:, 2] > 0).sum() < 4:
                continue
            kps.append(k)
            boxes.append(b)
            widths.append(0.04 * max(b[2] - b[0], b[3] - b[1]) + 1.5)
        if render == "occ":
            image, kps = render_scene_occluded(kps, img_h, img_w, widths)
            kps = np.asarray(kps, np.float32).reshape(-1, NUM_KEYPOINTS, 3)
        else:
            kps = np.asarray(kps, np.float32).reshape(-1, NUM_KEYPOINTS, 3)
            image = render_scene(kps, img_h, img_w)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        records.append({
            "id": i, "file_name": f"synthetic_{i:06d}.png",
            "height": img_h, "width": img_w,
            "keypoints": kps, "boxes": boxes,
            "iscrowd": np.zeros((len(boxes),), bool),
            "area": ((boxes[:, 2] - boxes[:, 0])
                     * (boxes[:, 3] - boxes[:, 1])).astype(np.float32),
            "image": image,
        })
    return records


def heatmap_response(predictor, records, limit=8):
    """Predicted value at each visible GT cell vs that channel's max."""
    at_gt, ch_max, argmax_d = [], [], []
    for rec in records[:limit]:
        hm = predictor.predict_heatmaps(rec["image"])  # [h, w, 17]
        for person in rec["keypoints"]:
            for c in range(NUM_KEYPOINTS):
                x, y, v = person[c]
                if v != 2.0:
                    continue
                cy = int(np.clip(round(y / 4.0), 0, hm.shape[0] - 1))
                cx = int(np.clip(round(x / 4.0), 0, hm.shape[1] - 1))
                at_gt.append(float(hm[cy, cx, c]))
                ch_max.append(float(hm[..., c].max()))
                ay, ax = np.unravel_index(np.argmax(hm[..., c]),
                                          hm.shape[:2])
                argmax_d.append(float(np.hypot(ay - y / 4.0,
                                               ax - x / 4.0)) * 4.0)
    return {
        "n": len(at_gt),
        "mean_at_gt": round(float(np.mean(at_gt)), 4),
        "mean_ch_max": round(float(np.mean(ch_max)), 4),
        "ratio_at_gt_over_max": round(
            float(np.mean(np.asarray(at_gt)
                          / np.maximum(np.asarray(ch_max), 1e-6))), 4),
        "median_argmax_dist_px": round(float(np.median(argmax_d)), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--render", default="plain", choices=["plain", "occ"])
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--prn-steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    # Capacity arms: the round-4 gate model (width 0.25 = an 8-channel
    # stem compressing each 4x4 patch) fits v1's single rigid template
    # but may not have room for 17 hue identities x sub-patch position.
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--fpn", type=int, default=32)
    ap.add_argument("--head", type=int, default=32)
    # Gradient-share arm: at convergence the heatmap term is a few
    # percent of the total loss, so the SHARED trunk (stem/FPN) is
    # steered almost entirely by the detector losses. v1 needed no
    # trunk features beyond blob positions; v2's identity features
    # (hue -> keypoint type) only get trained if the heatmap loss has
    # gradient share.
    ap.add_argument("--hm-weight", type=float, default=1.0)
    # Budget-economics arms (diag3 proved single-image overfit works, so
    # the failure is plain underfitting of 48 diverse scenes in a gate
    # budget): learning rate, scene count (views-per-scene at fixed
    # steps), and scale-diversity narrowing.
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--train-images", type=int, default=48)
    ap.add_argument("--min-size", type=float, default=0.3)
    ap.add_argument("--max-size", type=float, default=0.65)
    args = ap.parse_args()

    cfg = gate_config(args.size, args.steps)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, backbone_width=args.width, fpn_channels=args.fpn,
            head_channels=args.head),
        train=dataclasses.replace(
            cfg.train, seed=args.seed, log_interval_steps=40,
            heatmap_loss_weight=args.hm_weight,
            learning_rate=args.lr),
    )
    records = make_v2_dataset(args.train_images, args.size, args.size, 0,
                              args.render, min_size=args.min_size,
                              max_size=args.max_size)
    eval_records = make_v2_dataset(8, args.size, args.size, 77,
                                   args.render, min_size=args.min_size,
                                   max_size=args.max_size)
    print(json.dumps({"arm": vars(args)}))

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
    print(json.dumps({"final_losses": {
        k: round(v, 4) for k, v in losses[-1].items()
        if k in ("heatmap_loss", "cls_loss", "box_loss")}}))
    print(json.dumps({"TRAIN_peak_quality":
                      peak_quality(predictor, records[:8])}))
    print(json.dumps({"TRAIN_heatmap_response":
                      heatmap_response(predictor, records)}))
    print(json.dumps({"EVAL_peak_quality":
                      peak_quality(predictor, eval_records)}))
    print(json.dumps({"EVAL_heatmap_response":
                      heatmap_response(predictor, eval_records)}))
    print(json.dumps({"EVAL_gtbox": gtbox_ap(predictor, eval_records)}))


if __name__ == "__main__":
    main()
