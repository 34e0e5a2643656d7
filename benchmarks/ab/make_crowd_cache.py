"""(Re)build the cached crowd models the round-3/4 A/B harnesses share.

`/tmp/ab_crowd_giou_w5.pkl` / `_s11.pkl` — the two independently-seeded
crowd-recipe models (base_config + GIoU w=5, 12 person slots, trained on
v1 5-9-person 128² scenes) that `margin_crowd_ab.py`, `pose_nms_ab.py`,
`detprn_ab.py` and `error_attrib.py` load — are /tmp artifacts and die
with the machine. Round 5's box came up with a fresh /tmp, so the
unrun-harness backlog (VERDICT r4 missing #2) first needs this
regeneration, matching the original recipe: train 500 steps (seed
offsets 0/11), PRN 300 steps with the base crop_margin 0.1, pickle
(variables, prn_variables).

NOTE: regenerated weights are new TRAINING RUNS, not the round-3 bytes —
same recipe, same data stream, but any nondeterminism in reduction order
means downstream numbers are a fresh measurement, not a replay. Record
new baselines alongside (the harnesses re-measure their own baselines).

Usage: python benchmarks/ab/make_crowd_cache.py [--seeds 0,11]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import argparse
import dataclasses
import os
import pickle
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snap_ab import base_config
from multiposenet_tpu.data.loader import batch_iterator
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.train import prn_train
from multiposenet_tpu.train.loop import train

SIZE = 128
PATHS = {0: "/tmp/ab_crowd_giou_w5.pkl",
         11: "/tmp/ab_crowd_giou_w5_s11.pkl"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,11")
    args = ap.parse_args()

    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=5, max_persons=9, seed=0,
                                 style="v1", min_size=0.2, max_size=0.6)

    for seed_off in [int(s) for s in args.seeds.split(",")]:
        path = PATHS[seed_off]
        if os.path.exists(path):
            print(f"# {path} exists, skipping")
            continue
        cfg = base_config()
        cfg = cfg.replace(
            detector=dataclasses.replace(
                cfg.detector, box_loss="giou", giou_loss_weight=5.0,
                max_detections=12),
            prn=dataclasses.replace(cfg.prn, max_persons=12),
            train=dataclasses.replace(cfg.train,
                                      seed=cfg.train.seed + seed_off),
        )
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
            num_steps=300,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)
        with open(path, "wb") as f:
            pickle.dump((variables, prn_variables), f)
        print(f"# wrote {path} in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
