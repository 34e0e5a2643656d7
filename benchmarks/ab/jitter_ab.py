"""A/B: PRN training-time window jitter (prn.window_jitter) — one cached
main model (from snap_ab.py, margin 0.1 + vote 0.75), one fresh PRN per
jitter arm, then e2e AP single-pass and two-pass (refine_pass) per arm.

Motivation: the two-pass PRN regressed hard with the GT-window-trained
PRN (refine_ab.py: 0.4476 → 0.22-0.37) — a window-distribution mismatch.
Jitter trains the PRN on perturbed windows, targeting BOTH the noisy
detector windows of single-pass inference and the keypoint-extent
windows of the two-pass variant.

Usage: python benchmarks/ab/jitter_ab.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import dataclasses
import json
import os
import pickle
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from snap_ab import CACHE, SIZE, base_config
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

JITTERS = (0.0, 0.1, 0.2)


def main() -> None:
    cfg0 = base_config()
    train_records = make_dataset(128, img_h=SIZE, img_w=SIZE,
                                 min_persons=1, max_persons=4, seed=0)
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=1, max_persons=4, seed=999)
    with open(CACHE, "rb") as f:
        variables, _ = pickle.load(f)

    for jitter in JITTERS:
        cfg = cfg0.replace(prn=dataclasses.replace(
            cfg0.prn, window_jitter=jitter))
        t0 = time.time()
        prn_state = prn_train.train_prn(
            cfg,
            batch_iterator(train_records, cfg.train.batch_size, SIZE,
                           cfg.prn.max_persons, train=True, augment=False),
            num_steps=300,
            log_fn=lambda m: None,
        )
        prn_variables = jax.device_get(prn_state.params)
        print(f"# jitter={jitter} PRN trained in {time.time()-t0:.0f}s",
              flush=True)

        arms = [("1pass", cfg)]
        for rm in (0.15, 0.25):
            arms.append((f"2pass_m{rm}", cfg.replace(
                prn=dataclasses.replace(cfg.prn, window_jitter=jitter,
                                        refine_pass=True,
                                        refine_margin=rm))))
        for name, acfg in arms:
            predictor = Predictor(config=acfg, variables=variables,
                                  prn_variables=prn_variables,
                                  image_size=SIZE)
            s = evaluate_predictor(predictor, eval_records)
            print(json.dumps({"jitter": jitter, "arm": name,
                              "AP": s["AP"], "AP50": s["AP50"],
                              "AP75": s["AP75"], "AR": s["AR"]}),
                  flush=True)


if __name__ == "__main__":
    main()
