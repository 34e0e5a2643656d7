"""A/B: two-pass PRN (prn.refine_pass), eval-only, cached weights
(round 3). Requires /tmp/ab_state.pkl from snap_ab.py (128², one main
model trained with crop_margin 0.1 + vote 0.75 — the best-knob setting).

Usage: python benchmarks/ab/refine_ab.py
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

from snap_ab import CACHE, SIZE, base_config
from multiposenet_tpu.data.synthetic import make_dataset
import functools as _functools
# Round-3 harness: recorded numbers + cached /tmp weights are fixtures
# v1; pin it so the round-4 v2 default can't mismatch (NOTES_r4.md trap).
make_dataset = _functools.partial(make_dataset, style="v1",
                                  min_size=0.2, max_size=0.6)
from multiposenet_tpu.eval.runner import evaluate_predictor
from multiposenet_tpu.infer.predictor import Predictor


def main() -> None:
    cfg = base_config()
    eval_records = make_dataset(64, img_h=SIZE, img_w=SIZE,
                                min_persons=1, max_persons=4, seed=999)
    with open(CACHE, "rb") as f:
        variables, prn_variables = pickle.load(f)

    def refine(margin, min_score=0.05):
        return cfg.replace(prn=dataclasses.replace(
            cfg.prn, refine_pass=True, refine_margin=margin,
            refine_min_score=min_score))

    arms = [
        ("baseline", cfg),
        ("refine_m0.10", refine(0.10)),
        ("refine_m0.15", refine(0.15)),
        ("refine_m0.20", refine(0.20)),
        ("refine_m0.15_s0.10", refine(0.15, 0.10)),
    ]
    for name, acfg in arms:
        predictor = Predictor(config=acfg, variables=variables,
                              prn_variables=prn_variables, image_size=SIZE)
        s = evaluate_predictor(predictor, eval_records)
        print(json.dumps({"arm": name, "AP": s["AP"], "AP50": s["AP50"],
                          "AP75": s["AP75"], "AR": s["AR"]}), flush=True)


if __name__ == "__main__":
    main()
