"""A/B: flip-TTA and decode threshold, eval-only, cached weights
(scratch, round 3). Requires /tmp/ab_state.pkl from snap_ab.py.

Usage: python final_ab.py
"""

from __future__ import annotations

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

import numpy as np

from snap_ab import CACHE, SIZE, base_config
from multiposenet_tpu.config import DecodeConfig
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

    arms = [
        ("baseline", cfg, {}),
        ("flip_tta", cfg, {"flip_tta": True}),
        ("dec0.05", cfg.replace(decode=dataclasses.replace(
            cfg.decode, score_threshold=0.05)), {}),
        ("dec0.2", cfg.replace(decode=dataclasses.replace(
            cfg.decode, score_threshold=0.2)), {}),
    ]
    for name, acfg, pkw in arms:
        predictor = Predictor(
            config=acfg, variables=variables,
            prn_variables=prn_variables, image_size=SIZE, **pkw,
        )
        s = evaluate_predictor(predictor, eval_records)
        print(json.dumps({"arm": name, "AP": s["AP"], "AP50": s["AP50"],
                          "AP75": s["AP75"], "AR": s["AR"]}), flush=True)


if __name__ == "__main__":
    main()
