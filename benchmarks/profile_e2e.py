"""Profile the e2e batched pipeline on the current backend and print a
per-source-line device-time breakdown (reads `source` from the trace
events, so no separate HLO dump/compile is needed).

Usage: python benchmarks/profile_e2e.py [--batch-size 128] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import tempfile

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from multiposenet_tpu.ops.image import (
        space_to_depth_flat, space_to_depth_flat4,
    )

    pred = bench.make_predictor(512)
    stage = (space_to_depth_flat4
             if pred.config.model.stem_stride == 4 else space_to_depth_flat)
    rng = np.random.RandomState(0)
    batch = jax.device_put(jnp.asarray(stage(
        rng.randint(0, 255, (args.batch_size, 512, 512, 3), dtype=np.uint8)
    )))
    fn = jax.jit(pred._batch_forward_impl)
    out = fn(pred.variables, pred.prn_variables, batch)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    logdir = tempfile.mkdtemp(prefix="prof_e2e_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            out = fn(pred.variables, pred.prn_variables, batch)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    tr = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    by_src = collections.Counter()
    by_op = collections.Counter()
    op_src = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not pids.get(e["pid"], "").startswith("/device"):
            continue
        if e["name"].startswith("jit__batch"):
            continue
        d = e["dur"] / (1000.0 * args.iters)
        total += d
        src = e.get("args", {}).get("source", "?")
        src = src.split("/")[-1]
        by_src[src] += d
        by_op[e["name"]] += d
        op_src[e["name"]] = (src, e.get("args", {}).get(
            "shape_with_layout", "")[:60])
    print(f"TOTAL device op time: {total:.1f} ms/iter "
          f"(bs={args.batch_size})")
    print("--- by source line")
    for k, v in by_src.most_common(args.top):
        print(f"{v:8.2f} ms  {k}")
    print("--- top individual ops")
    for k, v in by_op.most_common(args.top):
        s, shape = op_src[k]
        print(f"{v:8.2f} ms  {k:28s} {s:28s} {shape}")


if __name__ == "__main__":
    main()
