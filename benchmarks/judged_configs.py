"""Run ALL FIVE judged-config sub-benchmarks (BASELINE.json:7-11) and
print one JSON line each — the acceptance-contract evidence table.

Config 1 (single-image keypoint inference) is judged on CPU
(BASELINE.json:7), so it runs in a subprocess with JAX_PLATFORMS=cpu;
configs 2-5 run in THIS process on the default backend (TPU), sharing
one process so the axon Mosaic compile queue is paid once per program,
not once per process (see .claude/skills/verify/SKILL.md).

Usage: python benchmarks/judged_configs.py [--skip 1,5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma-separated config numbers to skip")
    args = ap.parse_args()
    skip = {int(s) for s in args.skip.split(",") if s}

    if 1 not in skip:
        # CPU judged config in a subprocess (the axon plugin re-injects
        # itself at import, so forcing CPU needs a fresh interpreter).
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "bench.py", "--config", "1", "--no-retry"],
            capture_output=True, text=True, env=env,
            cwd=Path(__file__).resolve().parent.parent, timeout=3600,
        )
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(f"# config 1 rc={r.returncode}: {r.stderr[-300:]}",
                  flush=True)

    bench._enable_compile_cache()
    for n, fn in [(2, bench.bench_config_2), (3, bench.bench_config_3),
                  (4, bench.bench_config_4), (5, bench.bench_config_5)]:
        if n in skip:
            continue
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as exc:  # noqa: BLE001 — keep the table going
            print(json.dumps({"metric": f"judged_config_{n}",
                              "error": f"{type(exc).__name__}: {exc}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
