"""Measure data/loader.py's threaded prefetcher against a grain pipeline.

SURVEY.md §7's proposed layout named `grain` for the input pipeline; the
build ships a hand-rolled threaded prefetcher instead (data/loader.py).
VERDICT r2 flagged that the deviation was unmeasured. This benchmark runs
BOTH over the same synthetic records with the same make_batch transform
(JPEG-free path; decode cost is identical either way since both call the
same code) and reports host batches/sec.

Usage: python benchmarks/loader_vs_grain.py [--batches 60]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from multiposenet_tpu.data.loader import batch_iterator, make_batch
from multiposenet_tpu.data.synthetic import make_dataset

SIZE = 512
BS = 16
MAX_PERSONS = 32


def bench_ours(records, n_batches: int) -> float:
    it = batch_iterator(records, BS, SIZE, MAX_PERSONS, train=True)
    next(it)  # warm the worker thread
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    return n_batches / (time.perf_counter() - t0)


def bench_grain(records, n_batches: int, workers: int = 2) -> float:
    import grain.python as grain

    class BatchMap(grain.MapTransform):
        """Index → one training batch via the SAME make_batch transform
        the production loader uses (per-element RNG seeded by index for
        grain's parallel workers)."""

        def map(self, idx: int):
            rng = np.random.RandomState(idx)
            sel = rng.randint(0, len(records), BS)
            return make_batch([records[j] for j in sel], SIZE,
                              MAX_PERSONS, rng=rng, train=True)

    loader = grain.DataLoader(
        data_source=grain.RangeDataSource(0, 1 << 20, 1),
        operations=[BatchMap()],
        sampler=grain.IndexSampler(
            num_records=1 << 20, shard_options=grain.NoSharding(),
            shuffle=False, num_epochs=1,
        ),
        worker_count=workers,
        read_options=grain.ReadOptions(prefetch_buffer_size=2),
    )
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    return n_batches / (time.perf_counter() - t0)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, default=60)
    parser.add_argument("--grain-workers", type=int, default=2)
    args = parser.parse_args()

    records = make_dataset(96, img_h=SIZE, img_w=SIZE, min_persons=1,
                           max_persons=8, seed=0)
    ours = bench_ours(records, args.batches)
    theirs = bench_grain(records, args.batches, args.grain_workers)
    print(f"threaded prefetcher (data/loader.py): {ours:6.2f} batches/s "
          f"({ours * BS:7.1f} img/s host-side)")
    print(f"grain DataLoader ({args.grain_workers} workers):         "
          f"{theirs:6.2f} batches/s "
          f"({theirs * BS:7.1f} img/s host-side)")
    print(f"ratio ours/grain: {ours / theirs:.2f}x")


if __name__ == "__main__":
    main()
