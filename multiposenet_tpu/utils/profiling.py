"""Tracing / profiling / debug helpers.

Reference counterpart + mandate (SURVEY.md §5 "Tracing / profiling"): the
reference only had TensorBoard scalars; the rebuild wires `jax.profiler`
traces (Perfetto/XProf), a wall-clock throughput harness with a RELIABLE
device fence, and NaN-hunting helpers (§5 "Race detection / sanitizers":
`jax_debug_nans` + tree scanning — there are no threads of our own to race).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax
import numpy as np


def fence(tree: Any) -> None:
    """Force device completion by fetching one element to the host.

    jax.block_until_ready is not a reliable fence through remote PJRT
    tunnels (e.g. axon); a host fetch is — device execution is FIFO, so
    the first leaf's readiness implies everything queued before it
    finished. Slices on device first to avoid timing the transfer.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context → view in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(
    fn: Callable[[], Any],
    n_iters: int = 10,
    n_warmup: int = 2,
    n_repeats: int = 3,
) -> float:
    """Median steady-state seconds per call of `fn` (compiles excluded)."""
    out = None
    for _ in range(n_warmup):
        out = fn()
    fence(out)
    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn()
        fence(out)
        times.append((time.perf_counter() - t0) / n_iters)
    return sorted(times)[len(times) // 2]


def find_nans(tree: Any, prefix: str = "") -> list[str]:
    """Paths of tree leaves containing NaN/Inf (checkpoint debugging)."""
    bad = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(prefix + jax.tree_util.keystr(path))
    return bad


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped jax_debug_nans (traps the first NaN-producing op)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
