"""Device mesh + sharding helpers (data-parallel over ICI).

Reference counterpart: NONE — the reference is single-GPU with no
distribution (SURVEY.md §2 "Parallelism strategies present in the reference:
NONE"). The rebuild's DP-over-ICI is mandated by BASELINE.json:5/11
("shards data-parallel over ICI across a v5e slice", "bs=64 data-parallel
over ICI").

Design (SURVEY.md §5 "Distributed communication backend"): a 1-D
`Mesh(('data',))`; batch dims are sharded over 'data', parameters are
replicated. XLA inserts the collectives (gradient psum in training, gather
at eval) over ICI. The mesh abstraction is the extension point for
multi-slice DCN scales; TP/PP/SP/EP have no counterpart for a ~5M-param CNN
and are documented out of scope (README).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Sequence[jax.Device] | None = None, axis: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(
    batch_size: int,
    devices: Sequence[jax.Device] | None = None,
    axis: str = DATA_AXIS,
) -> Mesh:
    """Mesh over the largest device count that divides batch_size.

    A batch must shard evenly over the data axis; e.g. batch 2 on an
    8-device host uses a 2-device mesh."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Device-put every leaf with its leading dim sharded over `axis`."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put every leaf fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
