"""1-D device mesh + sharding helpers.

The reference's only parallelism is data parallel over NCCL (DDP allreduce,
train_dist.py:375; DistributedSampler :244-252; lr scaling :358).  The
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all chips, the batch
dimension sharded over the ``data`` axis, parameters replicated.  Gradient
averaging is whatever XLA inserts for the replicated-param/sharded-batch
jit — an all-reduce over ICI, no hand-written collectives needed.
Multi-host/multi-slice scaling uses the same mesh via
``jax.distributed.initialize`` (DCN between slices).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def make_mesh_2d(n_data: int, n_points: int) -> Mesh:
    """2-D mesh ``(data, points)``: batch data-parallel over ``data``,
    each cloud's point axis spatially sharded over ``points``.  The
    reference has nothing like this (its only axis is DDP data parallel);
    on TPU the inner ``points`` axis should map to the faster ICI ring."""
    devs = jax.devices()[:n_data * n_points]
    assert len(devs) == n_data * n_points, (
        f"need {n_data * n_points} devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(n_data, n_points),
                (DATA_AXIS, POINTS_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put a pytree of host arrays with the leading axis sharded over
    the data axis (the pjit equivalent of DistributedSampler + H2D copies)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
