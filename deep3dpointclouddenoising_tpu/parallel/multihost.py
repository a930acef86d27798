"""Multi-host (multi-slice / DCN) runtime.

The reference scales across hosts with one NCCL process per GPU
(`torch.distributed.init_process_group(backend='nccl', init_method='env://')`,
/root/reference/u_net_arch/train_dist.py:502) and a `DistributedSampler`
handing each rank a disjoint batch shard (:244-252).  The TPU-native
equivalent is JAX's single-controller-per-host model: every host calls
:func:`initialize_multihost` once, after which ``jax.devices()`` spans the
whole pod/multi-slice job and the existing 1-D/2-D meshes (``mesh.py``) work
unchanged — XLA routes gradient all-reduces over ICI within a slice and DCN
between slices.

Data feeding differs from single-host: each host materializes only its own
``batch_size / num_processes`` rows, and
:func:`shard_batch_multihost` assembles the *global* sharded array from the
per-process locals (``jax.make_array_from_process_local_data``) — the pjit
equivalent of DistributedSampler + per-rank H2D copies.  Single-process jobs
degenerate to the plain ``shard_batch`` path, so everything here is testable
on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Join the multi-host job; returns this host's process index.

    On Cloud TPU pods the three arguments are auto-detected from the
    metadata server, so ``initialize_multihost()`` with no args is the
    common call.  A single-process job (num_processes in (None, 0, 1) with
    no coordinator) skips ``jax.distributed.initialize`` entirely, so local
    runs and tests need no special-casing.
    """
    if coordinator_address is None and not num_processes:
        return jax.process_index()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def process_slice(n_total: int) -> slice:
    """This host's contiguous row range of a global batch/epoch of
    ``n_total`` samples (the DistributedSampler contract: disjoint,
    covering, same length per rank — train_dist.py:244-252).  ``n_total``
    must divide evenly; callers pad the epoch table like the reference
    sampler does."""
    n_proc = jax.process_count()
    if n_total % n_proc:
        raise ValueError(f"global batch {n_total} not divisible by "
                         f"{n_proc} processes")
    per = n_total // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch_multihost(mesh: Mesh, local_batch: Any,
                          axis: str = DATA_AXIS) -> Any:
    """Assemble the global batch-sharded arrays from per-process local rows.

    Each process passes ONLY its local shard (``process_slice`` of the
    global batch); the returned jax.Arrays are globally ``P(axis)``-sharded
    over the mesh.  With one process this equals ``mesh.shard_batch``.
    """
    def put(x):
        x = np.asarray(x)
        spec = P(axis) if x.ndim >= 1 else P()
        sh = NamedSharding(mesh, spec)
        if x.ndim == 0:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, local_batch)


def host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier: block until every process reaches it.

    Uses the distributed runtime's key-value service
    (``client.wait_at_barrier``), NOT a device collective — so it tolerates
    arbitrary rank skew up to ``timeout_ms``.  This is the fence for
    rank-skewed host phases (dataset cache builds, local XLA compiles,
    checkpoint IO): the FIRST device collective a process runs initializes
    the CPU backend's Gloo context with a short (~30 s) deadline, so a rank
    arriving minutes late — routine on a shared host where both ranks
    compile on the same cores — kills the early rank with
    ``Gloo context initialization failed: DEADLINE_EXCEEDED``.  Barrier
    first, then collect.

    The reference's equivalent rank-sync points are DDP construction and
    ``init_process_group`` (train_dist.py:375,502), which block until all
    ranks join.  No-op in single-process jobs or when no distributed
    client is active.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Replicated global arrays from identical per-process host values —
    WITHOUT collectives.

    ``jax.device_put(host_array, replicated_multiprocess_sharding)`` runs a
    cross-process ``multihost_utils.assert_equal`` value check (a psum —
    jax/_src/dispatch.py:483-497), i.e. a device collective with the Gloo
    context-init deadline; under startup rank skew that reproducibly
    deadlines.  ``make_array_from_process_local_data`` performs only local
    transfers (each process supplies the full value as its local
    replicated shard), so replication is safe at any skew; consistency of
    the value across ranks is the caller's contract (same seed / same
    checkpoint), exactly as with the reference's DDP broadcast.

    Leaves that are already global (non-fully-addressable) jax.Arrays pass
    through untouched.
    """
    sh = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def is_coordinator() -> bool:
    """Rank-0 gate for checkpointing/logging (the reference's
    ``dist.get_rank() == 0`` checks, train_dist.py:414-420)."""
    return jax.process_index() == 0
