"""Multi-host helpers on the single-process virtual 8-device mesh.

With one process, ``shard_batch_multihost`` must produce exactly the same
global sharded arrays as the single-host ``shard_batch`` path, and the
train step must be insensitive to which assembly built its inputs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from deep3dpointclouddenoising_tpu.parallel import (
    initialize_multihost, is_coordinator, process_slice,
    shard_batch_multihost)
from deep3dpointclouddenoising_tpu.parallel.mesh import (
    DATA_AXIS, make_mesh, shard_batch)


def test_initialize_single_process_noop():
    assert initialize_multihost() == 0
    assert is_coordinator()


def test_process_slice_single_process():
    assert process_slice(16) == slice(0, 16)
    try:
        process_slice(7)  # 7 % 1 == 0 -> fine with one process
    except ValueError:
        raise AssertionError("n divisible by process_count must not raise")


def test_shard_batch_multihost_matches_shard_batch():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    batch = {
        "points": rng.random((16, 32, 3)).astype(np.float32),
        "mask": np.ones((16, 32), np.float32),
        "cloud_ind": np.arange(16, dtype=np.int32),
    }
    local = {k: v[process_slice(16)] for k, v in batch.items()}
    a = shard_batch_multihost(mesh, local)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # leading axis actually sharded over the data axis
    assert a["points"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)


def test_multihost_batch_feeds_jitted_step():
    mesh = make_mesh(8)
    batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
    g = shard_batch_multihost(mesh, {"x": batch["x"][process_slice(16)]})

    @jax.jit
    def mean_sq(b):
        return jnp.mean(b["x"] ** 2)

    np.testing.assert_allclose(float(mean_sq(g)),
                               float(np.mean(batch["x"] ** 2)), rtol=1e-6)


def test_trainer_assemble_multihost_matches_device_put():
    """With one process, Trainer._assemble_multihost must equal the plain
    shard_batch/shard_chunk placement (same shardings, same values) — the
    single-host degenerate case of the DistributedSampler contract."""
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.train import Trainer

    cfg = default_config()
    cfg.num_points = 64
    cfg.width = 16
    cfg.depth = 2
    cfg.radius = 0.2
    cfg.sampleDl = 0.05
    cfg.nsamples = [8, 8, 8, 8, 8]
    cfg.npoints = [16, 8, 4, 2]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.loss = "L1"
    cfg.optimizer = "adam"
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.batch_size = 8
    model, loss_fn = build_offset_regression(cfg)
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=10,
                      mesh=make_mesh(8))

    rng = np.random.default_rng(1)
    batch = {
        "points": rng.random((8, 64, 3)).astype(np.float32),
        "mask": np.ones((8, 64), np.float32),
        "features": rng.random((8, 64, 3)).astype(np.float32),
        "offsets": rng.random((8, 64, 3)).astype(np.float32),
        "cloud_ind": np.arange(8, dtype=np.int32),
    }
    a = trainer._assemble_multihost(batch, batch_axis=0)
    b = trainer.shard_batch(batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    chunk = {k: np.stack([v, v]) for k, v in batch.items()}
    ca = trainer._assemble_multihost(chunk, batch_axis=1)
    cb = trainer.shard_chunk(chunk)
    for k in chunk:
        assert ca[k].sharding == cb[k].sharding, k
        np.testing.assert_array_equal(np.asarray(ca[k]), np.asarray(cb[k]))


def test_host_barrier_single_process_noop():
    """host_barrier must be a no-op (no distributed client) in
    single-process jobs — the multi-process path is exercised by
    test_multihost_2proc.py."""
    from deep3dpointclouddenoising_tpu.parallel import host_barrier
    host_barrier("unit")  # must not raise or block


def test_replicate_tree_values_and_sharding():
    """replicate_tree commits host values replicated over the mesh without
    any collective; global arrays pass through untouched."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deep3dpointclouddenoising_tpu.parallel import replicate_tree
    from deep3dpointclouddenoising_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.float32(3.5)}
    out = replicate_tree(mesh, tree)
    assert out["a"].sharding.is_equivalent_to(
        NamedSharding(mesh, P()), 2)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    assert float(out["b"]) == 3.5
    # idempotent on already-global arrays
    out2 = replicate_tree(mesh, out)
    np.testing.assert_array_equal(np.asarray(out2["a"]), tree["a"])
