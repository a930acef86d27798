"""Trainer tests: optimizer/schedule semantics, data-parallel equivalence on
the virtual 8-device CPU mesh, and an overfit-one-patch convergence check
(the debugging.yaml analogue, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.models import build_offset_regression
from deep3dpointclouddenoising_tpu.parallel.mesh import make_mesh
from deep3dpointclouddenoising_tpu.train import Trainer
from deep3dpointclouddenoising_tpu.train.lr_schedule import get_lr_schedule


def tiny_cfg():
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
    cfg.base_learning_rate = 1e-3
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.epochs = 10
    cfg.batch_size = 8
    cfg.weight_decay = 0.0
    return cfg


def make_batch(rng, B=8, N=64):
    xyz = (rng.random((B, N, 3), dtype=np.float32) * 2 - 1)
    mask = np.ones((B, N), np.float32)
    offs = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.02
    return {"points": xyz, "mask": mask, "features": xyz.copy(),
            "offsets": offs}


def test_lr_schedule_step_and_warmup():
    cfg = tiny_cfg()
    cfg.lr_decay_steps = 2
    cfg.lr_decay_rate = 0.5
    cfg.epochs = 10
    sched = get_lr_schedule(cfg, n_iter_per_epoch=10, base_lr=1.0)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(19)) == pytest.approx(1.0)   # before first milestone
    assert float(sched(20)) == pytest.approx(0.5)   # epoch 2 boundary
    assert float(sched(40)) == pytest.approx(0.25)

    cfg.warmup_epoch = 2
    cfg.warmup_multiplier = 100
    sched = get_lr_schedule(cfg, n_iter_per_epoch=10, base_lr=1.0)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(20)) == pytest.approx(1.0)   # end of warmup


def test_cosine_schedule():
    cfg = tiny_cfg()
    cfg.lr_scheduler = "cosine"
    cfg.warmup_epoch = -1
    sched = get_lr_schedule(cfg, n_iter_per_epoch=10, base_lr=1.0)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(1e-6, abs=1e-6)


def test_multidevice_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg()
    model, loss_fn = build_offset_regression(cfg)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)

    t1 = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(1))
    t8 = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(8))
    s1 = t1.init_state(key, batch)
    s8 = t8.init_state(key, batch)

    losses1, losses8 = [], []
    for i in range(3):
        r = jax.random.PRNGKey(100 + i)
        s1, l1 = t1.train_step(s1, batch, r)
        s8, l8 = t8.train_step(s8, batch, r)
        losses1.append(float(l1))
        losses8.append(float(l8))
    # reduction order differs across device counts (psum tree vs
    # sequential); float32 drift over several steps is ~1e-3 relative
    np.testing.assert_allclose(losses1, losses8, rtol=2e-3)
    # params agree after 3 steps.  Tolerance is a few lr: adam's update is
    # ~±lr per step independent of grad magnitude, so a reduction-order
    # difference of 1e-7 in a near-zero grad can flip an update's sign.
    lr = float(cfg.base_learning_rate)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6.0 * lr)


def test_multidevice_sgd_gradients_exact(rng):
    """A wrong gradient all-reduce cannot hide behind adam's sign-flip
    tolerance: with plain SGD (momentum 0, no decay, fixed lr) the 8-device
    params after one step are lr-times the all-reduced gradient away from
    init, so they must match the single-device step to float32 reduction
    noise (~1e-6), not 6*lr."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg()
    cfg.optimizer = "sgd"
    cfg.momentum = 0.0
    cfg.weight_decay = 0.0
    cfg.base_learning_rate = 1e-2  # sgd path scales by batch*world/8
    cfg.warmup_epoch = -1
    model, loss_fn = build_offset_regression(cfg)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)

    # world-size LR scaling differs between the two trainers by design
    # (DDP semantics, train_dist.py:358) — pin it by giving both the same
    # world size through cfg.batch_size alone: compare updates normalized
    # by each trainer's actual base lr instead.
    t1 = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(1))
    t8 = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(8))
    s0 = t1.init_state(key, batch)
    s8_0 = t8.init_state(key, batch)
    init_params = jax.device_get(s0.params)  # train_step donates the state

    s1, l1 = t1.train_step(s0, batch, jax.random.PRNGKey(7))
    s8, l8 = t8.train_step(s8_0, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)

    lr1 = float(t1.lr_schedule(0))
    lr8 = float(t8.lr_schedule(0))
    for p0, a, b in zip(jax.tree_util.tree_leaves(init_params),
                        jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
        g1 = (np.asarray(p0) - np.asarray(a)) / lr1
        g8 = (np.asarray(p0) - np.asarray(b)) / lr8
        np.testing.assert_allclose(g1, g8, atol=2e-5)


def test_chunked_scan_matches_per_step(rng):
    """Trainer.train_chunk (S steps per dispatch via lax.scan, the relay-
    latency fix) must reproduce the per-step loop exactly: same RNG stream
    (fold_in on the global step counter), same losses, same params."""
    cfg = tiny_cfg()
    model, loss_fn = build_offset_regression(cfg)
    np_rng = np.random.default_rng(3)
    batches = [make_batch(np_rng) for _ in range(6)]
    key = jax.random.PRNGKey(0)
    base = jax.random.PRNGKey(42)

    t = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(1))
    s_loop = t.init_state(key, batches[0])
    loop_losses = []
    for it, b in enumerate(batches):
        s_loop, l = t.train_step(s_loop, b,
                                 jax.random.fold_in(base, it))
        loop_losses.append(float(l))

    t2 = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(1))
    s_chunk = t2.init_state(key, batches[0])
    chunk_losses = []
    for lo in (0, 3):  # two chunks of 3 steps
        chunk = {k: np.stack([batches[i][k] for i in range(lo, lo + 3)])
                 for k in batches[0]}
        s_chunk, ls = t2.train_chunk(s_chunk, chunk, base)
        chunk_losses.extend(float(x) for x in np.asarray(ls))

    np.testing.assert_allclose(loop_losses, chunk_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_loop.params),
                    jax.tree_util.tree_leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_chunked_scan_multidevice(rng):
    """The chunked dispatch composes with the 8-device data-parallel mesh."""
    assert len(jax.devices()) >= 8
    cfg = tiny_cfg()
    model, loss_fn = build_offset_regression(cfg)
    np_rng = np.random.default_rng(4)
    batches = [make_batch(np_rng) for _ in range(2)]
    t = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(8))
    state = t.init_state(jax.random.PRNGKey(0), batches[0])
    chunk = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state, losses = t.train_chunk(state, chunk, jax.random.PRNGKey(42))
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(state.step) == 2


def test_overfit_single_batch(rng):
    cfg = tiny_cfg()
    cfg.base_learning_rate = 3e-3
    model, loss_fn = build_offset_regression(cfg)
    batch = make_batch(rng, B=4)
    trainer = Trainer(cfg, model, loss_fn, 10, mesh=make_mesh(1))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    first = None
    for i in range(120):
        state, loss = trainer.train_step(state, batch,
                                         jax.random.PRNGKey(i))
        if first is None:
            first = float(loss)
    # With the near-zero head init the first loss already sits at the
    # zero-predictor baseline, so any decrease is genuine memorization of
    # the random targets (not output-scale shrinkage as in the reference).
    assert float(loss) < 0.7 * first, (first, float(loss))
