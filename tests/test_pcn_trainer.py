"""PCN-baseline trainer: losses, STN rotation handling, training step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.models import build_offset_regression_PCN
from deep3dpointclouddenoising_tpu.train.pcn import PCNTrainer, surface_dist


def tiny_cfg(loss="L1"):
    cfg = default_config()
    cfg.num_points = 32
    cfg.loss = loss
    cfg.in_radius = 0.5
    cfg.batch_size = 4
    cfg.base_learning_rate = 1e-3
    cfg.optimizer = "sgd"
    cfg.lr_scheduler = "step_PCN"
    cfg.lr_decay_steps = 0.1
    cfg.warmup_epoch = -1
    cfg.epochs = 5
    cfg.momentum = 0.9
    cfg.weight_decay = 0.0
    return cfg


def make_batch(rng, B=4, N=32):
    return {
        "points": jnp.asarray(rng.random((B, N, 3), dtype=np.float32) - 0.5),
        "offsets": jnp.asarray(
            rng.normal(size=(B, N, 3)).astype(np.float32) * 0.01),
    }


def test_surface_dist_zero_for_exact_match():
    target = jnp.asarray(np.random.default_rng(0).random((2, 16, 3),
                                                         dtype=np.float32))
    pred = target[:, 0, :]
    assert float(surface_dist(pred, target)) < 1e-9
    # regularized version adds the max distance term
    assert float(surface_dist(pred, target, regularization=True)) > 0


@pytest.mark.parametrize("loss", ["L1", "original", "original_no_reg"])
def test_pcn_train_step_runs(rng, loss):
    cfg = tiny_cfg(loss)
    model, _ = build_offset_regression_PCN(cfg)
    trainer = PCNTrainer(cfg, model, n_iter_per_epoch=10)
    batch = make_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, l1 = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    state, l2 = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    vl = trainer.eval_step(state, batch)
    assert np.isfinite(float(vl))
    pred = trainer.predict(state, batch["points"])
    assert pred.shape == (4, 3)


def test_multiscale_pcpnet_forward():
    """MS variants take (B, S*N, 3) and emit one vector per patch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from deep3dpointclouddenoising_tpu.models.pcpnet import (
        MSPCPNet, ResMSPCPNet)

    B, S, N = 2, 2, 32
    x = jnp.asarray(np.random.default_rng(0).random((B, S * N, 3),
                                                    dtype=np.float32))
    for cls in (ResMSPCPNet, MSPCPNet):
        m = cls(num_scales=S, num_points=N)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out, trans, trans2 = m.apply(v, x, train=False)
        assert out.shape == (B, 3)
        assert trans.shape == (B, 3, 3)
        assert trans2.shape == (B, 64, 64)
        assert np.all(np.isfinite(np.asarray(out)))
        # the multi-scale global feature is 1024*S^2 wide
        feat_params = jax.tree_util.tree_leaves(v["params"])
        assert any(p.ndim == 2 and p.shape[0] == 1024 * S * S
                   for p in feat_params)


def test_pcn_chunked_scan_matches_per_step(rng):
    """PCNTrainer.train_chunk must reproduce the per-step loop exactly
    (same fold_in-on-global-step RNG stream, same losses and params)."""
    cfg = tiny_cfg("L1")
    model, _ = build_offset_regression_PCN(cfg)
    batches = [make_batch(rng) for _ in range(4)]
    base = jax.random.PRNGKey(7)

    t1 = PCNTrainer(cfg, model, n_iter_per_epoch=10)
    s1 = t1.init_state(jax.random.PRNGKey(0), batches[0])
    loop_losses = []
    for it, b in enumerate(batches):
        s1, l = t1.train_step(s1, b, jax.random.fold_in(base, it))
        loop_losses.append(float(l))

    t2 = PCNTrainer(cfg, model, n_iter_per_epoch=10)
    s2 = t2.init_state(jax.random.PRNGKey(0), batches[0])
    chunk = {k: np.stack([np.asarray(b[k]) for b in batches])
             for k in batches[0]}
    s2, losses = t2.train_chunk(s2, chunk, base)

    np.testing.assert_allclose(loop_losses, np.asarray(losses), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
