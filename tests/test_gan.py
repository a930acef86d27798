"""GAN trainer + complete-denoising loss tests (tiny model sizes)."""
import numpy as np
import jax
import jax.numpy as jnp

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.losses.build import (
    get_complete_denoising_loss)
from deep3dpointclouddenoising_tpu.models import (
    build_discriminator, build_offset_regression)
from deep3dpointclouddenoising_tpu.parallel.mesh import make_mesh
from deep3dpointclouddenoising_tpu.train.gan import GANTrainer


def tiny_cfg():
    cfg = default_config()
    cfg.num_points = 32
    cfg.width = 8
    cfg.depth = 1
    cfg.radius = 0.3
    cfg.sampleDl = 0.08
    cfg.nsamples = [4, 4, 4, 4, 4]
    cfg.npoints = [8, 4, 2, 1]
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.head_discriminator = "discriminator_head"
    cfg.loss = "L1"
    cfg.optimizer = "adam"
    cfg.base_learning_rate = 1e-3
    cfg.lr_scheduler = "step"
    cfg.warmup_epoch = -1
    cfg.epochs = 4
    return cfg


def make_batch(rng, B=2, N=32):
    xyz = rng.random((B, N, 3), dtype=np.float32) * 2 - 1
    return {"points": xyz, "mask": np.ones((B, N), np.float32),
            "features": xyz.copy(),
            "offsets": rng.normal(size=(B, N, 3)).astype(np.float32) * 0.02}


def test_gan_update_runs(rng):
    cfg = tiny_cfg()
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    trainer = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                         mesh=make_mesh(1))
    batch = make_batch(rng)
    gs, ds = trainer.init_states(jax.random.PRNGKey(0), batch)
    d0 = np.asarray(jax.tree_util.tree_leaves(ds.params)[0])  # pre-donation
    gs2, ds2, metrics = trainer.update(gs, ds, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["err_g"]))
    assert np.isfinite(float(metrics["err_d"]))
    assert 0.0 <= float(metrics["disc_accuracy"]) <= 1.0
    # both nets actually updated
    assert int(gs2.step) == 1 and int(ds2.step) == 1
    d1 = jax.tree_util.tree_leaves(ds2.params)[0]
    assert not np.allclose(d0, np.asarray(d1))


def test_gan_multidevice_matches_single_device(rng):
    """The mesh-sharded GAN update (generator AND discriminator gradient
    all-reduce, train_dist_GAN.py:400-401) must track the single-device
    update on the virtual 8-CPU mesh."""
    assert len(jax.devices()) >= 8
    cfg = tiny_cfg()
    cfg.batch_size = 8
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    t1 = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                    mesh=make_mesh(1))
    t8 = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                    mesh=make_mesh(8))
    batch = make_batch(rng, B=8)
    gs1, ds1 = t1.init_states(jax.random.PRNGKey(0), batch)
    gs8, ds8 = t8.init_states(jax.random.PRNGKey(0), batch)

    for i in range(2):
        r = jax.random.PRNGKey(50 + i)
        gs1, ds1, m1 = t1.update(gs1, ds1, batch, r)
        gs8, ds8, m8 = t8.update(gs8, ds8, batch, r)
        for k in ("err_d", "err_g", "err_g1", "err_g2"):
            np.testing.assert_allclose(float(m1[k]), float(m8[k]),
                                       rtol=3e-3, err_msg=k)
    lr = float(cfg.base_learning_rate)
    for a, b in zip(jax.tree_util.tree_leaves(gs1.params)
                    + jax.tree_util.tree_leaves(ds1.params),
                    jax.tree_util.tree_leaves(gs8.params)
                    + jax.tree_util.tree_leaves(ds8.params)):
        # adam sign-flip tolerance, as in the Trainer equivalence test
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6.0 * lr)


def test_discriminator_pretrain_step(rng):
    cfg = tiny_cfg()
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    trainer = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                         mesh=make_mesh(1))
    batch = make_batch(rng)
    _, ds = trainer.init_states(jax.random.PRNGKey(0), batch)
    ds2, loss = trainer.pretrain_step(ds, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    acc = trainer.pretrain_accuracy(ds2, batch)
    assert 0.0 <= float(acc) <= 1.0


def test_complete_denoising_losses(rng):
    B, N = 2, 16
    raw = rng.normal(size=(B, N, 4)).astype(np.float32)
    offs = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.02
    labels = (rng.random((B, N)) > 0.6).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    mask[:, 12:] = 0
    for name in ("L1_classification", "Weighted_L1_classification",
                 "double_weight"):
        loss_fn = get_complete_denoising_loss(name, in_radius=2.0)
        val = loss_fn(jnp.asarray(raw), jnp.asarray(offs),
                      jnp.asarray(labels), jnp.asarray(mask))
        assert np.isfinite(float(val)), name
        # gradient flows through the 4-dim head output
        g = jax.grad(lambda r: loss_fn(r, jnp.asarray(offs),
                                       jnp.asarray(labels),
                                       jnp.asarray(mask)))(jnp.asarray(raw))
        assert float(jnp.sum(jnp.abs(g))) > 0, name


def test_gan_chunked_scan_matches_per_step(rng):
    """update_chunk (S GAN updates per dispatch) must reproduce the
    per-step update loop when the per-step loop folds RNG the same way
    (on the discriminator's global step counter)."""
    cfg = tiny_cfg()
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    batches = [make_batch(rng) for _ in range(3)]
    base = jax.random.PRNGKey(11)

    t1 = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                    mesh=make_mesh(1))
    gs1, ds1 = t1.init_states(jax.random.PRNGKey(0), batches[0])
    loop_errs = []
    for it, b in enumerate(batches):
        gs1, ds1, m = t1.update(gs1, ds1, b, jax.random.fold_in(base, it))
        loop_errs.append(float(m["err_g"]))

    t2 = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                    mesh=make_mesh(1))
    gs2, ds2 = t2.init_states(jax.random.PRNGKey(0), batches[0])
    chunk = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    gs2, ds2, metrics = t2.update_chunk(gs2, ds2, chunk, base)

    np.testing.assert_allclose(loop_errs, np.asarray(metrics["err_g"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gs1.params),
                    jax.tree_util.tree_leaves(gs2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ds1.params),
                    jax.tree_util.tree_leaves(ds2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_discriminator_pretrain_chunk(rng):
    cfg = tiny_cfg()
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    t = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                   mesh=make_mesh(1))
    batches = [make_batch(rng) for _ in range(2)]
    _, ds = t.init_states(jax.random.PRNGKey(0), batches[0])
    chunk = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    ds, losses = t.pretrain_chunk(ds, chunk, jax.random.PRNGKey(5))
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(ds.step) == 2


def test_gan_alpha_configurable(rng):
    """cfg.gan_alpha scales the adversarial term: with alpha=0 the G update
    must reduce to a pure task-loss step (err_g == err_g2) and err_d == 0."""
    cfg = tiny_cfg()
    cfg.gan_alpha = 0.0
    gen, gen_loss = build_offset_regression(cfg)
    disc, _ = build_discriminator(cfg)
    trainer = GANTrainer(cfg, gen, gen_loss, disc, n_iter_per_epoch=4,
                         mesh=make_mesh(1))
    assert trainer.alpha == 0.0
    batch = make_batch(rng)
    gs, ds = trainer.init_states(jax.random.PRNGKey(0), batch)
    _, _, metrics = trainer.update(gs, ds, batch, jax.random.PRNGKey(1))
    assert float(metrics["err_d"]) == 0.0
    np.testing.assert_allclose(float(metrics["err_g"]),
                               float(metrics["err_g2"]), rtol=1e-6)
    # default path keeps the reference constant
    cfg2 = tiny_cfg()
    t2 = GANTrainer(cfg2, gen, gen_loss, disc, n_iter_per_epoch=4,
                    mesh=make_mesh(1))
    assert t2.alpha == 0.01
