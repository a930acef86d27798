"""Adversarial fine-tuning + discriminator pre-training.

Re-implements the GAN runtime of
/root/reference/u_net_arch/train_dist_GAN.py:469-568 and
train_discriminator.py:401-441 as two jitted steps over the device mesh:

  * D-step: discriminator sees concat(clean = points + gt_offsets,
            fake = points + stop_grad(G(points))), BCE scaled by
            ALPHA = 0.01 (train_dist_GAN.py:44,533);
  * G-step: errG = ALPHA * BCE(D(points + G(points)), real-labels with 5%%
            flip noise) + task loss (:547-565);
  * discriminator pre-training: clean vs *raw noisy* points (not generator
            output), unscaled BCE (train_discriminator.py:419-436);
            validation returns thresholded accuracy (:433-435).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..losses.masked import masked_binary_cross_entropy
from ..parallel.mesh import DATA_AXIS, make_mesh
from .trainer import TrainState, make_optimizer

REAL_LABEL = 1.0
FAKE_LABEL = 1.0 - REAL_LABEL
ALPHA = 0.01
LABEL_FLIP_P = 0.05


def _bce(prob: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return masked_binary_cross_entropy(prob, target, jnp.ones_like(prob))


class GANTrainer:
    """Generator (offset U-Net) + discriminator, two optimizers/schedules
    (train_dist_GAN.py:373-397)."""

    def __init__(self, cfg: Config, generator, gen_loss: Callable,
                 discriminator, n_iter_per_epoch: int, mesh=None,
                 freeze_generator: bool = False):
        """Both nets get the Trainer mesh treatment
        (the reference DDP-wraps generator AND discriminator,
        train_dist_GAN.py:400-401): parameters/optimizer states replicated,
        batches sharded on the data axis, so XLA all-reduces both gradient
        streams over ICI inside the one jitted update."""
        self.cfg = cfg
        self.generator = generator
        self.discriminator = discriminator
        self.gen_loss = gen_loss
        self.freeze_generator = freeze_generator
        # ALPHA balances adversarial vs task gradients; the reference's 0.01
        # assumes its ~0.02 task-loss scale (train_dist_GAN.py:44).  On
        # regimes with much smaller task losses the same 0.01 lets the BCE
        # term drag a converged generator away from the task optimum, so it
        # is configurable (cfg.gan_alpha).
        # alpha enters the jitted steps as a TRACED argument, not a baked
        # closure constant: sweeping cfg.gan_alpha (the usual knob on a new
        # regime, RESULTS.md "GAN fine-tuning") reuses the compiled
        # executable instead of paying a fresh remote compile per value.
        self.alpha = float(getattr(cfg, "gan_alpha", ALPHA))
        self.mesh = mesh if mesh is not None else make_mesh()
        world = self.mesh.devices.size
        self.tx_g, self.lr_g = make_optimizer(cfg, n_iter_per_epoch, world)
        self.tx_d, self.lr_d = make_optimizer(cfg, n_iter_per_epoch, world)
        self._repl = NamedSharding(self.mesh, P())
        self._batch_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        # batch placement inherited from committed args (shard_batch) —
        # states replicated and donated, like Trainer
        self._jit_update = jax.jit(
            self._update,
            in_shardings=(self._repl, self._repl, None, None, self._repl),
            out_shardings=(self._repl, self._repl, self._repl),
            donate_argnums=(0, 1))
        self._jit_pretrain = jax.jit(
            self._pretrain_step,
            in_shardings=(self._repl, None, None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))
        self._jit_pretrain_acc = jax.jit(
            self._pretrain_accuracy,
            in_shardings=(self._repl, None),
            out_shardings=self._repl)
        # scan-based multi-step dispatch (same contract as
        # Trainer.train_chunk: stacked (S, B, ...) chunks, one H2D per S
        # steps).  Per-step RNG folds on the DISCRIMINATOR step counter —
        # it advances every update even when the generator is frozen, so it
        # always equals the host loop's global step index.
        self._jit_update_chunk = jax.jit(
            self._scan_update,
            in_shardings=(self._repl, self._repl, None, None, self._repl),
            out_shardings=(self._repl, self._repl, self._repl),
            donate_argnums=(0, 1))
        self._jit_pretrain_chunk = jax.jit(
            self._scan_pretrain,
            in_shardings=(self._repl, None, None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))

    def shard_batch(self, batch: Dict) -> Dict:
        """device_put each leaf batch-sharded (rank-0 leaves replicated).
        A ragged final batch (drop_last=False val loaders) that does not
        divide the mesh is replicated instead of sharded."""
        n = self.mesh.devices.size

        def _place(v):
            ok = jnp.ndim(v) >= 1 and v.shape[0] % n == 0
            return jax.device_put(v, self._batch_sh if ok else self._repl)

        return jax.tree_util.tree_map(_place, batch)

    # -- state --------------------------------------------------------------
    def init_states(self, rng, batch) -> Tuple[TrainState, TrainState]:
        gv = self.generator.init({"params": rng,
                                  "dropout": jax.random.fold_in(rng, 1)},
                                 batch["points"], batch["mask"],
                                 batch["features"], train=False)
        clean = batch["points"] + batch["offsets"]
        dv = self.discriminator.init(
            {"params": jax.random.fold_in(rng, 2),
             "dropout": jax.random.fold_in(rng, 3)},
            clean, batch["mask"], clean, train=False)
        gs = TrainState(step=jnp.zeros((), jnp.int32), params=gv["params"],
                        batch_stats=gv.get("batch_stats", {}),
                        opt_state=self.tx_g.init(gv["params"]))
        ds = TrainState(step=jnp.zeros((), jnp.int32), params=dv["params"],
                        batch_stats=dv.get("batch_stats", {}),
                        opt_state=self.tx_d.init(dv["params"]))
        return (jax.device_put(gs, self._repl),
                jax.device_put(ds, self._repl))

    # -- model application --------------------------------------------------
    def _gen_apply(self, params, bstats, batch, train, rng):
        variables = {"params": params, "batch_stats": bstats}
        if train:
            out, mut = self.generator.apply(
                variables, batch["points"], batch["mask"], batch["features"],
                train=True, mutable=["batch_stats"], rngs={"dropout": rng})
            return out, mut["batch_stats"]
        return self.generator.apply(
            variables, batch["points"], batch["mask"], batch["features"],
            train=False), bstats

    def _disc_apply(self, params, bstats, points, mask, train, rng):
        variables = {"params": params, "batch_stats": bstats}
        feats = points  # discriminator features = the points themselves
        if train:
            out, mut = self.discriminator.apply(
                variables, points, mask, feats, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return out.reshape(-1), mut["batch_stats"]
        return self.discriminator.apply(
            variables, points, mask, feats, train=False).reshape(-1), bstats

    # -- joint GAN update ---------------------------------------------------
    def _update(self, gen_state: TrainState, disc_state: TrainState,
                batch: Dict, rng, alpha
                ) -> Tuple[TrainState, TrainState, Dict]:
        r_gf, r_d, r_flip, r_g = jax.random.split(rng, 4)
        b = batch["points"].shape[0]
        mask2 = jnp.concatenate([batch["mask"], batch["mask"]])

        # generator forward (stop-grad for the D step)
        pred_offsets, gen_bs = self._gen_apply(
            gen_state.params, gen_state.batch_stats, batch, True, r_gf)
        clean = batch["points"] + batch["offsets"]
        fake = batch["points"] + jax.lax.stop_gradient(pred_offsets)
        pts2 = jnp.concatenate([clean, fake])
        labels2 = jnp.concatenate([jnp.full((b,), REAL_LABEL),
                                   jnp.full((b,), FAKE_LABEL)])

        def d_loss_fn(d_params):
            out, new_bs = self._disc_apply(d_params, disc_state.batch_stats,
                                           pts2, mask2, True, r_d)
            return _bce(out, labels2) * alpha, (out, new_bs)

        (err_d, (d_out, d_bs)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(disc_state.params)
        d_updates, d_opt = self.tx_d.update(d_grads, disc_state.opt_state,
                                            disc_state.params)
        d_params = optax.apply_updates(disc_state.params, d_updates)
        new_disc = TrainState(step=disc_state.step + 1, params=d_params,
                              batch_stats=d_bs, opt_state=d_opt)
        d_acc = 1.0 - jnp.mean(jnp.abs((d_out > 0.5).astype(jnp.float32)
                                       - labels2))

        # G step: real labels with 5% flip noise (train_dist_GAN.py:549-550)
        flip = (jax.random.uniform(r_flip, (b,)) < LABEL_FLIP_P)
        g_labels = jnp.full((b,), REAL_LABEL) * (1.0 - flip.astype(jnp.float32))

        def g_loss_fn(g_params):
            pred, new_gbs = self._gen_apply(g_params, gen_state.batch_stats,
                                            batch, True, r_g)
            denoised = batch["points"] + pred
            d_score, _ = self._disc_apply(new_disc.params,
                                          new_disc.batch_stats, denoised,
                                          batch["mask"], False, None)
            err_g1 = _bce(d_score, g_labels)
            err_g2 = self.gen_loss(pred, batch["offsets"], batch["mask"],
                                   batch["points"])
            return err_g1 * alpha + err_g2, (err_g1, err_g2, new_gbs)

        (err_g, (g1, g2, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_state.params)
        if self.freeze_generator:
            new_gen = gen_state
        else:
            g_updates, g_opt = self.tx_g.update(g_grads, gen_state.opt_state,
                                               gen_state.params)
            g_params = optax.apply_updates(gen_state.params, g_updates)
            new_gen = TrainState(step=gen_state.step + 1, params=g_params,
                                 batch_stats=g_bs, opt_state=g_opt)
        metrics = {"disc_accuracy": d_acc, "err_d": err_d, "err_g1": g1,
                   "err_g2": g2, "err_g": err_g}
        return new_gen, new_disc, metrics

    def update(self, gen_state, disc_state, batch, rng):
        return self._jit_update(gen_state, disc_state,
                                self.shard_batch(batch), rng,
                                jnp.float32(self.alpha))

    def _chunk_place(self, chunk: Dict) -> Dict:
        """Stacked (S, B, ...) chunk placement: batch axis (axis 1) rides
        the data axis, step axis stays sequential."""
        n = self.mesh.devices.size
        sh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def _place(v):
            ok = jnp.ndim(v) >= 2 and v.shape[1] % n == 0
            return jax.device_put(v, sh if ok else self._repl)

        return jax.tree_util.tree_map(_place, chunk)

    def _scan_update(self, gen_state, disc_state, chunk, rng, alpha):
        def body(carry, batch):
            gs, ds = carry
            step_rng = jax.random.fold_in(rng, ds.step)
            gs, ds, metrics = self._update(gs, ds, batch, step_rng, alpha)
            return (gs, ds), metrics

        (gs, ds), metrics = jax.lax.scan(body, (gen_state, disc_state),
                                         chunk)
        return gs, ds, metrics

    def update_chunk(self, gen_state, disc_state, chunk, rng):
        """S GAN updates in one dispatch; returns (gen, disc, metrics) with
        each metric stacked to (S,)."""
        return self._jit_update_chunk(gen_state, disc_state,
                                      self._chunk_place(chunk), rng,
                                      jnp.float32(self.alpha))

    # -- discriminator pre-training ----------------------------------------
    def _pretrain_step(self, disc_state: TrainState, batch: Dict, rng):
        """Clean vs raw-noisy classification (train_discriminator.py:401-431)."""
        b = batch["points"].shape[0]
        clean = batch["points"] + batch["offsets"]
        pts2 = jnp.concatenate([clean, batch["points"]])
        mask2 = jnp.concatenate([batch["mask"], batch["mask"]])
        labels2 = jnp.concatenate([jnp.full((b,), REAL_LABEL),
                                   jnp.full((b,), FAKE_LABEL)])

        def loss_fn(params):
            out, new_bs = self._disc_apply(params, disc_state.batch_stats,
                                           pts2, mask2, True, rng)
            return _bce(out, labels2), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_state.params)
        updates, opt = self.tx_d.update(grads, disc_state.opt_state,
                                       disc_state.params)
        params = optax.apply_updates(disc_state.params, updates)
        return TrainState(step=disc_state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=opt), loss

    def pretrain_step(self, disc_state, batch, rng):
        return self._jit_pretrain(disc_state, self.shard_batch(batch), rng)

    def _scan_pretrain(self, disc_state, chunk, rng):
        def body(st, batch):
            return self._pretrain_step(st, batch,
                                       jax.random.fold_in(rng, st.step))

        return jax.lax.scan(body, disc_state, chunk)

    def pretrain_chunk(self, disc_state, chunk, rng):
        """S pre-training steps in one dispatch; returns (state, losses[S])."""
        return self._jit_pretrain_chunk(disc_state, self._chunk_place(chunk),
                                        rng)

    def _pretrain_accuracy(self, disc_state: TrainState, batch: Dict):
        b = batch["points"].shape[0]
        clean = batch["points"] + batch["offsets"]
        pts2 = jnp.concatenate([clean, batch["points"]])
        mask2 = jnp.concatenate([batch["mask"], batch["mask"]])
        labels2 = jnp.concatenate([jnp.full((b,), REAL_LABEL),
                                   jnp.full((b,), FAKE_LABEL)])
        out, _ = self._disc_apply(disc_state.params, disc_state.batch_stats,
                                  pts2, mask2, False, None)
        return 1.0 - jnp.mean(jnp.abs((out > 0.5).astype(jnp.float32)
                                      - labels2))

    def pretrain_accuracy(self, disc_state, batch):
        return self._jit_pretrain_acc(disc_state, self.shard_batch(batch))
