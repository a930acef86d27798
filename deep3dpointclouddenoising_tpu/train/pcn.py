"""PointCleanNet-baseline training runtime.

Re-implements the loss/forward plumbing of
/root/reference/u_net_arch/train_dist_PCN.py as a jitted step:

  * forward on raw patches, prediction rotated back through the point-STN
    transpose (:317-318);
  * losses: ``L1`` to the center point's offset (:320-323), ``original`` /
    ``original_no_reg`` = min (and 0.99/0.01 min/max-regularized) squared
    distance from the predicted point to the target cloud x 100
    (compute_surface_dist, :495-507);
  * non-L1 losses normalize points/offsets by ``in_radius`` (:309-311).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from .trainer import TrainState, make_optimizer


def surface_dist(pred: jnp.ndarray, target: jnp.ndarray,
                 regularization: bool = False) -> jnp.ndarray:
    """Mean (regularized) min squared distance pred -> target, x100
    (train_dist_PCN.py:495-507).  pred (B, 3), target (B, N, 3)."""
    d = jnp.sum((target - pred[:, None, :]) ** 2, axis=-1)  # (B, N)
    min_d = jnp.min(d, axis=1)
    if regularization:
        max_d = jnp.max(d, axis=1)
        alpha = 0.99
        return jnp.mean(alpha * min_d + (1 - alpha) * max_d) * 100.0
    return jnp.mean(min_d) * 100.0


class PCNTrainer:
    """Jitted trainer for the ResPCPNet baseline."""

    def __init__(self, cfg: Config, model, n_iter_per_epoch: int,
                 world_size: int = 1):
        self.cfg = cfg
        self.model = model
        self.loss_name = cfg.loss
        self.in_radius = float(cfg.in_radius)
        self.tx, self.lr_schedule = make_optimizer(cfg, n_iter_per_epoch,
                                                   world_size)
        self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step)
        # scan-based multi-step dispatch, same contract as
        # Trainer.train_chunk (one H2D transfer per S steps)
        self._jit_train_chunk = jax.jit(self._scan_chunk,
                                        donate_argnums=(0,))

    def init_state(self, rng, batch: Dict) -> TrainState:
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            batch["points"], train=False)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=self.tx.init(params))

    def _normalize(self, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        points = batch["points"]
        offsets = batch["offsets"]
        if self.loss_name != "L1":
            points = points / self.in_radius
            offsets = offsets / self.in_radius
        return points, offsets

    def _loss(self, pred, trans, points, offsets):
        # rotate the prediction back through the point-STN (:317-318)
        pred = jnp.einsum("bd,bed->be", pred, trans)
        if self.loss_name == "L1":
            target = offsets[:, 0, :] if offsets.ndim == 3 else offsets
            return jnp.mean(jnp.abs(pred - target))
        target = points + offsets
        if self.loss_name == "original":
            return surface_dist(pred, target, regularization=True)
        if self.loss_name == "original_no_reg":
            return surface_dist(pred, target, regularization=False)
        raise ValueError(
            f"Loss {self.loss_name} not implemented for the PCN pipeline")

    def _apply(self, params, batch_stats, points, train, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (pred, trans, _), mut = self.model.apply(
                variables, points, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return pred, trans, mut["batch_stats"]
        pred, trans, _ = self.model.apply(variables, points, train=False)
        return pred, trans, batch_stats

    def _train_step(self, state: TrainState, batch: Dict, rng):
        points, offsets = self._normalize(batch)

        def loss_fn(params):
            pred, trans, new_bs = self._apply(params, state.batch_stats,
                                              points, True, rng)
            return self._loss(pred, trans, points, offsets), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=opt), loss

    def _eval_step(self, state: TrainState, batch: Dict):
        points, offsets = self._normalize(batch)
        pred, trans, _ = self._apply(state.params, state.batch_stats, points,
                                     False, None)
        return self._loss(pred, trans, points, offsets)

    def _scan_chunk(self, state: TrainState, chunk: Dict, rng):
        def body(st, batch):
            return self._train_step(st, batch,
                                    jax.random.fold_in(rng, st.step))

        return jax.lax.scan(body, state, chunk)

    def train_step(self, state, batch, rng):
        return self._jit_train(state, batch, rng)

    def train_chunk(self, state, chunk, rng):
        """Run S optimizer steps in one dispatch from stacked (S, B, ...)
        arrays; per-step RNG folds on the global step counter (identical
        streams to the per-step loop).  Returns (state, losses[S])."""
        return self._jit_train_chunk(state, chunk, rng)

    def eval_step(self, state, batch):
        return self._jit_eval(state, batch)

    def predict(self, state, points):
        pred, trans, _ = self._apply(state.params, state.batch_stats,
                                     jnp.asarray(points), False, None)
        return jnp.einsum("bd,bed->be", pred, trans)
