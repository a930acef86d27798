"""Jitted, mesh-parallel training runtime.

Replaces the reference training loop plumbing
(/root/reference/u_net_arch/train_dist.py:343-465): optimizer construction
with the DDP world-size LR scaling (:356-370), gradient clipping at 10
(:449), per-iteration LR scheduling (:451), and the DDP allreduce — here a
single jitted train step over a 1-D device mesh with the batch sharded on
the ``data`` axis and parameters replicated (XLA inserts the gradient
all-reduce over ICI).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..parallel.mesh import DATA_AXIS, make_mesh
from .lr_schedule import get_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: Config, n_iter_per_epoch: int,
                   world_size: int = 1) -> Tuple[optax.GradientTransformation,
                                                 optax.Schedule]:
    """Optimizer + per-iteration LR schedule (train_dist.py:356-372).

    torch semantics preserved: SGD scales the LR by
    ``batch_size * world_size / 8`` (:358); ``weight_decay`` is additive L2
    for sgd/adam and decoupled for adamW; grads are clipped to global norm
    ``grad_clip_norm`` before everything else (:449).
    """
    name = cfg.optimizer
    wd = float(cfg.weight_decay)
    if name == "sgd":
        base_lr = (float(cfg.batch_size) * world_size / 8.0
                   * float(cfg.base_learning_rate))
    else:
        base_lr = float(cfg.base_learning_rate)
    schedule = get_lr_schedule(cfg, n_iter_per_epoch, base_lr=base_lr)

    parts = [optax.clip_by_global_norm(float(cfg.grad_clip_norm))]
    if name == "sgd":
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.trace(decay=float(cfg.momentum)))
    elif name == "adam":
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam())
    elif name == "adamW":
        parts.append(optax.scale_by_adam())
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    else:
        raise NotImplementedError(f"Optimizer {name} not supported")
    parts.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*parts), schedule


class Trainer:
    """Owns the model, loss, optimizer, mesh, and the jitted steps.

    ``batch`` convention (matching OffsetDataset output order,
    offset_dataset.py:730-733, channels-last): a dict with ``points``
    (B,N,3), ``mask`` (B,N), ``features`` (B,N,C), ``offsets`` (B,N,3) and
    optionally ``labels`` (B,N).
    """

    def __init__(self, cfg: Config, model, loss_fn: Callable,
                 n_iter_per_epoch: int, mesh=None,
                 loss_mode: str = "offset", spatial: bool = False):
        """loss_mode selects the loss call signature:
        'offset'        loss(pred, offsets, mask, points)   (train_dist.py)
        'full_cleaning' loss(pred, offsets, labels, mask)
                        (train_offset_outliers.py:298-325)
        'segmentation'  loss(logits, labels, mask)          (scene seg)

        ``spatial=True`` shards the POINT axis (axis 1) of the batch over
        the mesh instead of the batch axis — sequence/context-parallel
        training on giant clouds (pair with a model built by
        ``parallel.spatial.build_spatial_model`` so the geometry pyramid
        carries the matching sharding constraints).

        ``spatial="2d"`` expects a 2-D ``(data, points)`` mesh
        (``parallel.mesh.make_mesh_2d``): the batch axis shards over
        ``data`` AND each cloud's point axis over ``points`` — combined
        DP x SP training (pair with ``build_spatial_model(axis=POINTS_AXIS,
        batch_axis=DATA_AXIS)``).  LR world-scaling follows the data axis
        only, matching the reference's DDP scaling rule
        (train_dist.py:358).
        """
        from ..parallel.mesh import POINTS_AXIS

        self.cfg = cfg
        self.model = model
        self.loss_fn = loss_fn
        self.loss_mode = loss_mode
        self.mesh = mesh if mesh is not None else make_mesh()
        self._spatial = spatial
        if spatial == "2d":
            world = self.mesh.shape[DATA_AXIS]
            batch_spec = P(DATA_AXIS, POINTS_AXIS)
            self._data_sh = NamedSharding(self.mesh, P(DATA_AXIS))
            self._axis_sizes = (self.mesh.shape[DATA_AXIS],
                                self.mesh.shape[POINTS_AXIS])
        elif spatial:
            world = 1
            batch_spec = P(None, DATA_AXIS)
        else:
            world = self.mesh.devices.size
            batch_spec = P(DATA_AXIS)
        self.tx, self.lr_schedule = make_optimizer(cfg, n_iter_per_epoch,
                                                   world_size=world)
        self._repl = NamedSharding(self.mesh, P())
        self._batch_sh = NamedSharding(self.mesh, batch_spec)
        # batch shardings are per-leaf (shard_batch): a single pytree-prefix
        # sharding would reject rank-1 leaves like cloud_ind (B,) under the
        # spatial P(None, data) spec — so the jit inherits the batch
        # placement from the committed arguments (in_shardings=None)
        self._jit_train = jax.jit(
            self._train_step,
            in_shardings=(self._repl, None, None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))
        self._jit_eval = jax.jit(
            self._eval_step,
            in_shardings=(self._repl, None),
            out_shardings=self._repl)
        # scan-based multi-step dispatch (train_chunk): one traced step body,
        # S steps per device dispatch — a single H2D transfer of the stacked
        # chunk replaces S per-step transfers (the hot fix for
        # high-latency host<->device links; see RESULTS.md "host/link-bound")
        self._jit_train_chunk = jax.jit(
            self._scan_chunk,
            in_shardings=(self._repl, None, None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))

    # -- init ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            example_batch["points"], example_batch["mask"],
            example_batch["features"], train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        return self.put_replicated(state)

    def put_replicated(self, tree):
        """Commit a pytree replicated over the mesh.

        Multi-process jobs route through ``parallel.replicate_tree``:
        ``device_put`` of host data to a cross-process sharding runs a
        Gloo-backed cross-process value check (jax dispatch.py:483-497)
        whose 30 s context-init deadline reproducibly fails under startup
        rank skew; ``make_array_from_process_local_data`` does only local
        transfers."""
        if jax.process_count() > 1:
            from ..parallel.multihost import replicate_tree
            return replicate_tree(self.mesh, tree)
        return jax.device_put(tree, self._repl)

    def _leaf_sharding(self, shape: Tuple[int, ...]) -> NamedSharding:
        """Sharding for one batch leaf by shape.

        Data-parallel: every array leaf shards on its leading (batch) axis.
        Spatial: only rank>=2 leaves carry the point axis (axis 1) —
        rank-1 leaves (cloud_ind (B,), scalars) are replicated, since a
        P(None, data) spec is invalid for them.  A leaf whose sharded axis
        does not divide the mesh (ragged drop_last=False val batches) is
        replicated rather than rejected.
        """
        if self._spatial == "2d":
            n_d, n_p = self._axis_sizes
            if len(shape) >= 2 and shape[0] % n_d == 0 \
                    and shape[1] % n_p == 0:
                return self._batch_sh
            if len(shape) >= 1 and shape[0] % n_d == 0:
                return self._data_sh  # rank-1 leaves (cloud_ind) ride DP
            return self._repl
        n = self.mesh.devices.size
        axis = 1 if self._spatial else 0
        if len(shape) <= axis or shape[axis] % n != 0:
            return self._repl
        return self._batch_sh

    def shard_batch(self, batch: Dict) -> Dict:
        """device_put each batch leaf with its rank-appropriate sharding.

        Multi-host jobs (``jax.process_count() > 1`` after
        ``parallel.initialize_multihost``) pass only this host's
        ``global_batch / num_processes`` rows; the global array is
        assembled from the per-process locals — the pjit equivalent of
        the reference's DistributedSampler shards (train_dist.py:244-252).
        """
        if jax.process_count() > 1:
            return self._assemble_multihost(batch, batch_axis=0)
        return jax.tree_util.tree_map(
            lambda v: jax.device_put(v, self._leaf_sharding(jnp.shape(v))),
            batch)

    def _assemble_multihost(self, tree: Dict, batch_axis: int) -> Dict:
        """Build globally-sharded arrays from per-process local shards.

        ``batch_axis`` is the leaf axis each host's rows live on (0 for a
        batch, 1 for a stacked (S, B, ...) chunk).  Spatial modes shard
        the *point* axis of one cloud, which has no per-host decomposition
        — multi-host is data-parallel only, like the reference.
        """
        if self._spatial:
            raise NotImplementedError(
                "multi-host training is data-parallel only (spatial point "
                "sharding is per-slice); use spatial=False across hosts")
        import numpy as np
        n_proc = jax.process_count()
        leaf_sh = (self._leaf_sharding if batch_axis == 0
                   else self._chunk_leaf_sharding)

        def put(v):
            if isinstance(v, jax.Array) and not v.is_fully_addressable:
                # already a globally-assembled array (train_step/train_chunk
                # re-shard what device_prefetch placed — idempotent by
                # design; np.asarray on a multi-host global array raises)
                return v
            v = np.asarray(v)
            if v.ndim <= batch_axis:
                # scalars / step-only leaves: identical on all hosts
                return jax.make_array_from_process_local_data(self._repl, v)
            gshape = list(v.shape)
            gshape[batch_axis] *= n_proc
            sh = leaf_sh(tuple(gshape))
            if sh is self._repl:
                raise ValueError(
                    f"multi-host batch leaf {v.shape} does not divide the "
                    f"data axis globally; pad the global batch (the "
                    f"DistributedSampler contract)")
            return jax.make_array_from_process_local_data(sh, v)

        return jax.tree_util.tree_map(put, tree)

    def _chunk_leaf_sharding(self, shape: Tuple[int, ...]) -> NamedSharding:
        """Sharding for a stacked (S, B, ...) chunk leaf: the step axis is
        sequential (never sharded), the batch axis rides the data axis."""
        n = self.mesh.devices.size
        if len(shape) >= 2 and shape[1] % n == 0:
            return NamedSharding(self.mesh, P(None, DATA_AXIS))
        return self._repl

    def shard_chunk(self, chunk: Dict) -> Dict:
        if jax.process_count() > 1:
            return self._assemble_multihost(chunk, batch_axis=1)
        return jax.tree_util.tree_map(
            lambda v: jax.device_put(
                v, self._chunk_leaf_sharding(jnp.shape(v))), chunk)

    # -- steps --------------------------------------------------------------
    def _apply(self, params, batch_stats, batch, train: bool, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mut = self.model.apply(
                variables, batch["points"], batch["mask"], batch["features"],
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return out, mut["batch_stats"]
        out = self.model.apply(
            variables, batch["points"], batch["mask"], batch["features"],
            train=False)
        return out, batch_stats

    def _compute_loss(self, pred, batch):
        if self.loss_mode == "full_cleaning":
            return self.loss_fn(pred, batch["offsets"], batch["labels"],
                                batch["mask"])
        if self.loss_mode == "segmentation":
            return self.loss_fn(pred, batch["labels"], batch["mask"])
        return self.loss_fn(pred, batch["offsets"], batch["mask"],
                            batch["points"])

    def _train_step(self, state: TrainState, batch: Dict, rng
                    ) -> Tuple[TrainState, jnp.ndarray]:
        def loss_fn(params):
            pred, new_bs = self._apply(params, state.batch_stats, batch,
                                       True, rng)
            return self._compute_loss(pred, batch), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, loss

    def _scan_chunk(self, state: TrainState, chunk: Dict, rng
                    ) -> Tuple[TrainState, jnp.ndarray]:
        """Run S train steps from stacked (S, B, ...) batch arrays under one
        jit: ``lax.scan`` traces the step body once, and per-step RNG folds
        on the (traced) global step counter — identical streams to the
        host loop's ``fold_in(rng, step)``."""
        def body(st, batch):
            step_rng = jax.random.fold_in(rng, st.step)
            return self._train_step(st, batch, step_rng)

        return jax.lax.scan(body, state, chunk)

    def _eval_step(self, state: TrainState, batch: Dict) -> jnp.ndarray:
        pred, _ = self._apply(state.params, state.batch_stats, batch, False,
                              None)
        return self._compute_loss(pred, batch)

    # -- public -------------------------------------------------------------
    @property
    def batch_sharding(self):
        """Per-batch placement function (see ``shard_batch``) — pass to
        ``data.loader.device_prefetch`` so prefetched batches land already
        sharded."""
        return self.shard_batch

    def train_step(self, state, batch, rng):
        batch = self.shard_batch(batch)
        if jax.process_count() > 1:
            rng = self.put_replicated(rng)
        return self._jit_train(state, batch, rng)

    @property
    def chunk_sharding(self):
        """Per-chunk placement (see ``shard_chunk``) for device_prefetch."""
        return self.shard_chunk

    def train_chunk(self, state, chunk, rng):
        """Run S optimizer steps in one dispatch from stacked (S, B, ...)
        arrays; returns (state, losses[S]).  ``rng`` is the run's base key —
        per-step keys fold on the global step counter, so chunked and
        per-step training produce identical RNG streams.  Data-parallel
        (non-spatial) meshes only."""
        if self._spatial:
            raise NotImplementedError(
                "train_chunk supports the data-parallel path only")
        chunk = self.shard_chunk(chunk)
        if jax.process_count() > 1:
            rng = self.put_replicated(rng)
        return self._jit_train_chunk(state, chunk, rng)

    def eval_step(self, state, batch):
        batch = self.shard_batch(batch)
        return self._jit_eval(state, batch)

    def predict(self, state, batch):
        pred, _ = self._apply(state.params, state.batch_stats, batch, False,
                              None)
        return pred
