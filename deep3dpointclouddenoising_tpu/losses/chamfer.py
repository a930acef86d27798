"""On-device masked Chamfer distance and the Chamfer-based training losses.

Replaces the reference's pytorch3d ``knn_points`` + per-batch-item python
loop (masked_chamfer_loss.py:19-28, chamfer_distance_aux.py:70-247) with a
vmapped masked nearest-neighbor reduction: heterogeneous cloud lengths are
handled by masks over fixed-shape padded tensors, so the whole loss jit
-compiles and runs on the MXU/VPU with no host round-trips.

Semantics preserved from chamfer_distance_aux.py:
  * ``norm_type='L2'``: per-point cost = squared distance to the nearest
    valid point of the other cloud (:159-161);
  * ``norm_type='L1'``: per-point cost = sum of |coordinate deltas| to that
    same (L2-)nearest point (:163-179);
  * point_reduction='mean' over valid points, then the reference training
    losses average the per-item CD over the batch
    (masked_chamfer_loss.py:19-30).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_BIG = np.float32(1e10)  # np, not jnp: no backend init at import time


def _nn_one_way(x: jnp.ndarray, y: jnp.ndarray, y_mask: jnp.ndarray,
                norm_type: str, chunk: int) -> jnp.ndarray:
    """For each x point: cost to its nearest *valid* y point.  (P1,) out.

    The pairwise search runs under ``stop_gradient`` and only the
    argmin-MATCHED pair is recomputed differentiably: grad(min_j d(x,y_j))
    is the gradient at the argmin (the standard KNN-loss subgradient,
    pytorch3d's knn backward).  Differentiating ``min`` over the full
    distance matrix instead makes XLA materialize the (chunk, N, 3)
    pairwise differences in the backward — 23.6 GB at the 15k-point
    chamfer geometry (observed HBM OOM at compile), vs O(P1·3) here."""
    P1 = x.shape[0]
    # all-padding y: the masked argmin would match a sentinel; keep the
    # sentinel cost in that (whole-cloud) case
    has_valid = jnp.max(y_mask) > 0.0

    def tile(xt):  # (c, 3)
        xs = jax.lax.stop_gradient(xt)
        ys = jax.lax.stop_gradient(y)
        d2 = jnp.sum((xs[:, None, :] - ys[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where((y_mask <= 0.0)[None, :], _BIG, d2)
        idx = jnp.argmin(d2, axis=-1)
        near = y[idx]
        if norm_type == "L2":
            cost = jnp.sum((xt - near) ** 2, axis=-1)
        else:
            cost = jnp.sum(jnp.abs(xt - near), axis=-1)
        return jnp.where(has_valid, cost, _BIG)

    if chunk >= P1:
        return tile(x)
    pad = (-P1) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    out = jax.lax.map(tile, xp)
    return out.reshape(-1)[:P1]


def _chamfer_one(x, y, x_mask, y_mask, norm_type: str, chunk: int
                 ) -> jnp.ndarray:
    cx = _nn_one_way(x, y, y_mask, norm_type, chunk)
    cy = _nn_one_way(y, x, x_mask, norm_type, chunk)
    cx = jnp.sum(cx * x_mask) / jnp.maximum(jnp.sum(x_mask), 1.0)
    cy = jnp.sum(cy * y_mask) / jnp.maximum(jnp.sum(y_mask), 1.0)
    return cx + cy


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_mask: Optional[jnp.ndarray] = None,
                     y_mask: Optional[jnp.ndarray] = None,
                     *, norm_type: str = "L2",
                     batch_reduction: Optional[str] = "mean",
                     chunk: int = 4096) -> jnp.ndarray:
    """Masked symmetric Chamfer distance.

    Args:
      x, y: (B, P, 3) padded clouds.
      x_mask, y_mask: (B, P) float {0,1}; all-ones if None.
      norm_type: 'L2' (squared distances) or 'L1' (abs coordinate deltas to
        the L2-nearest point) — chamfer_distance_aux.py:159-179.
      batch_reduction: 'mean', 'sum', or None for per-item values.
    """
    if norm_type not in ("L2", "L1"):
        raise ValueError(f"Norm type {norm_type} not implemented")
    if x_mask is None:
        x_mask = jnp.ones(x.shape[:2], jnp.float32)
    if y_mask is None:
        y_mask = jnp.ones(y.shape[:2], jnp.float32)
    per_item = jax.vmap(
        partial(_chamfer_one, norm_type=norm_type, chunk=chunk))(
        x, y, x_mask.astype(jnp.float32), y_mask.astype(jnp.float32))
    if batch_reduction == "mean":
        return jnp.mean(per_item)
    if batch_reduction == "sum":
        return jnp.sum(per_item)
    return per_item


def nearest_distances(x: jnp.ndarray, y: jnp.ndarray,
                      y_mask: Optional[jnp.ndarray] = None,
                      *, chunk: int = 4096) -> jnp.ndarray:
    """(B, P1) squared distance from each x point to its nearest valid y
    point — the ``return_distances`` path used by the outlier metrics
    (chamfer_distance_aux.py:181,245-247)."""
    if y_mask is None:
        y_mask = jnp.ones(y.shape[:2], jnp.float32)
    return jax.vmap(partial(_nn_one_way, norm_type="L2", chunk=chunk))(
        x, y, y_mask.astype(jnp.float32))


def _l1_term(pred, target, mask):
    per_point = jnp.mean(jnp.abs(pred - target), axis=-1)
    return jnp.sum(per_point * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_chamfer_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        mask: jnp.ndarray, points: jnp.ndarray,
                        *, norm_type: str = "L2") -> jnp.ndarray:
    """CD between (points+target) and (points+pred), batch-averaged
    (masked_chamfer_loss.py:10-29)."""
    mask = mask.astype(jnp.float32)
    clean = points + target
    denoised = points + pred
    return chamfer_distance(clean, denoised, mask, mask,
                            norm_type=norm_type, batch_reduction="mean")


def masked_chamfer_l1_loss(pred, target, mask, points,
                           *, norm_type: str = "L2") -> jnp.ndarray:
    """0.5 * (masked L1 + CD) (masked_chamfer_l1_loss.py:10-49)."""
    mask = mask.astype(jnp.float32)
    l1 = _l1_term(pred, target, mask)
    cd = masked_chamfer_loss(pred, target, mask, points, norm_type=norm_type)
    return 0.5 * (l1 + cd)


def masked_adaptive_l1_chamfer_loss(pred, target, mask, points,
                                    *, converging_to: str = "chamfer"
                                    ) -> jnp.ndarray:
    """l1 + exp(-l1)*cd (-> chamfer) or cd + exp(-cd)*l1 (-> L1)
    (masked_adaptive_l1_chamfer_loss.py:10-54; CD always uses L1 norm there
    so the two terms are comparable)."""
    mask = mask.astype(jnp.float32)
    l1 = _l1_term(pred, target, mask)
    cd = masked_chamfer_loss(pred, target, mask, points, norm_type="L1")
    if converging_to == "chamfer":
        return l1 + jnp.exp(-l1) * cd
    if converging_to == "L1":
        return cd + jnp.exp(-cd) * l1
    raise ValueError(f"Limit of loss {converging_to} not implemented")
