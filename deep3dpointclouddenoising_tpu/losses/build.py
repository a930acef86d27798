"""Loss selection by config name.

Mirrors the loss switches in /root/reference/u_net_arch/models/build.py:48-66
(offset regression) and :77-87 + train_offset_outliers.py:298-325 (full
cleaning).  Returns pure callables ``loss(pred, target, mask, points)``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp

from .chamfer import (
    masked_adaptive_l1_chamfer_loss,
    masked_chamfer_l1_loss,
    masked_chamfer_loss,
)
from .masked import (
    masked_binary_cross_entropy,
    masked_l1_loss,
    masked_offset_loss,
    masked_outlier_loss,
)

LossFn = Callable[..., jnp.ndarray]


def get_offset_regression_loss(name: str) -> LossFn:
    """loss(pred, target, mask, points) -> scalar."""
    if name == "L1":
        return lambda pred, target, mask, points=None: \
            masked_l1_loss(pred, target, mask)
    if name == "chamfer_L1":
        return masked_chamfer_l1_loss
    if name == "chamfer":
        return masked_chamfer_loss
    if name == "chamfer_sparse":
        return partial(masked_chamfer_loss, norm_type="L1")
    if name == "l1_chamfer_sparse":
        return partial(masked_chamfer_l1_loss, norm_type="L1")
    if name == "l1_chamfer_adaptive_to_chamfer":
        return partial(masked_adaptive_l1_chamfer_loss,
                       converging_to="chamfer")
    if name == "l1_chamfer_adaptive_to_l1":
        return partial(masked_adaptive_l1_chamfer_loss, converging_to="L1")
    raise ValueError(f"The loss {name} is not implemented")


def get_complete_denoising_loss(name: str, in_radius: float) -> LossFn:
    """Full-cleaning loss over a 4-dim head output: tanh on the first 3 dims
    (offsets), sigmoid on the last (outlierness)
    (train_offset_outliers.py:298-325).

    loss(raw_pred[B,N,4], offsets[B,N,3], outlier_labels[B,N], mask[B,N])
    -> scalar total = loss_offset + loss_outlier * in_radius.
    """

    def loss(raw_pred, offsets, outlier_labels, mask):
        pred_offsets = jnp.tanh(raw_pred[..., :3])
        pred_outlier = jnp.clip(
            jnp.asarray(raw_pred[..., 3]), -30.0, 30.0)
        pred_outlier = 1.0 / (1.0 + jnp.exp(-pred_outlier))
        if name == "L1_classification":
            lo = masked_l1_loss(pred_offsets, offsets, mask)
            lc = masked_binary_cross_entropy(pred_outlier, outlier_labels,
                                             jnp.ones_like(mask))
        elif name == "Weighted_L1_classification":
            # offset L1 is masked by (valid OR predicted-outlier): the
            # reference ORs the padding mask with heaviside(oi - 0.5)
            # (train_offset_outliers.py:316-320); the predicted mask is
            # non-differentiable there (bool cast), so stop_gradient here.
            import jax
            pred_is_outlier = jax.lax.stop_gradient(
                (pred_outlier >= 0.5).astype(mask.dtype))
            new_mask = jnp.maximum(mask, pred_is_outlier)
            lo = masked_l1_loss(pred_offsets, offsets, new_mask)
            lc = masked_binary_cross_entropy(pred_outlier, outlier_labels,
                                             jnp.ones_like(mask))
        elif name == "double_weight":
            lo = masked_offset_loss(pred_offsets, offsets, mask)
            lc = masked_outlier_loss(pred_outlier, outlier_labels, offsets,
                                     mask)
        else:
            raise ValueError(f"Loss {name} not implemented.")
        return lo + lc * in_radius

    return loss
