"""Masked pointwise losses.

Each mirrors a reference module (file:line cited per function); all are pure
jnp functions over (B, N, ...) tensors with float {0,1} masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(per_point: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(x * mask) / sum(mask) over all of (B, N)."""
    mask = mask.astype(per_point.dtype)
    return jnp.sum(per_point * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Per-point mean |pred-target| over coords, masked mean over points
    (masked_l1_loss.py:6-14)."""
    per_point = jnp.mean(jnp.abs(pred - target), axis=-1)
    return _masked_mean(per_point, mask)


def masked_offset_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """L1 weighted by 1/||target|| clipped to [1e-6, 2]
    (masked_offset_loss.py:6-16)."""
    w = 1.0 / jnp.linalg.norm(target, axis=-1, keepdims=True)
    w = jnp.clip(w, 1e-6, 2.0)
    per_point = jnp.mean(jnp.abs(pred - target) * w, axis=-1)
    return _masked_mean(per_point, mask)


def masked_binary_cross_entropy(prob: jnp.ndarray, target: jnp.ndarray,
                                mask: jnp.ndarray,
                                eps: float = 1e-7) -> jnp.ndarray:
    """BCE on probabilities (the reference feeds sigmoid outputs into
    F.binary_cross_entropy, masked_binary_cross_entropy.py:10-12)."""
    p = jnp.clip(prob, eps, 1.0 - eps)
    per = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return _masked_mean(per, mask)


def masked_outlier_loss(prob: jnp.ndarray, target: jnp.ndarray,
                        true_offsets: jnp.ndarray, mask: jnp.ndarray,
                        eps: float = 1e-7) -> jnp.ndarray:
    """BCE weighted by the true offset magnitude
    (masked_outlier_loss.py:6-13)."""
    p = jnp.clip(prob, eps, 1.0 - eps)
    per = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    per = per * jnp.linalg.norm(true_offsets, axis=-1)
    return _masked_mean(per, mask)


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Per-point softmax CE, masked mean (masked_cross_entropy.py:5-12).
    logits: (B, N, C); labels: (B, N) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _masked_mean(per, mask)


def label_smoothing_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                                  smoothing_ratio: float = 0.2) -> jnp.ndarray:
    """(B, C) logits, (B,) labels (label_smoothing_cross_entropy.py:6-20)."""
    n_class = logits.shape[-1]
    eps = smoothing_ratio
    one_hot = jax.nn.one_hot(labels, n_class)
    soft = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.sum(soft * logp, axis=-1))


def multi_shape_cross_entropy(logits_all_shapes, point_labels: jnp.ndarray,
                              shape_labels: jnp.ndarray) -> jnp.ndarray:
    """CE on the head matching each item's shape class
    (multi_shape_cross_entropy.py:6-24).  logits_all_shapes: list of
    (B, N, P_i)."""
    losses = 0.0
    B = shape_labels.shape[0]
    for sl, logits in enumerate(logits_all_shapes):
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, point_labels[..., None],
                                   axis=-1)[..., 0]
        per_item = jnp.mean(per, axis=-1)  # (B,)
        losses = losses + jnp.sum(jnp.where(shape_labels == sl, per_item, 0.0))
    return losses / B
