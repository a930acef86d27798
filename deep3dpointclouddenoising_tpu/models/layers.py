"""Basic building blocks in channels-last (B, N, C) layout.

The reference's 1x1 ``nn.Conv1d`` over (B, C, N) becomes a Dense over the
trailing channel axis — a plain MXU matmul.  BatchNorm statistics span
(batch, points) per channel like torch ``BatchNorm1d`` on (B, C, N); under a
batch-sharded jit the mean/var become global automatically (XLA inserts the
collectives), which subsumes the reference's per-GPU BN
(``broadcast_buffers=False``, train_dist.py:375).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


def compute_dtype(cfg) -> Any:
    """Resolve cfg.compute_dtype to a jnp dtype (None = float32
    promotion)."""
    name = str(getattr(cfg, "compute_dtype", "float32"))
    return jnp.bfloat16 if name == "bfloat16" else None


def torch_bn_momentum(m: float) -> float:
    """torch momentum (weight of the NEW batch stat) -> flax momentum
    (decay of the RUNNING stat)."""
    return 1.0 - m


class ConvBN(nn.Module):
    """1x1 conv (Dense, no bias) + BatchNorm, optional ReLU.

    ``dtype`` is the matmul compute dtype (bfloat16 under
    cfg.compute_dtype='bfloat16'); parameters and the BatchNorm statistics
    stay float32 (flax promotes the BN input back to the f32 params).
    """
    features: int
    bn_momentum: float = 0.1  # torch convention
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=torch_bn_momentum(self.bn_momentum),
                         epsilon=1e-5)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BNReLU(nn.Module):
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=torch_bn_momentum(self.bn_momentum),
                         epsilon=1e-5)(x)
        return nn.relu(x)


def masked_global_avg_pool(features: jnp.ndarray, mask: jnp.ndarray
                           ) -> jnp.ndarray:
    """(B, N, C), (B, N) -> (B, C).

    Matches the reference MaskedGlobalAvgPool1d
    (models/heads/classifier.py:6-14): sums over *all* slots (padding slots
    hold cycled real features by the pad contract) and divides by the true
    point count.
    """
    total = jnp.sum(features, axis=1)
    cnt = jnp.sum(mask, axis=1, keepdims=True)
    return total / jnp.maximum(cnt, 1.0)
