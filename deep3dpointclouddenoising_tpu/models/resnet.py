"""KPConv-style ResNet encoder over a precomputed geometry pyramid.

Re-design of /root/reference/u_net_arch/models/backbones/resnet.py: same
stage/channel schedule (stem at width/2, then 4 strided stages doubling
width/radius/voxel), but subsampling and neighbor queries come from the
:class:`..models.pyramid.Pyramid` built once per forward pass instead of
being re-run inside every block.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops import group_features
from .layers import ConvBN, compute_dtype
from .local_aggregation import LocalAggregation
from .pyramid import Neighborhood, Pyramid


def masked_max_pool(features: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Strided max-pool: gather fine features at the coarse queries' neighbor
    indices and max over the neighborhood (pt_utils.py:183-206).  Padding
    slots cycle real neighbors, so no mask is needed at the max — same
    contract as the reference's plain ``max_pool2d``."""
    grouped = group_features(features, nbr.idx)  # (B, M, K, C)
    return jnp.max(grouped, axis=2)


class Bottleneck(nn.Module):
    """Residual bottleneck (resnet.py:22-68).

    conv1 (1x1, C_out/ratio) -> local aggregation -> conv2 (1x1, C_out) +
    shortcut.  The strided variant max-pools the identity path to the coarse
    level and aggregates fine features at coarse queries.
    """
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config
    strided: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.out_channels // int(self.cfg.bottleneck_ratio)
        if self.strided:
            identity = masked_max_pool(features, nbr)
        else:
            identity = features

        dt = compute_dtype(self.cfg)
        x = ConvBN(mid, self.cfg.bn_momentum, dtype=dt)(features, train)
        x = LocalAggregation(mid, mid, self.radius, self.cfg)(
            x, nbr, query_mask, train)
        x = ConvBN(self.out_channels, self.cfg.bn_momentum, relu=False,
                   dtype=dt)(x, train)

        if self.in_channels != self.out_channels:
            identity = ConvBN(self.out_channels, self.cfg.bn_momentum,
                              relu=False, dtype=dt)(identity, train)
        return nn.relu(x + identity)


class ResNetEncoder(nn.Module):
    """Five-resolution encoder emitting the res1..res5 feature pyramid
    (resnet.py:71-188)."""
    cfg: Config

    @nn.compact
    def __call__(self, pyramid: Pyramid, features: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        cfg = self.cfg
        width = int(cfg.width)
        depth = int(cfg.depth)
        r0 = float(cfg.radius)
        L0 = pyramid.levels[0]

        # cfg.remat: wrap every bottleneck in jax.checkpoint so its
        # activations are recomputed in the backward pass instead of held
        # in HBM — the TPU trade (FLOPs are cheap on the MXU, HBM is the
        # bottleneck) that lets the 15k-point chamfer configs fit bigger
        # batches.  `train` (argnum 4; 0 = module) stays static.  Explicit
        # Bottleneck_N names keep the param tree identical to the
        # un-remat'd model (nn.remat's auto-naming would register under
        # CheckpointBottleneck_N, breaking checkpoint compatibility).
        cls = (nn.remat(Bottleneck, static_argnums=(4,))
               if int(getattr(cfg, "remat", 0)) else Bottleneck)
        counter = iter(range(100))

        def Block(*a, **kw):
            return cls(*a, name=f"Bottleneck_{next(counter)}", **kw)

        # stem: conv1 -> la1 -> btnk1, all at input resolution
        x = ConvBN(width // 2, cfg.bn_momentum,
                   dtype=compute_dtype(cfg))(features, train)
        x = LocalAggregation(width // 2, width // 2, r0, cfg)(
            x, L0.self_nbr, L0.mask, train)
        x = Block(width // 2, width, r0, cfg)(x, L0.self_nbr, L0.mask,
                                              train)
        outs = [x]

        ch = width
        for i, tr in enumerate(pyramid.transitions, start=1):
            lvl = pyramid.levels[i]
            # strided bottleneck: pool radius is the *previous* level's
            # radius (resnet.py:102-104 passes the pre-doubling radius)
            x = Block(ch, ch * 2, r0 * (2.0 ** (i - 1)), cfg,
                      strided=True)(x, tr.pool_nbr, lvl.mask, train)
            ch *= 2
            for _ in range(depth - 1):
                x = Block(ch, ch, r0 * (2.0 ** i), cfg)(
                    x, lvl.self_nbr, lvl.mask, train)
            outs.append(x)
        return outs
