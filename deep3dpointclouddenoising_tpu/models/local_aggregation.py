"""Local aggregation operators over precomputed neighborhoods.

TPU-native re-designs of
/root/reference/u_net_arch/models/local_aggregation_operators.py: every
operator consumes a :class:`..models.pyramid.Neighborhood` (indices, mask,
relative positions built once per forward) instead of re-running the ball
query, and works channels-last so the per-point contraction maps onto the
MXU.

Operators: PseudoGrid (KPConv, local_aggregation_operators.py:403-510),
PosPool (:94-190), AdaptiveWeight (:193-302), PointWiseMLP (:305-400), and
the Attention wrapper (:17-91).  Dispatch mirrors LocalAggregation
(:513-551).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops import group_features
from ..ops.pallas_kpconv import kpconv_aggregate
from .kernel_points import create_kernel_points
from .layers import BNReLU, ConvBN, compute_dtype
from .pyramid import Neighborhood


# B*M*K*C below which XLA beats the fused kernel (calibrated on v5e at the
# flagship geometry, batch 16: stem B16*M500*K52*C72 ~ 30M wins, the next
# level B16*M125*K39*C144 ~ 11M loses)
_FUSE_MIN_WORK = 16_000_000


def _pallas_mode(cfg: Config, work: int = _FUSE_MIN_WORK):
    """Resolve cfg.use_pallas: returns (use_fused, interpret).

    'auto' uses the fused Pallas kernel only on TPU AND only when the
    layer's total B*M*K*C work is large enough to amortize the kernel's
    fixed cost: measured on v5e (flagship l1 geometry, batch 16), Pallas
    wins at the 500-point stem (~3.0 vs ~4.8 ms) but loses at every deeper
    level (N<=125: ~1.5 vs ~0.5 ms) where grid/launch overheads dominate
    the tiny contractions XLA simply fuses into neighbors.
    """
    flag = getattr(cfg, "use_pallas", "auto")
    on_cpu = jax.default_backend() == "cpu"
    if flag == "auto":
        return (not on_cpu) and work >= _FUSE_MIN_WORK, False
    return bool(flag), on_cpu


def _feature_mask(nbr: Neighborhood, query_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, M, K) mask used by every reference operator: neighborhood mask,
    forced to all-ones for padding queries
    (local_aggregation_operators.py:492: ``idx_mask + (1 - query_mask)``)."""
    return nbr.mask + (1.0 - query_mask[:, :, None])


def _masked_reduce(agg: jnp.ndarray, nbr: Neighborhood,
                   query_mask: jnp.ndarray, reduction: str) -> jnp.ndarray:
    """Reduce (B, M, K, C) over K the way the reference does (:165-183)."""
    if reduction == "max":
        # padding slots replicate real neighbors (pad-by-cycling), so a
        # plain max matches the reference max_pool2d-without-mask behavior.
        return jnp.max(agg, axis=2)
    fmask = _feature_mask(nbr, query_mask)[..., None]
    summed = jnp.sum(agg * fmask, axis=2)
    if reduction in ("avg", "mean"):
        return summed / jnp.maximum(jnp.sum(fmask, axis=2), 1.0)
    if reduction == "sum":
        return summed
    raise NotImplementedError(f"Reduction {reduction} not implemented")


class PseudoGrid(nn.Module):
    """KPConv-style pseudo-grid aggregation
    (local_aggregation_operators.py:403-510).

    Per query point: gather K neighbor features, weight them by each kernel
    point's influence (linear/gaussian/constant in the distance between the
    neighbor's relative position and the kernel point), contract neighbors
    against kernel points on the MXU, apply per-kernel-point channel weights,
    and sum over kernel points.
    """
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pg = self.cfg.pseudo_grid
        extent = 2.0 * pg.KP_extent * self.radius / self.cfg.density_parameter
        k_radius = 1.5 * extent
        kpoints = jnp.asarray(create_kernel_points(
            k_radius, pg.num_kernel_points, fixed=pg.fixed_kernel_points,
            seed=int(self.cfg.rng_seed)))  # (K_kp, 3)

        if pg.KP_influence not in ("constant", "linear", "gaussian"):
            raise ValueError(f"Unknown KP_influence {pg.KP_influence}")
        if pg.convolution_mode != "sum":
            raise NotImplementedError(
                f"convolution_mode {pg.convolution_mode} not supported")

        fmask = _feature_mask(nbr, query_mask)               # (B,M,K)
        c = self.in_channels
        kernel_weights = self.param(
            "kernel_weights",
            nn.initializers.truncated_normal(stddev=np.sqrt(2.0 / c)),
            (int(pg.num_kernel_points), c))

        work = int(nbr.idx.shape[0]) * int(nbr.idx.shape[1]) \
            * int(nbr.idx.shape[2]) * c
        use_fused, interpret = _pallas_mode(self.cfg, work)
        dt = compute_dtype(self.cfg)
        if use_fused:
            # fused Pallas kernel: influence weights + both contractions
            # stay in VMEM (ops/pallas_kpconv.py); bf16 features halve the
            # one-hot matmul cost
            feats_in = support_features if dt is None \
                else support_features.astype(dt)
            mesh = getattr(self.cfg, "spatial_mesh", None)
            # divisibility is per mesh AXIS: the point axis shards over
            # spatial_axis only (a 2-D data x points mesh shards the batch
            # separately over spatial_batch_axis)
            n_sh = mesh.shape[self.cfg.spatial_axis] if mesh is not None \
                else 1
            b_axis = getattr(self.cfg, "spatial_batch_axis", None)
            n_b = mesh.shape[b_axis] if (mesh is not None and b_axis) else 1
            if getattr(self.cfg, "use_pallas", "auto") == "shard_map" \
                    and mesh is not None \
                    and feats_in.shape[1] % n_sh == 0 \
                    and nbr.idx.shape[1] % n_sh == 0 \
                    and feats_in.shape[0] % n_b == 0:
                # point-sharded spatial forward: a pallas_call is opaque to
                # GSPMD, so route through the shard_map wrapper that makes
                # the support all-gather explicit (parallel/spatial.py)
                from ..parallel.spatial import kpconv_aggregate_sharded
                out = kpconv_aggregate_sharded(
                    mesh, self.cfg.spatial_axis, feats_in, nbr.idx,
                    nbr.rel_xyz, fmask, kpoints, kernel_weights,
                    float(extent), pg.KP_influence, interpret,
                    batch_axis=b_axis)
            else:
                out = kpconv_aggregate(feats_in, nbr.idx, nbr.rel_xyz,
                                       fmask, kpoints, kernel_weights,
                                       float(extent), pg.KP_influence,
                                       interpret)
        else:
            grouped = group_features(support_features, nbr.idx)  # (B,M,K,C)
            # jnp oracle path: influence weights (B, M, K, K_kp) then
            # [K_kp, K] x [K, C] per (b, m) on the MXU, then per-kernel-
            # point channel weights and sum over kernel points (ref
            # :499-503).
            diff = nbr.rel_xyz[..., None, :] - kpoints[None, None, None, :, :]
            sq = jnp.sum(diff * diff, axis=-1)
            if pg.KP_influence == "constant":
                w = jnp.ones_like(sq)
            elif pg.KP_influence == "linear":
                # safe sqrt: sq is EXACTLY 0 where a neighbor coincides with
                # a kernel point (the query point itself vs the fixed center
                # kernel point), and sqrt'(0)=inf would poison gradients
                # that flow through the geometry — which happens whenever
                # the input points themselves carry gradients (GAN G-step:
                # D(points + G(points)), train_dist_GAN.py:556-560; the
                # reference's torch.sqrt has the same infinite-gradient
                # hazard there).  Zero subgradient at coincidence instead.
                d = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq,
                                                           1.0)), 0.0)
                w = jnp.maximum(1.0 - d / extent, 0.0)
            else:
                sigma = extent * 0.3
                w = jnp.exp(-sq / (2.0 * sigma * sigma + 1e-9))
            w = w * fmask[..., None]
            # Σ_p (Σ_k w·f)[p,c]·kw[p,c] reassociated as
            # Σ_k f ⊙ (Σ_p w·kw): the reference's per-(b,m) bmm form
            # (ref :499-503) lowers to B·M batched (P,K)x(K,C) tiny dots —
            # 60k of them at the 15k-point geometry, which the TPU
            # compiler takes ~16 min to schedule and the MXU runs at a
            # sliver of peak.  This form is ONE (B·M·K, P)x(P, C) thin
            # matmul plus an elementwise K-reduction, and its backward is
            # elementwise in f (no batched-tiny-dot transpose).
            g = jnp.einsum("bmkp,pc->bmkc", w, kernel_weights)
            out = jnp.sum(grouped * g, axis=2)

        if pg.output_conv or self.in_channels != self.out_channels:
            out = ConvBN(self.out_channels, self.cfg.bn_momentum,
                         dtype=compute_dtype(self.cfg))(out, train)
        else:
            out = BNReLU(self.cfg.bn_momentum)(out, train)
        return out


class PosPool(nn.Module):
    """Parameter-free position-modulated pooling
    (local_aggregation_operators.py:94-190)."""
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pp = self.cfg.pospool
        C = self.in_channels
        grouped = group_features(support_features, nbr.idx)  # (B,M,K,C)
        rel = nbr.rel_xyz / self.radius  # grouper normalize_xyz=True (:114)

        if pp.position_embedding == "xyz":
            # multiply each third of the channels by one coordinate
            B, M, K, _ = grouped.shape
            agg = grouped.reshape(B, M, K, C // 3, 3) * rel[..., None, :]
            agg = agg.reshape(B, M, K, C)
        elif pp.position_embedding == "sin_cos":
            feat_dim = C // 6
            wave_length, alpha = 1000.0, 100.0
            rng = jnp.arange(feat_dim, dtype=jnp.float32)
            dim_mat = jnp.power(wave_length, rng / feat_dim)
            pos = (alpha * rel)[..., None] / dim_mat  # (B,M,K,3,feat)
            emb = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
            emb = emb.reshape(*rel.shape[:-1], C)
            agg = grouped * emb
        else:
            raise NotImplementedError(
                f"Position embedding {pp.position_embedding} not implemented")

        out = _masked_reduce(agg, nbr, query_mask, pp.reduction)
        if pp.output_conv or self.in_channels != self.out_channels:
            out = ConvBN(self.out_channels, self.cfg.bn_momentum,
                         dtype=compute_dtype(self.cfg))(out, train)
        else:
            out = BNReLU(self.cfg.bn_momentum)(out, train)
        return out


class AdaptiveWeight(nn.Module):
    """MLP-on-relative-position adaptive weighting
    (local_aggregation_operators.py:193-302; only the ``dp`` weight type is
    implemented, like the reference :266-270)."""
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        aw = self.cfg.adaptive_weight
        if aw.weight_type != "dp":
            raise NotImplementedError(
                f"Weight type {aw.weight_type} not implemented")
        C = self.in_channels
        S = int(aw.shared_channels)
        grouped = group_features(support_features, nbr.idx)  # (B,M,K,C)
        rel = nbr.rel_xyz / self.radius

        w = rel
        for i in range(int(aw.num_mlps)):
            if i > 0:
                w = nn.relu(w)
            w = nn.Dense(C // S, use_bias=True,
                         kernel_init=nn.initializers.he_normal())(w)
        if aw.weight_softmax:
            w = nn.softmax(w, axis=2)
        B, M, K, _ = grouped.shape
        agg = grouped.reshape(B, M, K, C // S, S) * w[..., None]
        agg = agg.reshape(B, M, K, C)
        out = _masked_reduce(agg, nbr, query_mask, aw.reduction)
        if aw.output_conv or self.in_channels != self.out_channels:
            out = ConvBN(self.out_channels, self.cfg.bn_momentum,
                         dtype=compute_dtype(self.cfg))(out, train)
        else:
            out = BNReLU(self.cfg.bn_momentum)(out, train)
        return out


class PointWiseMLP(nn.Module):
    """Shared-MLP aggregation (local_aggregation_operators.py:305-400)."""
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pw = self.cfg.pointwisemlp
        grouped = group_features(support_features, nbr.idx)  # (B,M,K,C)
        rel = nbr.rel_xyz / self.radius
        # slot 0 is the distance-sorted nearest neighbor == the query point
        # itself for self-aggregation (ref relies on this too, :368).
        center = grouped[:, :, :1, :]
        relative = grouped - center
        if pw.feature_type == "dp_fj":
            x = jnp.concatenate([rel, relative], axis=-1)
        elif pw.feature_type == "dp_fi_df":
            K = grouped.shape[2]
            center_rep = jnp.broadcast_to(center, grouped.shape)
            x = jnp.concatenate([rel, center_rep, relative], axis=-1)
        else:
            raise NotImplementedError(
                f"Feature type {pw.feature_type} not implemented")

        n_mlps = int(pw.num_mlps)
        if n_mlps == 1:
            x = ConvBN(self.out_channels, self.cfg.bn_momentum,
                         dtype=compute_dtype(self.cfg))(x, train)
        else:
            mfdim = max(self.in_channels // 2, 9)
            x = ConvBN(mfdim, self.cfg.bn_momentum,
                       dtype=compute_dtype(self.cfg))(x, train)
            for _ in range(n_mlps - 2):
                x = ConvBN(mfdim, self.cfg.bn_momentum,
                       dtype=compute_dtype(self.cfg))(x, train)
            x = ConvBN(self.out_channels, self.cfg.bn_momentum,
                         dtype=compute_dtype(self.cfg))(x, train)
        return _masked_reduce(x, nbr, query_mask, pw.reduction)


class LocalAggregation(nn.Module):
    """Dispatch over aggregation operators
    (local_aggregation_operators.py:513-551)."""
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind = self.cfg.local_aggregation_type
        kw = dict(in_channels=self.in_channels, out_channels=self.out_channels,
                  radius=self.radius, cfg=self.cfg)
        if kind == "pseudo_grid":
            op = PseudoGrid(**kw)
        elif kind == "pospool":
            op = PosPool(**kw)
        elif kind == "adaptive_weight":
            op = AdaptiveWeight(**kw)
        elif kind == "pointwisemlp":
            op = PointWiseMLP(**kw)
        elif kind == "attention":
            from .attention import AttentionAggregation
            op = AttentionAggregation(**kw)
        else:
            raise NotImplementedError(f"LocalAggregation {kind} not implemented")
        return op(support_features, nbr, query_mask, train)
