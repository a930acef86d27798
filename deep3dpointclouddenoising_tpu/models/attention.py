"""Attention operator zoo.

Re-implements every attention variant of
/root/reference/u_net_arch/models/attention_ops.py in channels-last (B, N, C)
layout, plus the wrapper that combines a PointWiseMLP aggregation with a
global attention module (local_aggregation_operators.py:17-91).  All are
dense O(N^2) within one padded patch, mapping onto batched MXU matmuls.

Conversion note: the reference works on (B, C, N); a torch ``bmm(v, att)``
with v:(B,C,N), att:(B,N,N) is ``einsum('bjc,bji->bic')`` here.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops import group_features
from .layers import BNReLU, ConvBN
from .pyramid import Neighborhood

_BN_MOM = 0.9  # flax momentum for torch default bn momentum 0.1


def _bn(train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=_BN_MOM)


class OffsetAttention(nn.Module):
    """PCT-style offset attention (attention_ops.py:58-86); q and k share
    weights, attention is doubly normalized (softmax over keys then column
    sum), and the residual goes through a transform conv."""
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // self.ratio
        qk = nn.Dense(c_lat, use_bias=False)
        x_q = nn.relu(_bn(train)(qk(x)))
        x_k = nn.relu(_bn(train)(qk(x)))
        x_v = nn.relu(_bn(train)(nn.Dense(self.channels)(x)))
        energy = jnp.einsum("bic,bjc->bij", x_q, x_k)
        att = nn.softmax(energy, axis=-1)
        att = att / (1e-9 + jnp.sum(att, axis=1, keepdims=True))
        x_r = jnp.einsum("bjc,bji->bic", x_v, att)
        x_r = nn.relu(_bn(train)(nn.Dense(self.channels)(x - x_r)))
        return x + x_r


class PointAttentionNetwork(nn.Module):
    """attention_ops.py:90-121."""
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // self.ratio
        a = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        b = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        s = nn.softmax(jnp.einsum("bic,bjc->bij", a, b), axis=-1)
        d = nn.relu(_bn(train)(nn.Dense(self.channels, use_bias=False)(x)))
        return x + jnp.einsum("bjc,bij->bic", d, s)


class ShapeContext(nn.Module):
    """A-SCN (attention_ops.py:124-156): out = V @ A^T + V."""
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // self.ratio
        q = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        k = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        a = nn.softmax(jnp.einsum("bic,bjc->bij", q, k), axis=-1)
        v = nn.relu(_bn(train)(nn.Dense(self.channels, use_bias=False)(x)))
        return jnp.einsum("bjc,bij->bic", v, a) + v


class CrissCrossAttention(nn.Module):
    """Criss-cross attention degenerated to the (N, 1) grid the reference
    feeds it (attention_ops.py:162-216): row attention over all points with
    -inf self energy, plus a per-point self branch, jointly softmaxed."""
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // self.ratio
        q = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        k = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        v = nn.relu(_bn(train)(nn.Dense(self.channels, use_bias=False)(x)))
        n = x.shape[1]
        energy_h = jnp.einsum("bic,bjc->bij", q, k)
        # -inf on the diagonal (NOT energy - eye*inf: 0*inf = nan)
        energy_h = jnp.where(jnp.eye(n, dtype=bool)[None], -jnp.inf,
                             energy_h)
        energy_w = jnp.sum(q * k, axis=-1, keepdims=True)  # self energy
        att = nn.softmax(jnp.concatenate([energy_h, energy_w], axis=-1),
                         axis=-1)
        att_h, att_w = att[..., :n], att[..., n:]
        out_h = jnp.einsum("bjc,bij->bic", v, att_h)
        out_w = v * att_w
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * (out_h + out_w) + x


class PAM(nn.Module):
    """Position attention module (attention_ops.py:219-244)."""
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // 8
        a = nn.Dense(c_lat)(x)
        b = nn.Dense(c_lat)(x)
        att = nn.softmax(jnp.einsum("bic,bjc->bij", a, b), axis=-1)
        d = nn.Dense(self.channels)(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * jnp.einsum("bjc,bij->bic", d, att) + x


class CAM(nn.Module):
    """Channel attention module (attention_ops.py:247-267)."""
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        g = jnp.einsum("bnc,bnd->bcd", x, x)  # (B, C, C)
        g = jnp.max(g, axis=-1, keepdims=True) - g
        att = nn.softmax(g, axis=1)  # torch Softmax(dim=1) over rows
        out = jnp.einsum("bcd,bnd->bnc", att, x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class DualAttention(nn.Module):
    """PAM + CAM (attention_ops.py:269-279)."""
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return CAM(self.channels)(x, train) + PAM(self.channels)(x, train)


class CBAMAttention(nn.Module):
    """CBAM channel + spatial attention (attention_ops.py:282-345)."""
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # channel attention: shared MLP over avg- and max-pooled descriptors
        mlp = nn.Sequential([
            nn.Dense(self.channels // self.ratio, use_bias=False), nn.relu,
            nn.Dense(self.channels, use_bias=False)])
        avg = jnp.mean(x, axis=1, keepdims=True)
        mx = jnp.max(x, axis=1, keepdims=True)
        x = x * nn.sigmoid(mlp(avg) + mlp(mx))
        # spatial attention: conv over [max, mean] channel stats per point
        s_avg = jnp.mean(x, axis=-1, keepdims=True)
        s_max = jnp.max(x, axis=-1, keepdims=True)
        s = nn.Dense(1, use_bias=False)(
            jnp.concatenate([s_max, s_avg], axis=-1))
        s = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99)(s))
        return x * nn.sigmoid(s)


class NonLocalModule(nn.Module):
    """Non-local block with latent-channel value path
    (attention_ops.py:396-437)."""
    channels: int
    latent: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_lat = self.channels // self.latent
        q = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        k = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        att = nn.softmax(jnp.einsum("bic,bjc->bij", q, k), axis=-1)
        v = nn.relu(_bn(train)(nn.Dense(c_lat, use_bias=False)(x)))
        agg = jnp.einsum("bjc,bij->bic", v, att)
        out = nn.relu(_bn(train)(nn.Dense(self.channels,
                                          use_bias=False)(agg)))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class CAA_Module(nn.Module):
    """Channel-wise affinity attention (attention_ops.py:440-483): the
    query/key convs run over the *point* axis, so they depend on N."""
    channels: int
    num_points: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_lat = max(self.num_points // 8, 1)
        xt = jnp.swapaxes(x, 1, 2)  # (B, C, N)
        q = nn.relu(_bn(train)(nn.Dense(n_lat, use_bias=False)(xt)))
        k = nn.relu(_bn(train)(nn.Dense(n_lat, use_bias=False)(xt)))
        sim = jnp.einsum("bcn,bdn->bcd", k, q)
        aff = nn.softmax(jnp.max(sim, axis=-1, keepdims=True) - sim, axis=-1)
        v = nn.relu(_bn(train)(nn.Dense(self.channels, use_bias=False)(x)))
        out = jnp.einsum("bcd,bnd->bnc", aff, v)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        return alpha * out + x


class SE(nn.Module):
    """Squeeze-and-excitation (attention_ops.py:486-501)."""
    channels: int
    r: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = jnp.mean(x, axis=1)  # (B, C)
        s = nn.Dense(self.channels // self.r, use_bias=False)(s)
        s = nn.relu(s)
        s = nn.sigmoid(nn.Dense(self.channels, use_bias=False)(s))
        return x * s[:, None, :]


class PointTransformer(nn.Module):
    """Vector attention over ball neighborhoods (attention_ops.py:347-393).

    x_i (the reference's nearest-neighbor feature) is slot 0 of the
    distance-sorted neighborhood — identical to its separate 1-NN grouper.
    """
    channels: int
    radius: float

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = self.channels
        x_j = group_features(support_features, nbr.idx)  # (B,M,K,C)
        rel = nbr.rel_xyz / self.radius
        delta = nn.Dense(C)(rel)
        delta = nn.relu(_bn(train)(nn.Dense(C)(delta)))
        x_i = jnp.broadcast_to(x_j[:, :, :1, :], x_j.shape)
        lin_i = nn.Dense(C)(x_i)
        lin_j = nn.Dense(C)(x_j)
        relation = lin_i - lin_j + delta
        relation = nn.Dense(C)(relation)
        relation = nn.relu(_bn(train)(nn.Dense(C)(relation)))
        weights = nn.softmax(relation, axis=2)  # over neighbors
        feats = nn.Dense(C)(x_j) + delta
        fmask = (nbr.mask + (1.0 - query_mask[:, :, None]))[..., None]
        return jnp.sum(weights * feats * fmask, axis=2)


_GLOBAL_ATTENTION = {
    "Non-local": NonLocalModule,
    "Criss-cross": CrissCrossAttention,
    "SE": SE,
    "CBAM": CBAMAttention,
    "Dual-attention": DualAttention,
    "A-SCN": ShapeContext,
    "Point-attention": PointAttentionNetwork,
    "Offset-attention": OffsetAttention,
}


class AttentionAggregation(nn.Module):
    """The Attention local-aggregation wrapper
    (local_aggregation_operators.py:17-91): PointWiseMLP aggregation followed
    by a global attention module, then BN+ReLU (with a 1x1 conv when channel
    counts differ)."""
    in_channels: int
    out_channels: int
    radius: float
    cfg: Config

    @nn.compact
    def __call__(self, support_features: jnp.ndarray, nbr: Neighborhood,
                 query_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .local_aggregation import PointWiseMLP

        kind = self.cfg.attention.type
        if kind == "Point-transformer":
            out = PointTransformer(self.in_channels, self.radius)(
                support_features, nbr, query_mask, train)
        else:
            out = PointWiseMLP(self.in_channels, self.out_channels,
                               self.radius, self.cfg)(
                support_features, nbr, query_mask, train)
            if kind == "CAA":
                mod = CAA_Module(self.in_channels, out.shape[1])
            elif kind in _GLOBAL_ATTENTION:
                mod = _GLOBAL_ATTENTION[kind](self.in_channels)
            else:
                raise NotImplementedError(f"Attention type {kind}")
            out = mod(out, train)
        if self.in_channels != self.out_channels:
            out = ConvBN(self.out_channels, self.cfg.bn_momentum)(out, train)
        else:
            out = BNReLU(self.cfg.bn_momentum)(out, train)
        return out
