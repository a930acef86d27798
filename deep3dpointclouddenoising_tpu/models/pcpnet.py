"""PCPNet / PointCleanNet baseline models.

Re-implements /root/reference/u_net_arch/models/backbones/pcpnet.py
(channels-last): quaternion spatial transformers, PointNet feature
extractors, the small-init residual ``BasicBlock``, and the four model
variants; the builder uses ``ResPCPNet`` (models/build.py:102-112).

Points come in as (B, N, 3); the reference's (B, 3, N) max-pool over points
becomes a max over axis 1.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

_BN_MOM = 0.9  # torch default bn momentum 0.1


def batch_quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(B, 4) quaternion [a,b,c,d] -> (B, 3, 3) rotation
    (utils/util.py:8-33)."""
    s = 2.0 / jnp.sum(q * q, axis=1)
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack([
        1 - (c * c + d * d) * s, (b * c - d * a) * s, (b * d + c * a) * s,
        (b * c + d * a) * s, 1 - (b * b + d * d) * s, (c * d - b * a) * s,
        (b * d - c * a) * s, (c * d + b * a) * s, 1 - (b * b + c * c) * s,
    ], axis=-1)
    return r.reshape(-1, 3, 3)


def _small_uniform(stdv: float = 0.001):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


class DenseBN(nn.Module):
    features: int
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - self.bn_momentum)(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """Small-init residual MLP block (pcpnet.py:216-254): two layers with
    uniform(-1e-3, 1e-3) init, BN momentum 0.01, identity/projected
    shortcut."""
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = _small_uniform()
        out = nn.Dense(self.planes, kernel_init=init, bias_init=init)(x)
        out = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=0.99)(out))
        out = nn.Dense(self.planes, kernel_init=init, bias_init=init)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99)(out)
        if x.shape[-1] != self.planes:
            sc = nn.Dense(self.planes, kernel_init=init, bias_init=init)(x)
            sc = nn.BatchNorm(use_running_average=not train,
                              momentum=_BN_MOM)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


def _per_scale_max(x: jnp.ndarray, num_scales: int) -> jnp.ndarray:
    """(B, S*N, C) -> (B, S*C): symmetric max within each scale's segment
    (the reference's per-scale MaxPool1d loop, pcpnet.py:44-50/419-427)."""
    B, SN, C = x.shape
    n = SN // num_scales
    return jnp.max(x.reshape(B, num_scales, n, C), axis=2).reshape(B, -1)


class STN(nn.Module):
    """Spatial transformer (pcpnet.py:12-90); quaternion output mode adds
    the identity quaternion and converts to a rotation matrix.  For
    ``num_scales > 1`` the max pool runs per scale segment and an extra
    1024 layer merges the concatenated scale features (pcpnet.py:38-57)."""
    dim: int = 3
    quaternion: bool = False
    residual: bool = False  # ResSTN (pcpnet.py:258-330) uses BasicBlocks
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        if self.residual:
            h = BasicBlock(64)(x, train)
            h = BasicBlock(128)(h, train)
            h = BasicBlock(1024)(h, train)
            h = _per_scale_max(h, self.num_scales)
            if self.num_scales > 1:
                h = BasicBlock(1024)(h, train)
            h = BasicBlock(512)(h, train)
            h = BasicBlock(256)(h, train)
            h = BasicBlock(4 if self.quaternion else self.dim ** 2)(h, train)
        else:
            h = DenseBN(64)(x, train)
            h = DenseBN(128)(h, train)
            h = DenseBN(1024)(h, train)
            h = _per_scale_max(h, self.num_scales)
            if self.num_scales > 1:
                h = DenseBN(1024)(h, train)
            h = DenseBN(512)(h, train)
            h = DenseBN(256)(h, train)
            h = nn.Dense(4 if self.quaternion else self.dim ** 2)(h)
        if self.quaternion:
            h = h + jnp.array([1.0, 0.0, 0.0, 0.0])
            return batch_quat_to_rotmat(h)
        h = h + jnp.eye(self.dim).reshape(-1)
        return h.reshape(B, self.dim, self.dim)


class PointNetFeat(nn.Module):
    """PointNet global feature extractor (pcpnet.py:93-211 /
    ResPointNetfeat :331-434).  ``num_scales > 1`` expects the scales
    concatenated along the point axis (B, S*N, 3) and emits a
    (B, 1024*S^2) global feature: the 1024 layer widens to 1024*S, then
    the symmetric op reduces each scale's segment separately
    (pcpnet.py:398-427)."""
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    residual: bool = True
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = (lambda c: BasicBlock(c)) if self.residual \
            else (lambda c: DenseBN(c))
        trans = trans2 = None
        if self.use_point_stn:
            trans = STN(dim=3, quaternion=True, residual=self.residual,
                        num_scales=self.num_scales)(x, train)
            x = jnp.einsum("bnd,bde->bne", x, trans)
        x = Block(64)(x, train)
        x = Block(64)(x, train)
        if self.use_feat_stn:
            trans2 = STN(dim=64, residual=self.residual,
                         num_scales=self.num_scales)(x, train)
            x = jnp.einsum("bnd,bde->bne", x, trans2)
        x = Block(64)(x, train)
        x = Block(128)(x, train)
        x = Block(1024)(x, train)
        if self.num_scales > 1:
            x = Block(1024 * self.num_scales)(x, train)
        if self.sym_op == "max":
            x = _per_scale_max(x, self.num_scales)
        elif self.sym_op == "sum":
            B, SN, C = x.shape
            n = SN // self.num_scales
            x = jnp.sum(x.reshape(B, self.num_scales, n, C),
                        axis=2).reshape(B, -1)
        else:
            raise ValueError(f"Unsupported symmetric op {self.sym_op}")
        return x, trans, trans2


class ResPCPNet(nn.Module):
    """Residual PCPNet regressing one output vector per patch
    (pcpnet.py:436-461) — the PCN-baseline generator used by
    build_offset_regression_PCN.

    ``linear_output`` (default True, deliberate divergence): the
    reference's output block is a BasicBlock whose forward ends in
    ``F.relu`` (pcpnet.py:251-255), so its ResPCPNet can only emit
    NON-NEGATIVE offsets — trained from scratch on signed offset targets
    it collapses to the zero predictor (measured: loss pinned at the
    zero-pred baseline from epoch 2, output exactly 0 through the dead
    output ReLU).  The reference never trained PCN from scratch (its
    PCN_origin.yaml fine-tunes pretrained weights at sgd lr 1e-8, where
    the defect is invisible).  A small-init linear head regresses signed
    offsets; set linear_output=False for the reference-faithful block."""
    num_points: int = 500
    output_dim: int = 3
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    linear_output: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, trans, trans2 = PointNetFeat(
            use_point_stn=self.use_point_stn, use_feat_stn=self.use_feat_stn,
            sym_op=self.sym_op, residual=True)(x, train)
        h = BasicBlock(512)(feat, train)
        h = BasicBlock(256)(h, train)
        if self.linear_output:
            init = _small_uniform()
            h = nn.Dense(self.output_dim, kernel_init=init,
                         bias_init=init)(h)
        else:
            h = BasicBlock(self.output_dim)(h, train)
        return h, trans, trans2


class PCPNet(nn.Module):
    """Vanilla PCPNet head with dropout (pcpnet.py:489-527)."""
    num_points: int = 500
    output_dim: int = 3
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, trans, trans2 = PointNetFeat(
            use_point_stn=self.use_point_stn, use_feat_stn=self.use_feat_stn,
            sym_op=self.sym_op, residual=False)(x, train)
        h = DenseBN(512)(feat, train)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = DenseBN(256)(h, train)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = nn.Dense(self.output_dim)(h)
        return h, trans, trans2


class ResMSPCPNet(nn.Module):
    """Multi-scale residual PCPNet (pcpnet.py:463-487): input is the scales
    concatenated along the point axis; a 1024 block merges the
    (B, 1024*S^2) multi-scale feature before the regression head."""
    num_scales: int = 2
    num_points: int = 500
    output_dim: int = 3
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, trans, trans2 = PointNetFeat(
            use_point_stn=self.use_point_stn, use_feat_stn=self.use_feat_stn,
            sym_op=self.sym_op, residual=True,
            num_scales=self.num_scales)(x, train)
        h = BasicBlock(1024)(feat, train)
        h = BasicBlock(512)(h, train)
        h = BasicBlock(256)(h, train)
        h = BasicBlock(self.output_dim)(h, train)
        return h, trans, trans2


class MSPCPNet(nn.Module):
    """Multi-scale vanilla PCPNet (pcpnet.py:528-560)."""
    num_scales: int = 2
    num_points: int = 500
    output_dim: int = 3
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat, trans, trans2 = PointNetFeat(
            use_point_stn=self.use_point_stn, use_feat_stn=self.use_feat_stn,
            sym_op=self.sym_op, residual=False,
            num_scales=self.num_scales)(x, train)
        h = DenseBN(1024)(feat, train)
        h = DenseBN(512)(h, train)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = DenseBN(256)(h, train)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = nn.Dense(self.output_dim)(h)
        return h, trans, trans2
