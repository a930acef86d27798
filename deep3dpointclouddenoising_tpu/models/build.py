"""Task-model builders (re-design of
/root/reference/u_net_arch/models/build.py).

Each model is a flax module taking padded ``(xyz, mask, features)`` batches;
it builds the geometry pyramid once, runs the encoder, and applies its head.
Builders return ``(module, loss_fn)`` like the reference returns
``(model, criterion)``.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..losses import (
    get_offset_regression_loss,
    label_smoothing_cross_entropy,
    masked_binary_cross_entropy,
    masked_cross_entropy,
    multi_shape_cross_entropy,
)
from ..losses.build import get_complete_denoising_loss
from .heads import (
    ClassifierHead,
    DiscriminatorHead,
    MultiDimHead,
    MultiPartSegHead,
    SceneSegHead,
)
from .pyramid import Pyramid, build_pyramid
from .resnet import ResNetEncoder

OFFSET_REG_DIM = 3
OUTLIER_DETECT_DIM = 1


class PyramidModel(nn.Module):
    """Base: pyramid -> ResNet encoder -> head.

    ``pyramid_hook`` (optional) post-processes the freshly built geometry
    pyramid before the network consumes it — the injection point used by
    ``parallel.spatial`` to pin GSPMD sharding constraints on every
    per-point axis (sequence/context parallelism over one giant cloud).
    It must be parameter-free, so checkpoints trained without a hook load
    unchanged.
    """
    cfg: Config
    head_kind: str = "offset_reg_head"
    num_out: int = OFFSET_REG_DIM
    pyramid_hook: Optional[Callable[[Pyramid], Pyramid]] = None

    def _check_backbone(self):
        if self.cfg.backbone != "resnet":
            raise NotImplementedError(
                f"Backbone {self.cfg.backbone} not implemented")

    def make_pyramid(self, xyz: jnp.ndarray, mask: jnp.ndarray) -> Pyramid:
        cfg = self.cfg
        pyramid = build_pyramid(
            xyz, mask, radius=float(cfg.radius), sample_dl=float(cfg.sampleDl),
            nsamples=list(cfg.nsamples), npoints=list(cfg.npoints),
            build_self=int(cfg.depth) > 1,
            build_up=self.head_kind in
            ("offset_reg_head", "resnet_scene_seg", "resnet_part_seg"))
        if self.pyramid_hook is not None:
            pyramid = self.pyramid_hook(pyramid)
        return pyramid

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, mask: jnp.ndarray,
                 features: jnp.ndarray, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return self.apply_head(pyramid, feats, train)

    def apply_head(self, pyramid, feats, train):
        raise NotImplementedError


class OffsetRegressionModel(PyramidModel):
    """U-Net offset regressor: per-point (B, N, 3) displacement
    (build.py:236-262)."""

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        if self.cfg.head != "offset_reg_head":
            raise NotImplementedError(
                f"Head {self.cfg.head} not implemented in OffsetRegression")
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return MultiDimHead(OFFSET_REG_DIM, self.cfg)(pyramid, feats, train)


class CompleteDenoisingModel(PyramidModel):
    """Offsets + outlierness: per-point (B, N, 4) (build.py:264-280)."""

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return MultiDimHead(OFFSET_REG_DIM + OUTLIER_DETECT_DIM, self.cfg)(
            pyramid, feats, train)


class SceneSegmentationModel(PyramidModel):
    """Per-point class logits (build.py:172-198)."""
    head_kind: str = "resnet_scene_seg"

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return SceneSegHead(int(self.cfg.num_classes), self.cfg)(
            pyramid, feats, train)


class ClassificationModel(PyramidModel):
    """Global shape classification (build.py:115-141)."""
    head_kind: str = "resnet_cls"

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return ClassifierHead(int(self.cfg.num_classes), self.cfg)(
            pyramid, feats, train)


class MultiPartSegmentationModel(PyramidModel):
    """Per-part logits per shape class (build.py:144-169)."""
    head_kind: str = "resnet_part_seg"

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return MultiPartSegHead(int(self.cfg.num_classes),
                                list(self.cfg.num_parts), self.cfg)(
            pyramid, feats, train)


class DiscriminatorModel(PyramidModel):
    """GAN discriminator: (B, 1) real/fake probability (build.py:201-233)."""
    head_kind: str = "discriminator_head"

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool = False):
        self._check_backbone()
        pyramid = self.make_pyramid(xyz, mask)
        feats = ResNetEncoder(self.cfg)(pyramid, features, train)
        return DiscriminatorHead(self.cfg)(pyramid, feats, train)


def _features_dim(cfg: Config) -> int:
    return int(cfg.input_features_dim) if int(cfg.input_features_dim) > 0 else 3


def build_offset_regression(cfg: Config):
    model = OffsetRegressionModel(cfg=cfg)
    return model, get_offset_regression_loss(cfg.loss)


def build_complete_denoising(cfg: Config):
    model = CompleteDenoisingModel(cfg=cfg)
    return model, get_complete_denoising_loss(cfg.loss, float(cfg.in_radius))


def build_scene_segmentation(cfg: Config):
    return SceneSegmentationModel(cfg=cfg), masked_cross_entropy


def build_classification(cfg: Config):
    return ClassificationModel(cfg=cfg), label_smoothing_cross_entropy


def build_discriminator(cfg: Config):
    def bce(prob, target):
        return masked_binary_cross_entropy(
            prob, target, jnp.ones_like(prob))
    return DiscriminatorModel(cfg=cfg), bce


def build_multi_part_segmentation(cfg: Config):
    return (MultiPartSegmentationModel(cfg=cfg), multi_shape_cross_entropy)


def build_offset_regression_PCN(cfg: Config):
    """PointCleanNet (ResPCPNet) baseline (build.py:102-112)."""
    from .pcpnet import ResPCPNet
    model = ResPCPNet(num_points=int(cfg.num_points), output_dim=3,
                      use_feat_stn=True, sym_op="max")

    def l1(pred, target):
        return jnp.mean(jnp.abs(pred - target))
    return model, l1
