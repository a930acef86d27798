"""Loss library (pure functions over padded, masked batches).

Re-implements every loss in /root/reference/u_net_arch/models/losses/ as
vmapped on-device math: the reference's per-batch-item python loops over
boolean-masked variable-length clouds (masked_chamfer_loss.py:19-28 etc.)
become a single masked, fixed-shape computation, and the pytorch3d
``knn_points`` dependency becomes a masked argmin over pairwise distances
(chamfer_distance_aux.py:154-179 semantics).
"""
from .masked import (
    masked_l1_loss,
    masked_offset_loss,
    masked_binary_cross_entropy,
    masked_cross_entropy,
    masked_outlier_loss,
    label_smoothing_cross_entropy,
    multi_shape_cross_entropy,
)
from .chamfer import (
    chamfer_distance,
    masked_chamfer_loss,
    masked_chamfer_l1_loss,
    masked_adaptive_l1_chamfer_loss,
)
from .build import get_offset_regression_loss, get_complete_denoising_loss

__all__ = [
    "masked_l1_loss",
    "masked_offset_loss",
    "masked_binary_cross_entropy",
    "masked_cross_entropy",
    "masked_outlier_loss",
    "label_smoothing_cross_entropy",
    "multi_shape_cross_entropy",
    "chamfer_distance",
    "masked_chamfer_loss",
    "masked_chamfer_l1_loss",
    "masked_adaptive_l1_chamfer_loss",
    "get_offset_regression_loss",
    "get_complete_denoising_loss",
]
