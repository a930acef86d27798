"""Fixed-capacity, mask-aware point ops (TPU-native equivalents of the
reference CUDA extension ``pt_custom_ops._ext``).

Every op is pure, jit-compatible, static-shape, and differentiable where the
reference op is (only grouping carries gradients; index builders are
``stop_gradient``, mirroring ``mark_non_differentiable`` in
/root/reference/u_net_arch/pt_custom_ops/pt_utils.py:73,89,104).
"""
from .neighbors import (
    masked_ordered_ball_query,
    masked_nearest_query,
    group_features,
    group_xyz,
)
from .subsample import masked_grid_subsampling, grid_subsample_numpy

__all__ = [
    "masked_ordered_ball_query",
    "masked_nearest_query",
    "group_features",
    "group_xyz",
    "masked_grid_subsampling",
    "grid_subsample_numpy",
]
