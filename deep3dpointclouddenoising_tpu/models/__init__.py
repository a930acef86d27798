"""Model library: KPConv-style U-Net backbone, task heads, builders."""
from .build import (
    build_offset_regression,
    build_complete_denoising,
    build_discriminator,
    build_scene_segmentation,
    build_classification,
    build_offset_regression_PCN,
)
