"""Host-side data pipeline: mesh/cloud IO, noise+offset synthesis, patch
sampling, augmentations, batching."""
from .meshio import (
    TriMesh, load_off, save_off, read_ply, write_ply,
    sample_surface, sample_surface_even, closest_point_on_mesh,
)
from .transforms import (
    PointcloudRandomRotate, PointcloudScaleAndJitter, Compose,
    angle_axis,
)
from .offset_dataset import OffsetDataset, process_off_file
from .outlier_dataset import OutlierSegmentationDataset, compute_katz
from .loader import BatchLoader
