from .datasets import (
    KITTI360,
    KITTIRaw,
    RangeImageDataset,
    SyntheticLiDAR,
    make_dataset,
)
from .loader import DataLoader, nearest_exact_resize_jnp, preprocess_batch
from .projection import load_points_as_images, project_points, project_points_numpy

__all__ = [
    "KITTI360",
    "KITTIRaw",
    "RangeImageDataset",
    "SyntheticLiDAR",
    "make_dataset",
    "DataLoader",
    "preprocess_batch",
    "nearest_exact_resize_jnp",
    "load_points_as_images",
    "project_points",
    "project_points_numpy",
]
