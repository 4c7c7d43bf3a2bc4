"""Data layer: slicing engines, boundary labeling, augmentation, datasets.

Capability parity with /root/reference/dataset.py + dataset4val2.py: whole
clouds are sliced by a random primitive (plane/sphere/cylinder/cone),
rejection-resampled until both sides have >= 1024 points, FPS'd to 1024 per
side, labeled with top-128 mutual-chamfer boundary points, and the "up"
piece is rigidly perturbed by a mag-0.8 random twist (recording igt).

Differences by design:
  * analytic inside/outside tests replace open3d RaycastingScene signed
    distances (closed-form for sphere/cylinder/cone; removes the open3d
    dependency) — see slicers.py;
  * rejection loops are bounded with primitive re-rolls (the reference can
    loop forever, dataset.py:1175-1179);
  * everything is seeded through numpy Generators / JAX keys, so the
    pipeline is deterministic per (seed, index);
  * an additional fully on-device pipeline (device_pipeline.py) generates
    batches end-to-end under jit for benchmarking and TPU-resident training.
"""

from .slicers import cone_split, cylinder_split, plane_split, sphere_split
from .boundary import get_boundary, get_boundary_np
from .augment import random_se3_np, se3_exp_np
from .synthetic import synthetic_clouds
from .datasets import (
    BuildingDataset,
    MovedDataset,
    MovedPairDataset,
    PrecomputedPairDataset,
    PrecutPairDataset,
    SlicedCloudDataset,
)
from .registry import get_cad_datasets, get_dataset, get_test_dataset

__all__ = [
    "plane_split", "sphere_split", "cylinder_split", "cone_split",
    "get_boundary", "get_boundary_np", "random_se3_np", "se3_exp_np",
    "synthetic_clouds", "SlicedCloudDataset", "MovedDataset",
    "BuildingDataset", "PrecomputedPairDataset",
    "MovedPairDataset", "PrecutPairDataset",
    "get_dataset", "get_test_dataset", "get_cad_datasets",
]
