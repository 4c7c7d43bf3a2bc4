"""TPU kernels and point-cloud ops: FPS, kNN grouping, chamfer, approx-EMD.

Replaces the reference's pointnet_util.py (torch point ops with a sequential
GPU FPS loop) and PyTorchEMD (CUDA extension) with lax/Pallas implementations.
"""

from .pointops import (
    ball_query,
    farthest_point_sample,
    index_points,
    knn_indices,
    sample_and_group,
    sample_and_group_all,
    square_distance,
)
from .chamfer import chamfer_distances, chamfer_loss
from .emd import approx_match, earth_mover_distance, match_cost

__all__ = [
    "ball_query",
    "farthest_point_sample",
    "index_points",
    "knn_indices",
    "sample_and_group",
    "sample_and_group_all",
    "square_distance",
    "chamfer_distances",
    "chamfer_loss",
    "approx_match",
    "earth_mover_distance",
    "match_cost",
]
