"""PointNet++ set-abstraction / feature-propagation modules (flax).

Capability parity with /root/reference/pointnet_util.py:159-315
(PointNetSetAbstraction, PointNetSetAbstractionMsg,
PointNetFeaturePropagation). The torch versions use 1x1 Conv2d + BatchNorm2d
channel-wise; here that is Dense + channel BatchNorm on channels-last
tensors (identical math, no permute dances — XLA fuses the pointwise MLP
into the preceding gather).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (
    ball_query,
    farthest_point_sample,
    index_points,
    knn_indices,
    sample_and_group,
    sample_and_group_all,
    square_distance,
)
from ..ops.interp_pallas import three_nn_interpolate


class _SharedMLP(nn.Module):
    """Pointwise MLP with channel BN + relu per layer (torch Conv2d(1x1) +
    BatchNorm2d equivalent)."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for w in self.widths:
            x = nn.Dense(w)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class PointNetSetAbstraction(nn.Module):
    """Single-scale set abstraction (pointnet_util.py:159-196).

    __call__(xyz [B, N, 3], points [B, N, D] | None) ->
      (new_xyz [B, S, 3], new_points [B, S, mlp[-1]])
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    knn: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                knn=self.knn)
        feats = _SharedMLP(self.mlp)(grouped, train=train)
        return new_xyz, jnp.max(feats, axis=-2)


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale grouping set abstraction (pointnet_util.py:199-261)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    knn: bool = False

    @nn.compact
    def __call__(self, xyz, points, seed_idx=None, train: bool = False):
        if seed_idx is None:
            seed_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, seed_idx)
        outs = []
        for i, radius in enumerate(self.radius_list):
            k = self.nsample_list[i]
            if self.knn:
                idx = knn_indices(new_xyz, xyz, k)
            else:
                idx = ball_query(radius, k, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            feats = _SharedMLP(self.mlp_list[i])(grouped, train=train)
            outs.append(jnp.max(feats, axis=-2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """Inverse-distance-weighted 3-NN feature upsampling
    (pointnet_util.py:265-315). Channels-last throughout.

    __call__(xyz1 [B, N, 3], xyz2 [B, S, 3], points1 [B, N, D1] | None,
             points2 [B, S, D2]) -> [B, N, mlp[-1]]
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(
                points2, (points2.shape[0], xyz1.shape[1], points2.shape[-1]))
        else:
            # one shared 3-NN inverse-distance implementation (fused
            # Pallas kernel on TPU, XLA fallback elsewhere) instead of
            # an argsort formulation, which lowers to a full [B, N, S]
            # sort on TPU (ops/interp_pallas.py docstring)
            interpolated = three_nn_interpolate(xyz1, xyz2, points2)
        if points1 is not None:
            interpolated = jnp.concatenate([points1, interpolated], axis=-1)
        return _SharedMLP(self.mlp)(interpolated, train=train)
