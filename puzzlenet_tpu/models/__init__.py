"""Model layer: the two-branch PCT assembly network and PointNet++ modules."""

from .puzzlenet import PuzzleNet, PuzzleNetOutput
from .encoder import PCTEncoder, OffsetAttention, PointSlotBatchNorm
from .pointnet import (
    PointNetFeaturePropagation,
    PointNetSetAbstraction,
    PointNetSetAbstractionMsg,
)

__all__ = [
    "PuzzleNet",
    "PuzzleNetOutput",
    "PCTEncoder",
    "OffsetAttention",
    "PointSlotBatchNorm",
    "PointNetSetAbstraction",
    "PointNetSetAbstractionMsg",
    "PointNetFeaturePropagation",
]
