"""Multi-piece reassembly (iterative greedy pairwise matching)."""

from .ensemble import ensemble_assemble
from .fragment import fragment_cloud, scatter_pieces
from .greedy import AssemblyResult, greedy_assemble, score_pairs
from .hierarchy import hierarchical_assemble
from .icp import icp_align
from .polish import polish_poses
from .spanning import spanning_assemble
from .sync import sync_assemble, synchronize_poses

__all__ = ["greedy_assemble", "spanning_assemble", "sync_assemble",
           "ensemble_assemble", "hierarchical_assemble",
           "synchronize_poses", "score_pairs",
           "AssemblyResult", "fragment_cloud", "scatter_pieces",
           "icp_align", "polish_poses"]
