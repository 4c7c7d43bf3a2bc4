"""Multi-piece reassembly (iterative greedy pairwise matching)."""

from .fragment import fragment_cloud, scatter_pieces
from .greedy import AssemblyResult, greedy_assemble, score_pairs
from .icp import icp_align

__all__ = ["greedy_assemble", "score_pairs", "AssemblyResult",
           "fragment_cloud", "scatter_pieces", "icp_align"]
