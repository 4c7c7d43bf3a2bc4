"""Multi-piece reassembly (iterative greedy pairwise matching)."""

from .greedy import AssemblyResult, greedy_assemble, score_pairs

__all__ = ["greedy_assemble", "score_pairs", "AssemblyResult"]
