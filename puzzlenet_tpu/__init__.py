"""PuzzleNet-TPU: a TPU-native (JAX/XLA/Pallas) framework for boundary-aware
point-cloud fragment assembly.

Re-implements the full capability surface of Gibbs-liu/PuzzleNet (boundary-aware
feature matching for non-overlapping 3D point-cloud assembly, JCST 2023) as an
idiomatic JAX framework: Pallas/lax kernels for the PointNet++-style sampling
stack and the approxmatch earth-mover's distance, pure-jnp SE(3)/SO(3) Lie math,
a flax two-branch point-cloud transformer, and a jitted mesh-sharded train/eval
loop preserving the reference CLI, dataset categories, loss modes and the
10-metric evaluation contract.
"""

__version__ = "0.1.0"
