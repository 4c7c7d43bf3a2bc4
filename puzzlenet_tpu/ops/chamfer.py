"""Chamfer distance on the MXU.

Capability parity with the reference's inline chamfer_loss (model5_b.py:
1495-1505, copy-pasted into 7 dataset classes, e.g. dataset.py:823-833):
dense pairwise squared distances via the matmul expansion, then directional
minima. One implementation here instead of eight copies.
"""

import jax.numpy as jnp

from .pointops import square_distance


def chamfer_distances(a, b, precision="highest"):
    """Directional minimum squared distances.

    a [B, N, 3], b [B, M, 3] -> (d_b [B, M], d_a [B, N]):
      d_b[j] = min_i |a_i - b_j|^2   (reference's torch.min(P, 1)[0])
      d_a[i] = min_j |a_i - b_j|^2   (reference's torch.min(P, 2)[0])

    Large point sets on TPU route through the fused Pallas kernel
    (ops/chamfer_pallas.py) — elementwise-exact distances, no [B, N, M]
    tensor in HBM, analytic index-routed backward. Small sets (the
    128-point boundary chamfers) and other backends keep the reference's
    matmul expansion.
    """
    from . import chamfer_pallas
    if chamfer_pallas.pallas_supported(a.shape[1], b.shape[1]):
        return chamfer_pallas.chamfer_distances_fused(a, b)
    P = square_distance(a, b, precision=precision)  # [B, N, M]
    return jnp.min(P, axis=1), jnp.min(P, axis=2)


def chamfer_loss(a, b, reduce="mean", precision="highest"):
    """Symmetric chamfer scalar per batch: mean (or sum) of both directions,
    matching ``mean(d1) + mean(d2)`` as used throughout the reference
    (model5_b.py:956-960)."""
    d_b, d_a = chamfer_distances(a, b, precision=precision)
    if reduce == "mean":
        return jnp.mean(d_b, axis=-1) + jnp.mean(d_a, axis=-1)
    return jnp.sum(d_b, axis=-1) + jnp.sum(d_a, axis=-1)
