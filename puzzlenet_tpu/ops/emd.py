"""Approximate earth-mover's distance (annealed soft bipartite matching).

Capability parity with the reference's only native component, the PyTorchEMD
CUDA extension (/root/reference/PyTorchEMD/cuda/emd_kernel.cu):

* ``approx_match``  — the 10-round annealing loop (emd_kernel.cu:26-158):
  temperatures level = -4^j for j = 7..-1 and level = 0 on the final round;
  each round (a) normalizes per-left-point assignment mass against remaining
  right capacity, (b) caps per-right-point consumption at remaining mass,
  (c) accumulates the match matrix and decrements both sides' remaining mass.
* ``match_cost``    — sum of match-weighted squared distances
  (emd_kernel.cu:201-243).
* gradients         — the analytic formulas of matchcostgrad1/2
  (emd_kernel.cu:287-355): d cost/d xyz = 2 * match * (xyz - other), with the
  match matrix treated as a constant (custom_vjp; do NOT differentiate
  through the annealing loop).

The CUDA kernel's thread/shared-memory tiling dissolves into dense [n, m]
array ops: each round is two matvecs and one rank-revealing elementwise
product, which XLA maps onto MXU/VPU directly. The whole loop is a
``lax.fori_loop`` so a single compilation serves any batch. A fused Pallas
version that keeps D and the running match in VMEM across all 10 rounds
lives in ``emd_pallas.py`` (TPU fast path).
"""

import jax
import jax.numpy as jnp
from jax import lax

from .pointops import square_distance

_NUM_ROUNDS = 10  # j = 7 .. -2 (emd_kernel.cu:46)


def _round_levels(dtype=jnp.float32):
    js = jnp.arange(7, -3, -1, dtype=dtype)
    levels = -(4.0 ** js)
    return levels.at[-1].set(0.0)  # final round: level = 0 (emd_kernel.cu:48-50)


def _approx_match_single(xyz1, xyz2):
    """One (n, m) pair -> match [m, n] (row = xyz2 point, col = xyz1 point,
    matching the CUDA layout match[l * n + k])."""
    n, m = xyz1.shape[0], xyz2.shape[0]
    dtype = xyz1.dtype
    # per-point capacities (emd_kernel.cu:28-35; C integer division)
    multiL = float(1 if n >= m else m // n)
    multiR = float(n // m if n >= m else 1)

    # clamp: the matmul-expansion distance can round slightly NEGATIVE
    # for near-coincident points, and exp(-4^7 * D) then overflows to inf
    # and poisons the match with NaN — the CUDA reference and the Pallas
    # kernel both compute d elementwise and never see this
    D = jnp.maximum(square_distance(xyz1[None], xyz2[None])[0], 0.0)
    levels = _round_levels(dtype)

    def body(r, state):
        match, remainL, remainR = state
        level = levels[r]
        K = jnp.exp(level * D)                                   # [n, m]
        # (a) per-left normalization against remaining right mass
        suml = 1e-9 + jnp.matmul(K, remainR, precision="highest")    # [n]
        ratioL = remainL / suml
        # (b) per-right consumption capped at remaining mass
        sumr = jnp.matmul(K.T, ratioL, precision="highest") * remainR  # [m]
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        # (c) accumulate match and decrement left mass
        W = K * ratioL[:, None] * ratioR[None, :]                # [n, m]
        match = match + W.T
        remainL = jnp.maximum(0.0, remainL - jnp.sum(W, axis=1))
        return match, remainL, remainR

    init = (
        jnp.zeros((m, n), dtype),
        jnp.full((n,), multiL, dtype),
        jnp.full((m,), multiR, dtype),
    )
    match, _, _ = lax.fori_loop(0, _NUM_ROUNDS, body, init)
    return match


@jax.jit
def approx_match(xyz1, xyz2):
    """Annealed soft matching: xyz1 [B, n, 3], xyz2 [B, m, 3] -> [B, m, n]."""
    return jax.vmap(_approx_match_single)(xyz1, xyz2)


@jax.jit
def match_cost(xyz1, xyz2, match):
    """cost[b] = sum_{k,l} |xyz1_k - xyz2_l|^2 * match[l, k]
    (emd_kernel.cu:201-243)."""
    D = square_distance(xyz1, xyz2)          # [B, n, m]
    return jnp.sum(D * jnp.swapaxes(match, -1, -2), axis=(-1, -2))


def _match_grads(xyz1, xyz2, match):
    """Unscaled analytic gradients (emd_kernel.cu:287-355).

    grad1[k] = sum_l 2 match[l,k] (xyz1[k] - xyz2[l])
    grad2[l] = sum_k 2 match[l,k] (xyz2[l] - xyz1[k])
    expressed as two matmuls (MXU) instead of the CUDA reduction trees.
    """
    mT = jnp.swapaxes(match, -1, -2)                        # [B, n, m]
    mass1 = jnp.sum(mT, axis=-1, keepdims=True)             # [B, n, 1]
    mass2 = jnp.sum(match, axis=-1, keepdims=True)          # [B, m, 1]
    grad1 = 2.0 * (xyz1 * mass1 -
                   jnp.matmul(mT, xyz2, precision="highest"))
    grad2 = 2.0 * (xyz2 * mass2 -
                   jnp.matmul(match, xyz1, precision="highest"))
    return grad1, grad2


@jax.custom_vjp
def _emd_cost(xyz1, xyz2):
    match = approx_match(xyz1, xyz2)
    return match_cost(xyz1, xyz2, match)


def _emd_fwd(xyz1, xyz2):
    match = approx_match(xyz1, xyz2)
    cost = match_cost(xyz1, xyz2, match)
    return cost, (xyz1, xyz2, match)


def _emd_bwd(res, g):
    xyz1, xyz2, match = res
    grad1, grad2 = _match_grads(xyz1, xyz2, match)
    return g[..., None, None] * grad1, g[..., None, None] * grad2


_emd_cost.defvjp(_emd_fwd, _emd_bwd)


def earth_mover_distance(xyz1, xyz2, transpose=False, backend="auto"):
    """Approx EMD cost per batch element, differentiable.

    API parity with PyTorchEMD/emd.py:24-45: accepts [n, 3]/[B, n, 3] (and
    [B, 3, n] with ``transpose=True``), returns cost [B]. ``backend`` selects
    'lax' (this file), 'pallas' (fused TPU kernel), or 'auto'.

    NOTE: the reference extension defaults ``transpose=True``
    (PyTorchEMD/emd.py:24) but every reference call site passes
    transpose=False, so this wrapper defaults False — pass it explicitly
    when porting code that relied on the extension's default.
    """
    if xyz1.ndim == 2:
        xyz1 = xyz1[None]
    if xyz2.ndim == 2:
        xyz2 = xyz2[None]
    if transpose:
        xyz1 = jnp.swapaxes(xyz1, -1, -2)
        xyz2 = jnp.swapaxes(xyz2, -1, -2)
    if backend not in ("auto", "pallas", "lax"):
        raise ValueError(f"unknown EMD backend {backend!r}: "
                         "expected 'auto', 'pallas' or 'lax'")
    if backend in ("auto", "pallas"):
        try:
            from .emd_pallas import emd_cost_pallas, pallas_supported
            if backend == "pallas" or pallas_supported():
                return emd_cost_pallas(xyz1, xyz2)
        except ImportError:
            if backend == "pallas":
                raise
    return _emd_cost(xyz1, xyz2)
