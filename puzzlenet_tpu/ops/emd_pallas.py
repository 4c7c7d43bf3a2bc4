"""Fused Pallas approx-EMD kernel (TPU fast path).

One grid step per batch pair. The [n, m] squared-distance matrix is computed
once (MXU) into VMEM and all 10 annealing rounds run against it in-core; the
running match matrix also stays in VMEM. The forward emits cost AND the
unscaled analytic gradients (emd_kernel.cu:287-355 formulas as two MXU
matmuls), so backward is a pure scale and the [B, m, n] match matrix never
touches HBM — the CUDA extension writes it out (4 MB/pair) and reads it back
in three separate kernels.

Numerics follow ops/emd.py (the lax reference implementation of
emd_kernel.cu:26-158) exactly: same temperature ladder, same epsilons, same
clamping.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported():
    return jax.default_backend() == "tpu"


def _levels():
    ls = [-(4.0 ** j) for j in range(7, -3, -1)]
    ls[-1] = 0.0
    return ls


def _emd_kernel(multiL, multiR, x1_ref, x2_ref, cost_ref, g1_ref, g2_ref,
                d_scratch, match_scratch):
    # x1_ref [1, n, 3], x2_ref [1, m, 3] (leading block axis); scratch [n, m]
    x1 = x1_ref[0]
    x2 = x2_ref[0]
    n, m = d_scratch.shape

    # squared distances once, on the MXU
    cross = jax.lax.dot_general(
        x1, x2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n, m]
    s1 = jnp.sum(x1 * x1, axis=1, keepdims=True)            # [n, 1]
    s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)            # [m, 1]
    d_scratch[:, :] = s1 + s2.T - 2.0 * cross
    match_scratch[:, :] = jnp.zeros((n, m), jnp.float32)

    remainL = jnp.full((n, 1), multiL, jnp.float32)
    remainR = jnp.full((1, m), multiR, jnp.float32)

    for level in _levels():
        D = d_scratch[:, :]
        K = jnp.exp(level * D)                              # [n, m]
        suml = 1e-9 + jnp.sum(K * remainR, axis=1, keepdims=True)   # [n, 1]
        ratioL = remainL / suml
        sumr = jnp.sum(K * ratioL, axis=0, keepdims=True) * remainR  # [1, m]
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        W = K * ratioL * ratioR                             # [n, m]
        match_scratch[:, :] = match_scratch[:, :] + W
        remainL = jnp.maximum(0.0, remainL - jnp.sum(W, axis=1,
                                                     keepdims=True))

    match = match_scratch[:, :]
    cost_ref[0, 0] = jnp.sum(d_scratch[:, :] * match)
    mass1 = jnp.sum(match, axis=1, keepdims=True)           # [n, 1]
    mass2 = jnp.sum(match, axis=0, keepdims=True)           # [1, m]
    mx2 = jax.lax.dot_general(
        match, x2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n, 3]
    mtx1 = jax.lax.dot_general(
        match, x1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [m, 3]
    g1_ref[0] = 2.0 * (x1 * mass1 - mx2)
    g2_ref[0] = 2.0 * (x2 * mass2.T - mtx1)


@functools.partial(jax.jit, static_argnames=())
def _emd_forward_pallas(xyz1, xyz2):
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multiL = float(1 if n >= m else m // n)
    multiR = float(n // m if n >= m else 1)

    cost, g1, g2 = pl.pallas_call(
        functools.partial(_emd_kernel, multiL, multiR),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, m, 3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
        ],
    )(xyz1, xyz2)
    return cost[:, 0], g1, g2


@jax.custom_vjp
def emd_cost_pallas(xyz1, xyz2):
    cost, _, _ = _emd_forward_pallas(xyz1, xyz2)
    return cost


def _fwd(xyz1, xyz2):
    cost, g1, g2 = _emd_forward_pallas(xyz1, xyz2)
    return cost, (g1, g2)


def _bwd(res, g):
    g1, g2 = res
    return g[..., None, None] * g1, g[..., None, None] * g2


emd_cost_pallas.defvjp(_fwd, _bwd)
