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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INTERPRET = False   # run the Pallas kernel in interpret mode (CPU tests)


def pallas_supported():
    """Pallas TPU path available on this backend (or interpret mode)?"""
    return _INTERPRET or jax.default_backend() == "tpu"


def _levels():
    ls = [-(4.0 ** j) for j in range(7, -3, -1)]
    ls[-1] = 0.0
    return ls


def _emd_kernel(multiL, multiR, x1_ref, x2_ref, g1_ref, g2_ref,
                d_scratch, match_scratch):
    # x1_ref [1, n, 3], x2_ref [1, m, 3] (leading block axis); scratch [n, m]
    x1 = x1_ref[0]
    x2 = x2_ref[0]
    n, m = d_scratch.shape

    # squared distances once. Elementwise, NOT the matmul expansion: the
    # in-kernel MXU pass is bf16-precision, whose ~1e-1 absolute error can
    # push D negative and overflow exp(-4^7 * D). Elementwise f32 matches
    # the CUDA kernel's d = sum (x2-x1)^2 exactly (emd_kernel.cu:76).
    dx = x1[:, 0:1] - x2[:, 0:1].T                          # [n, m]
    dy = x1[:, 1:2] - x2[:, 1:2].T
    dz = x1[:, 2:3] - x2[:, 2:3].T
    d_scratch[:, :] = dx * dx + dy * dy + dz * dz
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
    mass1 = jnp.sum(match, axis=1, keepdims=True)           # [n, 1]
    mass2 = jnp.sum(match, axis=0, keepdims=True)           # [1, m]
    mx2 = jax.lax.dot_general(
        match, x2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [n, 3]
    mtx1 = jax.lax.dot_general(
        match, x1, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [m, 3]
    g1_ref[0] = 2.0 * (x1 * mass1 - mx2)
    g2_ref[0] = 2.0 * (x2 * mass2.T - mtx1)


@functools.partial(jax.jit, static_argnames=())
def _emd_forward_pallas(xyz1, xyz2):
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multiL = float(1 if n >= m else m // n)
    multiR = float(n // m if n >= m else 1)

    g1, g2 = pl.pallas_call(
        functools.partial(_emd_kernel, multiL, multiR),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, m, 3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, m), jnp.float32),
            pltpu.VMEM((n, m), jnp.float32),
        ],
        # D + match scratch (8 MB at n=m=1024) plus round intermediates
        # exceed the default 16 MB scoped-vmem budget; raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xyz1, xyz2)
    # cost recovered from the analytic grads: sum(g1.x1) + sum(g2.x2)
    #   = 2 sum match (x1-x2).(x1-x2) = 2 cost  (avoids a scalar output,
    # which Pallas TPU block rules disallow)
    cost = 0.5 * (jnp.sum(g1 * xyz1, axis=(1, 2))
                  + jnp.sum(g2 * xyz2, axis=(1, 2)))
    return cost, g1, g2


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
