"""Two-level (tournament) lane arg-reductions for Pallas TPU kernels.

A plain ``jnp.argmin(d, axis=1)`` over a wide [rows, n] tile lowers to a
cross-lane reduction over all n lanes with index tracking — log2(n) shuffle
stages over every vreg of the tile. Inside the iterative kernels (FPS's
npoint-step max chain, the fused set-abstraction's k-step min chain) that
reduction runs every iteration and dominates kernel time (~60% measured,
PERFORMANCE.md headroom #2).

The tournament form splits the lane axis into G static chunks of L=n/G
lanes, takes the elementwise min/max across chunks while tracking which
chunk won (pure VPU elementwise ops, no shuffles), and finishes with ONE
narrow cross-lane arg-reduction over L lanes — G× fewer vregs in the
shuffle stages. The winning chunk id is then read out at the winning lane
with a one-hot sum.

Tie-breaking: the fused argmin/argmax picks the lowest *global* index;
the tournament picks the lowest (lane, chunk) pair — i.e. on an exact
cross-chunk value tie a different (equal-valued) element can win. For the
kernels here that is benign: ties on float point-cloud distances occur only
for duplicated points, whose coordinates/features are identical, so the
selected *values* are unchanged (see ops/fps_pallas.py, ops/sg_pallas.py).
"""

import jax.numpy as jnp
from jax import lax


def _tournament(v, largest, g_max=8):
    rows, n = v.shape
    # chunk so the final reduction is one 128-lane tile; fall back to the
    # plain reduction when the lane axis doesn't split cleanly
    g = min(g_max, n // 128)
    if g < 2 or n % g:
        arg = jnp.argmax(v, axis=1) if largest else jnp.argmin(v, axis=1)
        return arg.astype(jnp.int32)[:, None]
    L = n // g
    m = v[:, :L]
    gsel = jnp.zeros((rows, L), jnp.int32)
    for gi in range(1, g):
        chunk = v[:, gi * L:(gi + 1) * L]
        upd = (chunk > m) if largest else (chunk < m)
        m = jnp.where(upd, chunk, m)
        gsel = jnp.where(upd, gi, gsel)
    arg = jnp.argmax(m, axis=1) if largest else jnp.argmin(m, axis=1)
    lidx = arg.astype(jnp.int32)[:, None]                      # [rows, 1]
    lanes = lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    win_g = jnp.sum(jnp.where(lanes == lidx, gsel, 0), axis=1,
                    keepdims=True)                             # [rows, 1]
    return win_g * L + lidx


def tournament_argmin(v, g_max=8):
    """[rows, n] -> [rows, 1] int32 argmin along lanes (tournament)."""
    return _tournament(v, largest=False, g_max=g_max)


def tournament_argmax(v, g_max=8):
    """[rows, n] -> [rows, 1] int32 argmax along lanes (tournament)."""
    return _tournament(v, largest=True, g_max=g_max)
