"""Joint pose polish: refine ALL K absolute poses at once against the
predicted fracture-boundary contact graph.

Per-edge polish (``icp_iters`` / ``refine_iters``) adjusts one pair at a
time, so a near-circular fracture rim leaves each pair a curve-sliding
ambiguity (PERFORMANCE.md "failure diagnosis" #3 — the reference has no
multi-piece code at all, README.md:14). The JOINT form optimizes one
se(3) correction per piece over the WHOLE kept measurement graph: a
piece with two or more neighbors cannot slide along one rim without
paying on its other contacts, so the ambiguity that breaks pairwise ICP
is pinned by the graph itself.

Objective (fixed shapes, one compiled program per (K0, E0, M, iters)):

    L(xi) = sum_e w_e * [ mean chamfer( exp(xi_a) T_a^0 . bnd_a(e),
                                        exp(xi_b) T_b^0 . bnd_b(e) ) ]

with xi_anchor frozen at 0 (piece 0 keeps its frame exactly — the
assembler anchor convention), bnd_*(e) the pairwise net's predicted
top-128 boundary points of each side of edge e (piece frame), and w_e
the edge confidence (inverse fit score). Optimized with Adam under
``lax.scan`` — compile-stable, tiny (E0 x 128 x 128 distances), and
entirely on-device.

Callers opt in via ``polish_iters`` on sync_assemble / ensemble_assemble;
ensemble verifies the polished hypothesis by posed re-measurement and
keeps it only if it verifies better, so polish can never hurt there.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import chamfer_distances
from ..semath import se3


@functools.partial(jax.jit, static_argnames=("iters",))
def _polish_jit(poses, e_a, e_b, pa, pb, w, free, iters, lr):
    """poses [K0, 4, 4]; e_a/e_b [E0] int32 slot ids; pa/pb [E0, M, 3]
    piece-frame boundary points; w [E0] edge weights (0 = inactive
    edge); free [K0] 1.0 except the anchor (and inactive slots) at 0.0.
    Returns (refined poses [K0, 4, 4], loss trace [iters])."""
    k0 = poses.shape[0]
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    def loss(xi):
        T = se3._mm(se3.exp(xi * free[:, None]), poses)      # [K0, 4, 4]
        A = se3.transform_points(T[e_a], pa)                 # [E0, M, 3]
        B = se3.transform_points(T[e_b], pb)
        d1, d2 = chamfer_distances(A, B)
        per = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)  # [E0]
        return jnp.sum(w * per) / wsum

    opt = optax.adam(lr)
    xi0 = jnp.zeros((k0, 6), jnp.float32)

    def step(carry, _):
        xi, os = carry
        val, g = jax.value_and_grad(loss)(xi)
        upd, os = opt.update(g, os, xi)
        return (xi + upd, os), val

    (xi, _), trace = jax.lax.scan(step, (xi0, opt.init(xi0)), None,
                                  length=iters)
    return se3._mm(se3.exp(xi * free[:, None]), poses), trace


def polish_poses(stack_np, poses, kept, top_f_np, top_m_np,
                 anchor=0, iters=100, lr=5e-3, m=128):
    """Host-side wrapper: build the fixed-shape edge arrays from an
    ``_edge_selection`` result and run the jitted joint optimization.

    ``stack_np`` [K0, N, 3] piece-frame clouds; ``poses`` list/array of K
    absolute poses (anchor frame); ``kept`` {(i, j): (pair_pos, inv,
    score)} from assembly.sync._edge_selection — edge arrays are padded
    to E0 = K0*(K0-1)//2 so one compiled program serves every K <= K0;
    ``top_f_np``/``top_m_np`` [P, m] predicted-boundary indices of the
    scoring forward (fixed slot / moved slot of each ordered pair).

    Returns ``[K, 4, 4]`` refined poses (anchor pose bit-unchanged).
    """
    k0 = stack_np.shape[0]
    k = len(poses)
    e0 = k0 * (k0 - 1) // 2
    e_a = np.zeros(e0, np.int32)
    e_b = np.zeros(e0, np.int32)
    pa = np.zeros((e0, m, 3), np.float32)
    pb = np.zeros((e0, m, 3), np.float32)
    w = np.zeros(e0, np.float32)
    for t, ((i, j), (p_sel, inv, s)) in enumerate(sorted(kept.items())):
        # the net saw (fixed=i_sl, moved=j_sl); top_f indexes the fixed
        # slot's points, top_m the moved slot's (piece-frame rows either
        # way — rigid posing never reorders rows)
        i_sl, j_sl = (j, i) if inv else (i, j)
        e_a[t], e_b[t] = i_sl, j_sl
        pa[t] = stack_np[i_sl][top_f_np[p_sel]]
        pb[t] = stack_np[j_sl][top_m_np[p_sel]]
        w[t] = 1.0 / (float(s) + 1e-3)
    free = np.ones(k0, np.float32)
    free[anchor] = 0.0
    free[k:] = 0.0
    poses_full = np.stack(
        list(poses) + [np.eye(4, dtype=np.float32)] * (k0 - k))
    refined, _ = _polish_jit(
        jnp.asarray(poses_full), jnp.asarray(e_a), jnp.asarray(e_b),
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(w),
        jnp.asarray(free), iters, lr)
    out = np.array(refined)[:k]
    out[anchor] = poses[anchor]            # exact, not just converged-to
    return [out[i].astype(np.float32) for i in range(k)]
