"""Cluster-complement pose refinement for multi-piece assembly.

The pairwise net is weakest exactly where flat assembly needs it most:
two 1/K slivers at K >= 6 measure 25-30 deg off at p50 (PERFORMANCE.md
pairwise probe). But the same net is STRONGEST on the (fragment,
complement) presentation it trained on (r_mae ~2-3 deg on the test
distribution), and once an assembly is roughly right, each piece vs the
union of all OTHER posed pieces IS that presentation: the union is a
contiguous sub-cloud and the piece is its complement within the
assembled region (--frag_cuts covers the sub-fragment case).

This module measures, for every slot i in ONE fixed-shape jitted
program, the pairwise net on (masked-FPS union of the other posed
slots, posed slot i), yielding a per-piece absolute-pose correction
``corr_i`` (new pose = corr_i @ pose_i) plus its boundary-chamfer fit
score. ``refine_poses`` applies the corrections iteratively — a Jacobi
all-piece proposal with a worst-piece fallback, each accepted only on
strict improvement of the caller's verification metric — so the
refinement can never degrade the assembler's verified output.

Targets the dominant K >= 6 failure mode: solvers built on sliver-pair
measurements land NEAR the right assembly (K = 6 cd_p50 ~0.03 vs the
0.02 success bar) but pairwise evidence is too noisy to close the last
few degrees; the complement measurement is the in-distribution closer.
(Reference: no multi-piece code at all, README.md:14 — this whole
subsystem is beyond-reference capability.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import farthest_point_sample
from ..semath import se3
from .greedy import _pair_forward


@functools.partial(jax.jit, static_argnames=("model",))
def _complement_measure_jit(model, variables, stack, poses, active):
    """Measure every slot against the union of the OTHER posed slots.

    stack [K0, N, 3] original pieces, poses [K0, 4, 4] absolute poses,
    active [K0] bool. Returns (corr [K0, 4, 4], scores [K0]): corr_i
    maps POSED slot i onto the posed union-of-others frame (so the
    refined absolute pose is corr_i @ poses_i); scores are the pairs'
    predicted-boundary chamfer fits (+inf on inactive slots).

    One program: pose the stack, build per-slot leave-one-out masks over
    the flattened [K0*N] point set, masked-FPS each union back to N
    (same fused kernel the data pipeline uses), then one batched
    pairwise forward over the K0 (union, piece) pairs.
    """
    k0, n = stack.shape[0], stack.shape[1]
    posed = se3.transform_points(poses, stack)            # [K0, N, 3]
    pts = posed.reshape(-1, 3)                            # [K0*N, 3]
    slot_of = jnp.repeat(jnp.arange(k0), n)               # [K0*N]
    act = jnp.repeat(active, n)
    masks = act[None, :] & (slot_of[None, :] != jnp.arange(k0)[:, None])
    big = jnp.broadcast_to(pts[None], (k0, k0 * n, 3))
    start = jnp.argmax(masks, axis=-1).astype(jnp.int32)
    idx = farthest_point_sample(big, n, start_idx=start, valid_mask=masks)
    union = jnp.take_along_axis(big, idx[..., None], axis=1)  # [K0, N, 3]
    twists, scores, _, _ = _pair_forward(model, variables, union, posed)
    scores = jnp.where(active, scores, jnp.inf)
    return se3.exp(twists), scores


def complement_corrections(model, variables, stack, poses, active):
    """Host wrapper: one complement measurement round.

    ``poses`` is a length-k list of [4, 4] (padded internally to the
    slot count). Returns (corr [K0, 4, 4] np, scores [K0] np)."""
    k0 = stack.shape[0]
    eye = np.eye(4, dtype=np.float32)
    poses_full = jnp.asarray(
        np.stack(list(poses) + [eye] * (k0 - len(poses))))
    corr, scores = _complement_measure_jit(model, variables, stack,
                                           poses_full, active)
    return np.asarray(corr), np.asarray(scores)


def refine_poses(model, variables, stack, active, k, poses, verify_fn,
                 iters, v0=None, per0=None):
    """Iterative complement refinement of an assembled pose set.

    ``verify_fn(poses list) -> (v, per)``: the caller's verification
    metric (mean + per-piece attachment cost; lower is better) — the
    acceptance gate, so refinement composes with any assembler that can
    re-measure a posed hypothesis. Per iteration: one complement
    measurement, then (a) the Jacobi proposal — every piece corrected at
    once, re-gauged to piece 0 — and (b) the worst-piece-only proposal
    (by ``per``); the better of the two replaces the current poses only
    on STRICT improvement of v, else the loop stops.

    Returns (poses, v, per, improved).
    """
    poses = [np.asarray(p, np.float32) for p in poses]
    if v0 is None or per0 is None:
        v0, per0 = verify_fn(poses)
    improved = False
    for _ in range(iters):
        if k < 2:
            break
        corr, _ = complement_corrections(model, variables, stack, poses,
                                         active)
        # (a) Jacobi: correct every piece, restore the anchor gauge
        cand = [(corr[i] @ poses[i]).astype(np.float32) for i in range(k)]
        g0 = np.linalg.inv(cand[0]).astype(np.float32)
        cand = [(g0 @ p).astype(np.float32) for p in cand]
        v1, per1 = verify_fn(cand)
        best = (v1, cand, per1)
        # (b) worst piece only (anchor repairs re-gauge like (a))
        w = int(np.argmax(per0[:k]))
        cand2 = list(poses)
        cand2[w] = (corr[w] @ poses[w]).astype(np.float32)
        if w == 0:
            g0 = np.linalg.inv(cand2[0]).astype(np.float32)
            cand2 = [(g0 @ p).astype(np.float32) for p in cand2]
        v2, per2 = verify_fn(cand2)
        if v2 < best[0]:
            best = (v2, cand2, per2)
        if best[0] >= v0:
            break
        v0, poses, per0 = best
        improved = True
    return poses, v0, per0, improved
