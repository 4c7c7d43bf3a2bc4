"""Iterative greedy multi-piece reassembly.

The reference README (README.md:14) and paper Fig. 1 describe multi-piece
reassembly by iterating the pairwise network greedily — **no code for this
exists in the reference repo** (SURVEY.md §0); this module implements the
described behavior, TPU-style, with COMPILE-STABLE shapes:

the piece stack lives in a fixed [K0, N, 3] device array with an active
mask; every round scores ALL K0*(K0-1) ordered slot pairs in ONE batched
jitted forward (inactive pairs are masked to +inf on device), and the merge
(transform + concat + FPS back to N + slot update) is a second fixed-shape
jit. Two compilations serve the entire K0 -> 1 loop — the pair axis never
changes length, so no round ever recompiles (on a v5e a recompile costs
~1-2 min vs ~10 ms of masked-pair compute).

Pair score = symmetric chamfer between the two predicted top-128 boundary
sets after applying the predicted transform (the quantity the reference's
test_step evaluates per pair, model5_b.py:1349-1360) — lower is better.
"""

import functools
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import chamfer_distances, farthest_point_sample, index_points
from ..semath import se3
from .icp import icp_align


class AssemblyResult(NamedTuple):
    assembled: np.ndarray        # [num_points, 3] merged cloud, in the
                                 # FIRST input piece's frame (see below)
    merge_order: list            # [(fixed_idx, moved_idx), ...] per round
    transforms: list             # [4, 4] applied to the moved piece per round
    scores: list                 # winning pair score per round
    piece_transforms: list = ()  # [4, 4] per input piece: its pose in the
                                 # assembled frame (identity for piece 0)


def _pair_tables(k0):
    """The constant ordered-pair tables for a k0-slot stack: (pairs list,
    idx_i [P] int32, idx_j [P] int32) with P = k0*(k0-1)."""
    pairs = [(i, j) for i, j in itertools.product(range(k0), range(k0))
             if i != j]
    idx_i = jnp.asarray([i for i, _ in pairs], jnp.int32)
    idx_j = jnp.asarray([j for _, j in pairs], jnp.int32)
    return pairs, idx_i, idx_j


def _prepare_slots(pieces, num_points, pad_to):
    """Shared assembler preamble: stack the pieces into a [K0, N, 3]
    fixed-slot device array (padded with inactive dummies up to
    ``pad_to``), build the constant ordered-pair tables, and the active
    mask. Returns (stack, k, pairs, idx_i, idx_j, active)."""
    stack = jnp.stack([jnp.asarray(p, jnp.float32) for p in pieces])
    k, n = stack.shape[0], stack.shape[1]
    if num_points is not None and num_points != n:
        raise ValueError(f"pieces have {n} points, expected {num_points}")
    k0 = max(k, pad_to or 0)
    if k0 > k:
        stack = jnp.concatenate(
            [stack, jnp.zeros((k0 - k, n, 3), jnp.float32)])
    pairs, idx_i, idx_j = _pair_tables(k0)
    active = jnp.arange(k0) < k
    return stack, k, pairs, idx_i, idx_j, active


def _pair_forward(model, variables, fpc, mrpc):
    """Batched pairwise net + boundary extraction + fit score.

    fpc, mrpc: [P, N, 3] candidate pairs. Returns (twist [P, 6],
    score [P], top_f [P, 128], top_m [P, 128] predicted-boundary
    indices).
    """
    out = model.apply(variables, fpc, mrpc, train=False)
    mat = se3.exp(out.twist)

    lf = jnp.swapaxes(out.fpcb_logits, 1, 2)
    lm = jnp.swapaxes(out.mrpcb_logits, 1, 2)
    _, top_f = lax.top_k(lf[..., 1] - lf[..., 0], 128)
    _, top_m = lax.top_k(lm[..., 1] - lm[..., 0], 128)
    bnd_f = index_points(fpc, top_f)                       # [P, 128, 3]
    bnd_m = se3.transform_points(mat, index_points(mrpc, top_m))
    d1, d2 = chamfer_distances(bnd_f, bnd_m)
    score = jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)  # [P]
    return out.twist, score, top_f, top_m


_pair_forward_jit = functools.partial(
    jax.jit, static_argnames=("model",))(_pair_forward)


@functools.partial(jax.jit, static_argnames=("model",))
def _round_jit(model, variables, stack, active, idx_i, idx_j, cluster):
    """One greedy round over the fixed slot-pair axis.

    stack [K0, N, 3], active [K0] bool, idx_i/idx_j [P] int32 (the constant
    ordered-pair tables), cluster int32 (accretion constraint: when >= 0
    only pairs involving that slot are candidates; -1 = unconstrained).
    Returns (best pair position, its twist, its score, its
    predicted-boundary index sets) — all device values; inactive pairs
    score +inf. ``cluster`` is traced, so one compilation serves both
    modes and every round.
    """
    twists, scores, top_f, top_m = _pair_forward(model, variables,
                                                 stack[idx_i], stack[idx_j])
    valid = active[idx_i] & active[idx_j]
    valid &= (cluster < 0) | (idx_i == cluster) | (idx_j == cluster)
    scores = jnp.where(valid, scores, jnp.inf)
    best = jnp.argmin(scores)
    return best, twists[best], scores[best], top_f[best], top_m[best]


@functools.partial(jax.jit, static_argnames=("model",))
def _refine_jit(model, variables, stack, i, j, mat):
    """One pose-refinement iteration on the winning pair: re-run the
    pairwise net on (fixed piece, currently-aligned moved piece) and
    compose the correction (beyond-reference; the single-shot net leaves
    a residual that a second look at the almost-aligned pair removes)."""
    fpc = stack[i][None]
    moved = se3.transform_points(mat[None], stack[j][None])
    out = model.apply(variables, fpc, moved, train=False)
    return se3._mm(se3.exp(out.twist)[0], mat)


@functools.partial(jax.jit, static_argnames=("iters",))
def _icp_refine_jit(stack, i, j, top_f, top_m, mat, iters):
    """Boundary-ICP pose polish on the winning pair: rigid ICP between the
    two predicted top-128 fracture-boundary sets (the only regions of the
    two pieces that actually overlap — see assembly/icp.py), composed onto
    the network pose. Fixed shapes; one compilation per ``iters``."""
    bnd_f = stack[i][top_f]                                  # [128, 3]
    bnd_m = se3.transform_points(mat[None], stack[j][top_m][None])[0]
    corr = icp_align(bnd_m, bnd_f, iters=iters)
    return se3._mm(corr, mat)


@jax.jit
def _merge_jit(stack, active, i, j, mat):
    """Merge slot j onto slot i: transform by ``mat``, concatenate,
    FPS back to N (static 2N -> N shapes), write into slot i, deactivate
    slot j. i/j are traced scalars so one compilation serves every round.
    """
    moved = se3.transform_points(mat[None], stack[j][None])[0]
    merged = jnp.concatenate([stack[i], moved], axis=0)    # [2N, 3]
    sel = farthest_point_sample(merged[None], stack.shape[1])[0]
    stack = stack.at[i].set(merged[sel])
    active = active.at[j].set(False)
    return stack, active, mat


def score_pairs(model, variables, pieces):
    """Score all ordered pairs of a piece stack [K, N, 3] in one forward.

    Returns (pairs list [(i, j)], twists [P, 6], scores [P]).
    """
    k = len(pieces)
    pairs = [(i, j) for i, j in itertools.product(range(k), range(k))
             if i != j]
    fpc = jnp.stack([pieces[i] for i, _ in pairs])
    mrpc = jnp.stack([pieces[j] for _, j in pairs])
    twists, scores, _, _ = _pair_forward_jit(model, variables, fpc, mrpc)
    return pairs, twists, scores


def greedy_assemble(model, variables, pieces, num_points=None,
                    pad_to=None, refine_iters=0, icp_iters=0, grow=False):
    """Assemble K fragments ([K, N, 3] array or list of [N, 3]) into one
    cloud. All K pieces must share N (``num_points``, inferred when None);
    per round the moved piece of the best pair is rigidly mapped onto the
    fixed piece's frame, merged, and FPS'd back to N. The candidate-pair
    axis stays K0*(K0-1) for every round (inactive pairs masked on device),
    so the whole loop costs exactly two jit compilations.

    ``pad_to``: pad the slot stack to this many slots (inactive dummies) so
    ONE compiled program serves every K <= pad_to — e.g. pad_to=8 compiles
    once and then assembles any 3..8-piece problem with zero recompiles
    (the tools/assembly_bench.py protocol).

    ``refine_iters``: extra pose-refinement forwards per merge — each
    re-runs the pairwise net on the already-aligned winning pair and
    composes the correction (fixed-shape, one additional compiled
    program total).

    ``icp_iters``: boundary-ICP iterations per merge — rigid ICP between
    the winning pair's predicted fracture-boundary sets, composed after
    the network pose (assembly/icp.py; cheap [128, 128] geometry, no
    extra network forwards).

    ``grow``: accretion mode — after the first (globally best) merge,
    only pairs involving the growing cluster are candidates. Avoids
    irreversible sliver-on-sliver merges at K >= 4: cluster-vs-piece
    pairs (one large piece, one fragment, union a sub-region of the
    cloud) are much closer to the --frag_cuts training distribution than
    two 1/K slivers. Same two compiled programs (the constraint is a
    traced scalar).

    The returned cloud (and ``piece_transforms``) are expressed in the
    FIRST input piece's frame — piece 0 is the anchor, matching
    ``scatter_pieces`` and making chamfer-to-original evaluation
    well-defined regardless of which slot the greedy chain happens to
    root at.
    """
    stack, k, pairs, idx_i, idx_j, active = _prepare_slots(
        pieces, num_points, pad_to)

    merge_order, transforms, win_scores = [], [], []
    # per ORIGINAL piece: current slot + accumulated pose in the final
    # cloud's frame. Greedy roots the assembly at an arbitrary surviving
    # slot; re-expressing through piece 0's accumulated pose puts the
    # result in the first piece's frame EXACTLY (pure composition, no
    # estimation) — the frame the anchor convention (scatter_pieces) and
    # any chamfer-to-original evaluation expect.
    piece_slot = list(range(k))
    piece_pose = [np.eye(4, dtype=np.float32) for _ in range(k)]
    cluster = jnp.int32(-1)
    for _ in range(k - 1):
        best, twist, score, top_f, top_m = _round_jit(
            model, variables, stack, active, idx_i, idx_j, cluster)
        i, j = pairs[int(best)]
        mat = se3.exp(twist[None])[0]
        for _ in range(refine_iters):
            mat = _refine_jit(model, variables, stack, i, j, mat)
        if icp_iters:
            mat = _icp_refine_jit(stack, i, j, top_f, top_m, mat,
                                  icp_iters)
        stack, active, mat = _merge_jit(stack, active, i, j, mat)
        if grow:
            cluster = jnp.int32(i)
        merge_order.append((i, j))
        mat_np = np.asarray(mat)
        transforms.append(mat_np)
        win_scores.append(float(score))
        for p in range(k):
            if piece_slot[p] == j:
                piece_pose[p] = mat_np @ piece_pose[p]
                piece_slot[p] = i

    final = int(np.argmax(np.asarray(active)))
    anchor_inv = np.linalg.inv(piece_pose[0])
    assembled = np.asarray(stack[final])
    assembled = assembled @ anchor_inv[:3, :3].T + anchor_inv[:3, 3]
    piece_pose = [np.asarray(anchor_inv @ t, np.float32)
                  for t in piece_pose]
    return AssemblyResult(assembled.astype(np.float32), merge_order,
                          transforms, win_scores, piece_pose)
