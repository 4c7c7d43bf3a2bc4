"""Pose-graph (spanning-tree) multi-piece assembly.

The greedy loop (assembly/greedy.py) re-runs the pairwise net on MERGED
clouds — inputs the net never saw in training (it trains on single-cut
fragment pairs, dataset.py:1172-1179), so its predictions degrade as the
assembly grows. The pose-graph form never does that: it scores ALL
K*(K-1) ordered ORIGINAL-fragment pairs in one batched forward (every
input in-distribution), builds the minimum-spanning-tree of the pair
fit scores, and composes the predicted rigid motions along the tree —
each piece is placed by pure pose composition, no re-merging, no
re-FPS-ing, no second-generation network inputs.

The reference has no multi-piece code at all (its README.md:14 describes
the behavior); both assemblers here are beyond-reference capability.

TPU shape discipline matches greedy: ONE compiled scoring program over a
fixed padded pair axis (inactive pairs masked to +inf on device) serves
every K <= pad_to; composition and MST run on host (K <= 8 — trivial);
one more fixed-shape jit does the final union + masked FPS.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import farthest_point_sample
from ..semath import se3
from .greedy import (AssemblyResult, _icp_refine_jit, _pair_forward,
                     _prepare_slots, _refine_jit)


@functools.partial(jax.jit, static_argnames=("model",))
def _score_all_jit(model, variables, stack, active, idx_i, idx_j):
    """Score every ordered slot pair in one batched forward. Returns
    (mats [P, 4, 4], scores [P], top_f [P, 128], top_m [P, 128]);
    inactive pairs score +inf."""
    twists, scores, top_f, top_m = _pair_forward(model, variables,
                                                 stack[idx_i], stack[idx_j])
    valid = active[idx_i] & active[idx_j]
    scores = jnp.where(valid, scores, jnp.inf)
    return se3.exp(twists), scores, top_f, top_m


@functools.partial(jax.jit, static_argnames=("model",))
def _refine_all_jit(model, variables, stack, active, idx_i, idx_j, mats):
    """One batched measurement-refinement round over EVERY ordered slot
    pair: apply each pair's current measurement to its moved slot, re-run
    the pairwise net on the (fixed, aligned-moved) pairs, and compose the
    corrections. Returns (composed mats [P, 4, 4], their fit scores [P],
    top_f [P, 128], top_m [P, 128]).

    This is the inference-side answer to the relative-pose-magnitude
    train/serve gap (PERFORMANCE.md "pairwise probe"): scattered fragment
    pairs compose two mag-0.8 twists (relative norm up to ~1.6) while
    training twists stay within 0.8, so one-shot measurements run 18-28
    deg off at K >= 4 — but after that first (degraded) measurement the
    residual pose IS inside the trained range, and with --random training
    (near-identity in-distribution) the second look measures it
    accurately. One extra forward refines ALL K*(K-1) measurements at
    once through one fixed-shape program; retraining with --mag 1.7
    (fcrg2) attacked the same gap at the data level and lost more
    canonical accuracy than it bought back.

    top_m indices address the MOVED slot's point order, which the rigid
    alignment preserves — they remain valid indices into the original
    stack[idx_j]. Scores are the composed measurements' boundary-chamfer
    fits (computed inside _pair_forward on the aligned pair), i.e.
    exactly the quantity edge selection should rank."""
    fpc = stack[idx_i]
    moved = se3.transform_points(mats, stack[idx_j])
    twists, scores, top_f, top_m = _pair_forward(model, variables,
                                                 fpc, moved)
    valid = active[idx_i] & active[idx_j]
    scores = jnp.where(valid, scores, jnp.inf)
    return se3._mm(se3.exp(twists), mats), scores, top_f, top_m


@functools.partial(jax.jit, static_argnames=("model",))
def _score_all_gauged_jit(model, variables, stack, active, idx_i, idx_j,
                          gtwists, best):
    """Score every ordered slot pair under a per-pair rigid gauge.

    ``gtwists`` [P, 6]: both pieces of pair p are moved by the gauge
    g = exp(gtwists[p]) before the forward, and the measurement is
    pulled back to the ungauged frame (M = g^-1 M' g). The fit score — boundary chamfer of
    the ALIGNED pair — is computed on rigidly-moved copies of the same
    geometry, so scores are comparable across gauges: min-over-gauges
    selection is well-defined. (The pairwise net is not rigid-invariant;
    --global_pose training randomizes over presentation, which makes
    presentation a zero-mean noise source the fit score can select
    over.)
    Takes the current best (mats0, scores0, tf0, tm0) and returns the
    per-pair min-score merge in ONE dispatch."""
    mats0, scores0, tf0, tm0 = best
    gauges = se3.exp(gtwists)
    fpc = se3.transform_points(gauges, stack[idx_i])
    mrpc = se3.transform_points(gauges, stack[idx_j])
    twists, scores, top_f, top_m = _pair_forward(model, variables,
                                                 fpc, mrpc)
    valid = active[idx_i] & active[idx_j]
    scores = jnp.where(valid, scores, jnp.inf)
    mats = se3._mm(se3.inverse(gauges),
                   se3._mm(se3.exp(twists), gauges))
    better = scores < scores0
    return (jnp.where(better[:, None, None], mats, mats0),
            jnp.minimum(scores, scores0),
            jnp.where(better[:, None], top_f, tf0),
            jnp.where(better[:, None], top_m, tm0))


def measure_all_pairs(model, variables, stack, active, idx_i, idx_j,
                      measure_refine=0, tta_gauges=0, tta_mag=0.8,
                      tta_seed=0):
    """The shared measurement front-end of the pose-graph assemblers:
    one batched scoring forward + ``tta_gauges`` gauge-augmented
    re-measurements (keep the best fit score per pair — see
    _score_all_gauged_jit) + ``measure_refine`` batched composed-
    refinement rounds (docstring above). Returns the final
    (mats, scores, top_f, top_m) device values."""
    mats, scores, top_f, top_m = _score_all_jit(
        model, variables, stack, active, idx_i, idx_j)
    if tta_gauges:
        rng = np.random.default_rng(tta_seed)
        p = idx_i.shape[0]
        for _ in range(tta_gauges):
            x = rng.standard_normal((p, 6)).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            amp = (tta_mag * rng.random((p, 1))).astype(np.float32)
            g = jnp.asarray(x * amp)
            mats, scores, top_f, top_m = _score_all_gauged_jit(
                model, variables, stack, active, idx_i, idx_j, g,
                (mats, scores, top_f, top_m))
    for _ in range(measure_refine):
        mats, scores, top_f, top_m = _refine_all_jit(
            model, variables, stack, active, idx_i, idx_j, mats)
    return mats, scores, top_f, top_m


@jax.jit
def _union_fps_jit(stack, poses, active):
    """Pose every slot, take the masked FPS of the union back to N.

    stack [K0, N, 3], poses [K0, 4, 4], active [K0] -> [N, 3]."""
    posed = se3.transform_points(poses, stack)               # [K0, N, 3]
    pts = posed.reshape(-1, 3)
    mask = jnp.repeat(active, stack.shape[1])
    sel = farthest_point_sample(pts[None], stack.shape[1],
                                valid_mask=mask[None])[0]
    return pts[sel]


def _project_so3(m):
    """Nearest rotation (Frobenius) to a 3x3 matrix via SVD, det +1."""
    u, _, vt = np.linalg.svd(m)
    r = u @ vt
    if np.linalg.det(r) < 0:
        r = (u * np.array([1.0, 1.0, -1.0])) @ vt
    return r


def symmetrize_measurements(mats_np, scores_np, pos, k, dir_fuse=20.0,
                            cons_w=0.0):
    """Fuse each unordered pair's two directional measurements in place
    of the direction coin flip — at zero extra forwards.

    For pair (i, j) the net is run both ways: ``m_ij`` maps piece j into
    i's frame, ``m_ji`` maps i into j's. A perfect net gives
    ``m_ij = inv(m_ji)``, so the composition residual
    ``ang(m_ij @ m_ji)`` is a free reliability signal. Where the two
    directions agree within ``dir_fuse`` degrees, both are replaced by
    their chordal mean (SVD-projected rotation average, arithmetic-mean
    translation) and both directions get the better fit score: two
    same-target measurements with independent errors average to a lower
    error than either, and the direction CHOICE (which the probe data
    shows trails the oracle direction by 3-6 deg at K >= 6,
    PERFORMANCE.md) stops mattering for fused pairs. Inconsistent pairs
    pass through untouched — there the disagreement itself says at least
    one direction is bad, and the fit score keeps doing the choosing.

    ``cons_w`` > 0 additionally adds ``cons_w * (rotation residual rad +
    translation residual)`` to BOTH directions' scores, so edge
    selection (MST / keep_frac) ranks inconsistent pairs below
    consistent ones even when a bad measurement happens to land a lucky
    boundary-chamfer fit. (Fit scores are ~1e-3..1e-1; residuals are
    O(0.1-1), so cons_w ~1e-2 prices a radian of inconsistency like a
    bad fit.)

    Returns new ``(mats, scores, cons)`` arrays (inputs untouched);
    ``cons[p]`` is the unordered pair's composition residual (rad +
    units), +inf for inactive pairs. Padded/inactive pairs (non-finite
    score in either direction) pass through."""
    mats = np.array(mats_np, np.float32, copy=True)
    scores = np.array(scores_np, np.float32, copy=True)
    cons = np.full(scores.shape, np.inf, np.float32)
    gate = np.deg2rad(dir_fuse)
    for i in range(k):
        for j in range(i + 1, k):
            p, q = pos[(i, j)], pos[(j, i)]
            if not (np.isfinite(scores[p]) and np.isfinite(scores[q])):
                continue
            comp = mats_np[p] @ mats_np[q]
            c = (np.trace(comp[:3, :3]) - 1.0) / 2.0
            ang = float(np.arccos(np.clip(c, -1.0, 1.0)))
            tn = float(np.linalg.norm(comp[:3, 3]))
            cons[p] = cons[q] = ang + tn
            if dir_fuse and ang <= gate:
                alt = np.linalg.inv(mats_np[q]).astype(np.float32)
                fused = np.eye(4, dtype=np.float32)
                fused[:3, :3] = _project_so3(
                    0.5 * (mats_np[p][:3, :3] + alt[:3, :3]))
                fused[:3, 3] = 0.5 * (mats_np[p][:3, 3] + alt[:3, 3])
                mats[p] = fused
                mats[q] = np.linalg.inv(fused).astype(np.float32)
                scores[p] = scores[q] = min(scores[p], scores[q])
            if cons_w:
                pen = np.float32(cons_w * (ang + tn))
                scores[p] += pen
                scores[q] += pen
    return mats, scores, cons


def pair_weight(scores_np, pos):
    """Undirected edge weight = the better-scoring direction. ONE
    definition shared by spanning/sync/ensemble (a drifted re-definition
    would silently diverge the assemblers)."""
    def weight(i, j):
        return min(scores_np[pos[(i, j)]], scores_np[pos[(j, i)]])
    return weight


def _mst(k, weight):
    """Kruskal over the complete graph on ``k`` nodes; ``weight(i, j)``
    for i < j. Returns the k-1 tree edges [(i, j), ...]."""
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = sorted(((weight(i, j), i, j)
                    for i in range(k) for j in range(i + 1, k)))
    tree = []
    for _, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            tree.append((i, j))
            if len(tree) == k - 1:
                break
    return tree


def spanning_assemble(model, variables, pieces, num_points=None,
                      pad_to=None, refine_iters=0, icp_iters=0,
                      measure_refine=0, tta_gauges=0, tta_mag=0.8,
                      dir_fuse=0.0, cons_w=0.0):
    """Assemble K fragments by pose-graph composition over the pair-score
    minimum spanning tree (module docstring). Same contract as
    ``greedy_assemble``: fragments [K, N, 3] (or list of [N, 3]) sharing
    N; result expressed in the FIRST piece's frame (the anchor).

    ``pad_to``: fixed slot count — one compiled scoring program serves
    every K <= pad_to. ``measure_refine``: batched composed-refinement
    rounds of ALL pair measurements before the MST is built (one extra
    fixed-shape forward per round, see _refine_all_jit) — unlike
    ``refine_iters`` it also improves the edge/direction SELECTION, not
    just the kept edges' values. ``refine_iters``: per-tree-edge extra
    forwards of the pairwise net on the aligned pair (in-distribution by
    construction). ``icp_iters``: per-edge boundary-ICP polish
    (assembly/icp.py; hurts on rotationally-near-symmetric fracture rims
    — see PERFORMANCE.md — so it is off by default).

    ``dir_fuse``/``cons_w``: direction-consistency fusion of the pair
    measurements (see :func:`symmetrize_measurements`) — requires the
    bulk measurement path (no per-edge refine_iters/icp_iters).

    Returns ``AssemblyResult`` with ``merge_order`` = the tree edges
    (parent, child), ``transforms``/``scores`` per edge, and
    ``piece_transforms`` the composed per-piece poses.
    """
    if (dir_fuse or cons_w) and (refine_iters or icp_iters):
        raise ValueError("dir_fuse/cons_w fuse the bulk measurements; "
                         "they do not compose with per-edge "
                         "refine_iters/icp_iters")
    stack, k, pairs, idx_i, idx_j, active = _prepare_slots(
        pieces, num_points, pad_to)
    k0 = stack.shape[0]
    pos = {ij: p for p, ij in enumerate(pairs)}

    mats, scores, top_f, top_m = measure_all_pairs(
        model, variables, stack, active, idx_i, idx_j, measure_refine,
        tta_gauges=tta_gauges, tta_mag=tta_mag)
    scores_np = np.asarray(scores)
    # bulk transfer on the default path (per-edge device slices each pay
    # a tunnel round trip); refinement keeps the device-resident mats
    mats_np_all = (np.asarray(mats)
                   if not (refine_iters or icp_iters) else None)
    if dir_fuse or cons_w:
        mats_np_all, scores_np, _ = symmetrize_measurements(
            mats_np_all, scores_np, pos, k, dir_fuse, cons_w)

    tree = _mst(k, pair_weight(scores_np, pos))

    # BFS-compose from the anchor (piece 0): the anchor frame falls out
    # of the composition with no correction step
    adj = {i: [] for i in range(k)}
    for i, j in tree:
        adj[i].append(j)
        adj[j].append(i)
    poses = [None] * k
    poses[0] = np.eye(4, dtype=np.float32)
    order, edge_mats, edge_scores = [], [], []
    frontier = [0]
    while frontier:
        parentn = frontier.pop()
        for child in adj[parentn]:
            if poses[child] is not None:
                continue
            # direction: prefer the ordering with the lower fit score;
            # the net's mat maps its moved (second) piece into its fixed
            # (first) piece's frame
            fwd_p = pos[(parentn, child)]       # fixed=parent, moved=child
            rev_p = pos[(child, parentn)]
            if scores_np[fwd_p] <= scores_np[rev_p]:
                p_sel, i_sl, j_sl, invert = fwd_p, parentn, child, False
            else:
                p_sel, i_sl, j_sl, invert = rev_p, child, parentn, True
            if mats_np_all is not None:
                m = mats_np_all[p_sel]
            else:
                mat = mats[p_sel]
                for _ in range(refine_iters):
                    mat = _refine_jit(model, variables, stack, i_sl, j_sl,
                                      mat)
                if icp_iters:
                    mat = _icp_refine_jit(stack, i_sl, j_sl, top_f[p_sel],
                                          top_m[p_sel], mat, icp_iters)
                m = np.asarray(mat)
            if invert:
                m = np.linalg.inv(m).astype(np.float32)
            poses[child] = (poses[parentn] @ m).astype(np.float32)
            order.append((parentn, child))
            edge_mats.append(m)
            edge_scores.append(float(scores_np[p_sel]))
            frontier.append(child)

    poses_full = np.stack(poses + [np.eye(4, dtype=np.float32)] * (k0 - k))
    assembled = np.asarray(_union_fps_jit(stack, jnp.asarray(poses_full),
                                          active))
    return AssemblyResult(assembled, order, edge_mats, edge_scores,
                          [np.asarray(t) for t in poses])
