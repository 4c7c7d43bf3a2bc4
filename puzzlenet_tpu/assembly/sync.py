"""Global pose synchronization for multi-piece assembly.

Third assembler (after greedy re-merging and the MST pose-graph): use
EVERY reliable pairwise measurement at once. The spanning tree composes
exactly K-1 of the K*(K-1) predictions, so one bad edge corrupts a whole
subtree; synchronization solves for the K absolute poses that best agree
with the full weighted measurement graph — the redundancy averages out
per-edge error (classic rotation averaging / pose-graph optimization,
here closed-form since K <= ~8):

* rotations: spectral relative-rotation synchronization — leading three
  eigenvectors of the score-weighted block matrix of measured R_ij,
  projected back to SO(3) per piece (Arie-Nachimson & Singer form);
* translations: weighted linear least squares of
  R_i t_ij + t_i = t_j given the synchronized rotations;
* gauge fixed at piece 0 (the anchor convention).

Host numpy solves (3K x 3K eig, 3K x 3K LS — microseconds); the one
device program is the same batched pair-scoring forward the other
assemblers share (greedy._pair_forward), so pad_to compile-stability
carries over unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..semath import se3
from .greedy import AssemblyResult


@jax.jit
def _pose_stack_jit(stack, poses):
    """Transform every slot by its current absolute pose estimate (the
    tiny first half of a sync_iters re-measurement; the scoring half
    reuses spanning._score_all_jit's already-compiled program — a
    separate fused program here would pay a second full-network XLA
    compile for an identical body)."""
    return se3.transform_points(poses, stack)


def _score_posed(model, variables, stack, poses, active, idx_i, idx_j):
    """Score every ordered slot pair of the POSED stack in one batched
    forward. With a good pose estimate the true-neighbor pairs are
    almost aligned, so the net's output is a small residual correction —
    the measurement update of the iterative synchronization loop
    (``sync_iters``). Fixed shapes: the same two compiled programs serve
    every iteration and every K <= pad_to."""
    from .spanning import _score_all_jit

    posed = _pose_stack_jit(stack, poses)
    return _score_all_jit(model, variables, posed, active, idx_i, idx_j)


def _project_so3(M):
    """Nearest rotation to a 3x3 block (SVD with det fixup)."""
    U, _, Vt = np.linalg.svd(M)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        U[:, -1] = -U[:, -1]
        R = U @ Vt
    return R


def synchronize_poses(k, edges, irls_iters=0, sigma_deg=15.0):
    """Solve absolute poses from relative measurements.

    ``edges``: list of (i, j, M, w) — M [4, 4] maps piece-j coordinates
    into piece-i coordinates (the pairwise net's fixed/moved convention),
    w > 0 its confidence weight. Every piece must be reachable from
    piece 0 through the edge set. Returns k [4, 4] poses with pose[0]
    = identity.

    ``irls_iters``: robust re-solving — after each solve, compute every
    edge's rotation residual against the solution and shrink its weight
    with a Cauchy kernel (w / (1 + (theta/sigma)^2)); gross outlier
    measurements (non-adjacent pairs that slipped through edge
    selection, bad pose predictions) lose their influence without any
    extra network forwards. ``sigma_deg``: residual scale of the kernel.
    """
    cur = edges
    for _ in range(max(0, irls_iters)):
        poses = _solve_once(k, cur)
        cur = []
        # standard IRLS: reweight the ORIGINAL weights by the latest
        # residuals (compounding the shrunk weights collapses the graph
        # and the spectral solve diverges)
        for i, j, M, w in edges:
            R_est = poses[i][:3, :3].T @ poses[j][:3, :3]
            c = (np.trace(M[:3, :3].T @ R_est) - 1) / 2
            theta = np.degrees(np.arccos(np.clip(c, -1, 1)))
            cur.append((i, j, M, w / (1.0 + (theta / sigma_deg) ** 2)))
    return _solve_once(k, cur)


def _solve_once(k, edges):
    # --- rotation synchronization (spectral) ---
    A = np.zeros((3 * k, 3 * k))
    deg = np.zeros(k)
    for i, j, M, w in edges:
        R = M[:3, :3]
        A[3 * i:3 * i + 3, 3 * j:3 * j + 3] += w * R
        A[3 * j:3 * j + 3, 3 * i:3 * i + 3] += w * R.T
        deg[i] += w
        deg[j] += w
    # SYMMETRICALLY normalized spectral solve, eigh(D^-1/2 A D^-1/2):
    # its leading three eigenvectors stack V_i ~= d_i^-1/2 R_i^T Q
    # (A's blocks are R_ij = R_i^T R_j), so the gauged absolute rotation
    # is recovered from V_0 V_i^T = (d_0 d_i)^-1/2 R_0^T R_i — a POSITIVE
    # scalar times a rotation, which the per-block SO(3) projection
    # absorbs exactly. Two hard-won invariants:
    # * Q (the eigenbasis mixture of the degenerate top-3 eigenspace) may
    #   carry a REFLECTION — the product V_0 V_i^T must be formed FIRST
    #   and projected ONCE (Q Q^T = I cancels it); projecting each factor
    #   separately garbles ~half of all solves (CLAUDE.md invariant).
    # * the one-sided form A/d is NOT symmetric, and np.linalg.eigh
    #   silently reads only one triangle of it — that made the solve
    #   depend on piece LABELING (relabeling changed results by ~0.04
    #   under heterogeneous weights; pure gauge ops must be free).
    dis = np.repeat(1.0 / np.sqrt(np.maximum(deg, 1e-12)), 3)
    _, vecs = np.linalg.eigh(dis[:, None] * A * dis[None, :])
    V = vecs[:, -3:]                                  # [3k, 3]
    V0 = V[0:3]
    rots = [_project_so3(V0 @ V[3 * i:3 * i + 3].T) for i in range(k)]

    # --- translation least squares ---
    # constraint per edge: t_i - t_j + R_i t_ij = 0, gauge t_0 = 0
    rows, rhs, ws = [], [], []
    for i, j, M, w in edges:
        row = np.zeros((3, 3 * k))
        row[:, 3 * i:3 * i + 3] = np.eye(3)
        row[:, 3 * j:3 * j + 3] = -np.eye(3)
        rows.append(row)
        rhs.append(-rots[i] @ M[:3, 3])
        ws.append(w)
    # gauge row
    g = np.zeros((3, 3 * k))
    g[:, :3] = np.eye(3)
    rows.append(g)
    rhs.append(np.zeros(3))
    ws.append(max(ws) if ws else 1.0)
    Amat = np.concatenate([np.sqrt(w) * r for r, w in zip(rows, ws)])
    b = np.concatenate([np.sqrt(w) * v for v, w in zip(rhs, ws)])
    t, *_ = np.linalg.lstsq(Amat, b, rcond=None)
    t = t.reshape(k, 3)
    t = t - t[0]

    poses = []
    for i in range(k):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = rots[i]
        T[:3, 3] = t[i]
        poses.append(T)
    return poses


def _edge_selection(k, scores_np, pos, keep_frac=0.6):
    """Per undirected pair: the better-scoring direction; keep the
    best ``keep_frac`` of pairs (at least a spanning set — union with
    the MST so the graph stays connected)."""
    from .spanning import _mst, pair_weight

    cands = []
    for i in range(k):
        for j in range(i + 1, k):
            sf, sr = scores_np[pos[(i, j)]], scores_np[pos[(j, i)]]
            if sf <= sr:
                cands.append((sf, i, j, pos[(i, j)], False))
            else:
                cands.append((sr, i, j, pos[(j, i)], True))
    cands.sort()
    n_keep = max(k - 1, int(round(keep_frac * len(cands))))
    kept = {(i, j): (p, inv, s) for s, i, j, p, inv in cands[:n_keep]}
    # guarantee connectivity: union with the MST over all pairs
    tree = _mst(k, pair_weight(scores_np, pos))
    for i, j in tree:
        if (i, j) not in kept:
            s, p, inv = ((scores_np[pos[(i, j)]], pos[(i, j)], False)
                         if scores_np[pos[(i, j)]] <= scores_np[pos[(j, i)]]
                         else (scores_np[pos[(j, i)]], pos[(j, i)], True))
            kept[(i, j)] = (p, inv, s)
    return kept


def sync_assemble(model, variables, pieces, num_points=None, pad_to=None,
                  refine_iters=0, icp_iters=0, keep_frac=0.6,
                  sync_iters=0, irls_iters=2, polish_iters=0,
                  measure_refine=0, tta_gauges=0, tta_mag=0.8,
                  dir_fuse=0.0, cons_w=0.0):
    """Assemble K fragments by global pose synchronization over the
    score-weighted pairwise measurement graph (module docstring). Same
    contract as the other assemblers: result in the FIRST piece's frame.

    ``keep_frac``: fraction of undirected pairs (best direction each)
    fed to the solver; the MST is always unioned in so the graph stays
    connected. ``measure_refine``: batched composed-refinement rounds of
    ALL pair measurements before edge selection (one extra fixed-shape
    forward per round, spanning._refine_all_jit) — improves the
    measurements, their fit scores, AND therefore which edges get kept.
    ``refine_iters``/``icp_iters`` polish each kept edge
    exactly as in spanning_assemble. ``irls_iters``: Cauchy-reweighted
    re-solves inside every synchronization (see synchronize_poses) —
    outlier edges are shrunk out of the solution at numpy cost only.

    ``sync_iters``: iterative measurement refinement — after each solve,
    pose every slot by its current estimate, re-run the batched pairwise
    net on the POSED stack (one compiled program, reused every
    iteration), map each residual correction back to a piece-frame
    relative measurement (T_i^-1 corr T_j), re-select edges by the new
    fit scores, and re-synchronize. Aligned true-neighbor pairs converge
    to near-identity corrections with near-zero boundary-chamfer scores,
    so their weights grow and wrong edges fall out of the kept set.
    Works best with a checkpoint trained with --random (random twist
    amplitude: near-identity pairs are then in-distribution).

    ``polish_iters``: joint pose polish — Adam steps of one se(3)
    correction per piece on the kept edges' predicted-boundary contact
    chamfer (assembly/polish.py; the graph pins the per-pair rim-sliding
    ambiguity that makes ``icp_iters`` unsafe).

    ``dir_fuse``/``cons_w``: direction-consistency fusion
    (spanning.symmetrize_measurements) — bulk path only (no per-edge
    refine_iters/icp_iters)."""
    from .greedy import _icp_refine_jit, _prepare_slots, _refine_jit
    from .spanning import (measure_all_pairs, symmetrize_measurements,
                           _union_fps_jit)

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

    # one bulk transfer on the default path: per-edge np.asarray(mats[p])
    # device slices each pay a full tunnel round trip (~17-28 of them at
    # k=8); only per-edge refinement needs the device-resident mats
    mats_np_all = (np.asarray(mats)
                   if not (refine_iters or icp_iters) else None)
    if dir_fuse or cons_w:
        mats_np_all, scores_np, _ = symmetrize_measurements(
            mats_np_all, scores_np, pos, k, dir_fuse, cons_w)
    kept = _edge_selection(k, scores_np, pos, keep_frac)
    edges, order, edge_mats, edge_scores = [], [], [], []
    for (i, j), (p_sel, inv, s) in sorted(kept.items(),
                                          key=lambda kv: kv[1][2]):
        i_sl, j_sl = (j, i) if inv else (i, j)       # fixed, moved slots
        if mats_np_all is not None:
            m = mats_np_all[p_sel]
        else:
            mat = mats[p_sel]
            for _ in range(refine_iters):
                mat = _refine_jit(model, variables, stack, i_sl, j_sl, mat)
            if icp_iters:
                mat = _icp_refine_jit(stack, i_sl, j_sl, top_f[p_sel],
                                      top_m[p_sel], mat, icp_iters)
            m = np.asarray(mat)
        if inv:
            m = np.linalg.inv(m).astype(np.float32)
        # inverse-score weight, relative to the best edge
        w = 1.0 / (float(s) + 1e-3)
        edges.append((i, j, m, w))
        order.append((i, j))
        edge_mats.append(m)
        edge_scores.append(float(s))

    poses = synchronize_poses(k, edges, irls_iters=irls_iters)

    last_top_f, last_top_m = top_f, top_m
    for _ in range(sync_iters):
        poses_full = jnp.asarray(np.stack(
            poses + [np.eye(4, dtype=np.float32)] * (k0 - k)))
        mats_r, scores_r, last_top_f, last_top_m = _score_posed(
            model, variables, stack, poses_full, active, idx_i, idx_j)
        # one bulk transfer: per-edge device slices would each pay a
        # tunnel round trip
        mats_np = np.asarray(mats_r)
        scores_np = np.asarray(scores_r)
        kept = _edge_selection(k, scores_np, pos, keep_frac)
        edges, order, edge_mats, edge_scores = [], [], [], []
        for (i, j), (p_sel, inv, s) in sorted(kept.items(),
                                              key=lambda kv: kv[1][2]):
            corr = mats_np[p_sel]
            # corr maps the posed moved slot onto the posed fixed slot;
            # pull it back to piece frames: x_i = T_i^-1 corr T_j x_j
            if inv:                       # fixed=j, moved=i measured
                m = np.linalg.inv(poses[j]) @ corr @ poses[i]
                m = np.linalg.inv(m)
            else:
                m = np.linalg.inv(poses[i]) @ corr @ poses[j]
            m = m.astype(np.float32)
            w = 1.0 / (float(s) + 1e-3)
            edges.append((i, j, m, w))
            order.append((i, j))
            edge_mats.append(m)
            edge_scores.append(float(s))
        poses = synchronize_poses(k, edges, irls_iters=irls_iters)

    if polish_iters:
        from .polish import polish_poses

        poses = polish_poses(np.asarray(stack), poses, kept,
                             np.asarray(last_top_f),
                             np.asarray(last_top_m), iters=polish_iters)

    poses_full = np.stack(
        poses + [np.eye(4, dtype=np.float32)] * (k0 - k))
    assembled = np.asarray(_union_fps_jit(
        stack, jnp.asarray(poses_full), active))
    return AssemblyResult(assembled, order, edge_mats, edge_scores,
                          [np.asarray(t) for t in poses])
