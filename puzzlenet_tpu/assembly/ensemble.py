"""Hypothesis-ensemble multi-piece assembly with posed-residual
verification.

The fourth assembler. greedy / spanning / sync each commit to ONE pose
hypothesis built from the one-shot pairwise measurements; at K >= 4 a
single bad edge sinks the result (PERFORMANCE.md "failure diagnosis" —
the reference has no multi-piece code at all, README.md:14, so all of
this is beyond-reference capability). This module spends the same
measurement budget differently:

1. ONE batched scoring forward over all K*(K-1) ordered slot pairs (the
   exact program the other assemblers share — compile-stable at pad_to).
2. MANY pose hypotheses from those measurements, all host-side and free:
   the MST composition, its edge-swap neighborhood (for each tree edge,
   the cheapest alternative tree avoiding it — the K-1 most plausible
   "the MST picked one wrong edge" repairs), and spectral
   synchronization solves over a grid of edge-keep fractions.
3. VERIFY each distinct hypothesis by re-running the batched pairwise
   net on the POSED stack: in a correct assembly every piece has some
   partner whose re-measurement is a near-identity correction with a
   low boundary-chamfer fit score. The verification cost per hypothesis
   is one forward of the already-compiled scoring program; wrong
   hypotheses cannot hide, because the re-measurement is new evidence,
   not a re-fit of the original (possibly wrong) measurements.
   Verification is most discriminative with checkpoints trained with
   --random (near-identity pairs in-distribution; see --frag_cuts
   training in PERFORMANCE.md).
4. Optionally re-synchronize from the winner's posed re-measurements
   (the sync_iters update — the winner's verification forward is
   already in hand, so the extra solve is host-only) and keep the
   refinement only if it verifies strictly better.

Device program inventory: the shared pair scorer + the posed-stack
transform + the final union-FPS — all fixed-shape, all shared with the
other assemblers; no hypothesis ever compiles anything new.
"""

import numpy as np
import jax.numpy as jnp

from .greedy import AssemblyResult, _prepare_slots
from .spanning import (_mst, _union_fps_jit, measure_all_pairs,
                       pair_weight, symmetrize_measurements)
from .sync import _edge_selection, _score_posed, synchronize_poses


def _compose_tree(k, tree, mats_np, scores_np, pos):
    """BFS-compose absolute poses (anchor = piece 0) along ``tree``
    edges, per edge taking the better-scoring direction's measurement
    (the net's mat maps its moved/second piece into its fixed/first
    piece's frame)."""
    adj = {i: [] for i in range(k)}
    for i, j in tree:
        adj[i].append(j)
        adj[j].append(i)
    poses = [None] * k
    poses[0] = np.eye(4, dtype=np.float32)
    frontier = [0]
    while frontier:
        p = frontier.pop()
        for c in adj[p]:
            if poses[c] is not None:
                continue
            fwd, rev = pos[(p, c)], pos[(c, p)]
            if scores_np[fwd] <= scores_np[rev]:
                m = mats_np[fwd]
            else:
                m = np.linalg.inv(mats_np[rev]).astype(np.float32)
            poses[c] = (poses[p] @ m).astype(np.float32)
            frontier.append(c)
    return poses


def _tree_swaps(k, tree, weight):
    """The edge-swap neighborhood of a spanning tree: for each tree edge,
    drop it and reconnect the two components with the cheapest non-tree
    edge. Returns a list of alternative trees (edges as (i, j), i < j)."""
    out = []
    for drop in tree:
        rest = [e for e in tree if e != drop]
        adj = {i: [] for i in range(k)}
        for i, j in rest:
            adj[i].append(j)
            adj[j].append(i)
        comp = set()
        stack = [drop[0]]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x])
        best, best_e = np.inf, None
        for i in range(k):
            for j in range(i + 1, k):
                if (i, j) == drop or ((i in comp) == (j in comp)):
                    continue
                w = weight(i, j)
                if w < best:
                    best, best_e = w, (i, j)
        if best_e is not None:
            out.append(rest + [best_e])
    return out


def _verify_per_piece(k, mats_rn, scores_rn, pos, wa=1.0, wt=1.0, ws=10.0):
    """Per-piece attachment cost of a posed hypothesis from its
    re-measurement: for each piece, the best available partner's
    ``wa * |rot residual| (rad) + wt * |t residual| + ws * fit score``
    (both orderings considered). Lower is better; a piece with no
    near-identity low-score partner anywhere gets a high cost — the
    repair loop targets exactly that piece."""
    out = []
    for i in range(k):
        best = np.inf
        for j in range(k):
            if i == j:
                continue
            for a, b in ((i, j), (j, i)):
                p = pos[(a, b)]
                M = mats_rn[p]
                c = (np.trace(M[:3, :3]) - 1.0) / 2.0
                ang = float(np.arccos(np.clip(c, -1.0, 1.0)))
                tn = float(np.linalg.norm(M[:3, 3]))
                v = wa * ang + wt * tn + ws * float(scores_rn[p])
                best = min(best, v)
        out.append(best)
    return out


def _verify(k, mats_rn, scores_rn, pos, wa=1.0, wt=1.0, ws=10.0):
    """Mean per-piece attachment cost (see _verify_per_piece)."""
    return float(np.mean(_verify_per_piece(k, mats_rn, scores_rn, pos,
                                           wa, wt, ws)))


def _edges_from_selection(kept, mats_np):
    """Turn an _edge_selection result into synchronize_poses input."""
    edges = []
    for (i, j), (p_sel, inv, s) in kept.items():
        m = mats_np[p_sel]
        if inv:
            m = np.linalg.inv(m).astype(np.float32)
        edges.append((i, j, m, 1.0 / (float(s) + 1e-3)))
    return edges


def ensemble_assemble(model, variables, pieces, num_points=None,
                      pad_to=None, keep_fracs=(0.35, 0.6, 0.85),
                      irls_iters=2, final_sync=True,
                      verify_weights=(1.0, 1.0, 10.0),
                      refine_iters=0, icp_iters=0, polish_iters=0,
                      include_greedy=False, repair_iters=0,
                      repair_candidates=3, measure_refine=0, cc_iters=0,
                      tta_gauges=0, tta_mag=0.8, dir_fuse=0.0,
                      cons_w=0.0):
    """Assemble K fragments by verified hypothesis ensembling (module
    docstring). Same contract as the other assemblers: fragments
    [K, N, 3] (or list of [N, 3]) sharing N; result expressed in the
    FIRST piece's frame.

    ``keep_fracs``: edge-keep fractions for the synchronization
    hypotheses. ``irls_iters``: Cauchy re-weighting inside each solve
    (sync.synchronize_poses). ``final_sync``: re-synchronize from the
    winner's posed re-measurements, kept only if it verifies better.
    ``verify_weights``: (rotation rad, translation, fit score) weights
    of the verification metric. ``polish_iters``: joint boundary-contact
    pose polish of the winner (assembly/polish.py), verified by posed
    re-measurement and kept only if strictly better — polish can never
    degrade the ensemble's output. ``include_greedy``: also verify the
    accretion-greedy assembler's poses as a hypothesis (costs K-1 extra
    merge rounds through greedy's own compile-stable programs; the
    verified union can only beat either algorithm alone).

    ``measure_refine``: batched composed-refinement rounds of ALL pair
    measurements before any hypothesis is built (one extra fixed-shape
    forward per round, spanning._refine_all_jit) — better measurements
    improve every hypothesis AND the verification stays honest (it
    re-measures posed stacks, new evidence either way).

    ``repair_iters``: verification-guided worst-piece repair — per
    iteration, take the piece with the highest per-piece attachment
    cost in the winner's re-measurement, propose new absolute poses for
    it from its ``repair_candidates`` most reliable (lowest re-measured
    fit score) partner edges (the posed correction left-composed onto
    the current pose; both orderings), and keep the best proposal only
    if the whole hypothesis re-verifies strictly better. One scoring
    forward per proposal, all through the shared compiled program;
    stops early when no proposal improves. Targets the K >= 6 failure
    mode where a single mis-posed piece sinks an otherwise-correct
    assembly but the global re-solve (final_sync) averages its error
    into every piece instead of isolating it.

    ``tta_gauges``: gauge-augmented re-measurement rounds of the
    initial pair measurements — each round re-scores every pair under a
    fresh per-pair random rigid gauge and keeps the best fit score
    (spanning._score_all_gauged_jit); presentation noise of the
    non-rigid-invariant net is selected over instead of accepted.
    ``tta_mag``: gauge twist amplitude (match the checkpoint's
    --global_pose magnitude).

    ``cc_iters``: cluster-complement refinement rounds of the final
    winner (assembly/complement.py) — per round, measure every piece
    against the masked-FPS union of the OTHER posed pieces (the
    in-distribution fragment/complement presentation the net is
    strongest on) and accept the corrected poses only if they re-verify
    strictly better. One extra fixed-shape program; the in-distribution
    closer for the K >= 6 near-miss failure mode.

    ``dir_fuse``/``cons_w``: direction-consistency fusion of the pair
    measurements before any hypothesis is built
    (spanning.symmetrize_measurements) — replace both directions of
    each consistent unordered pair by their chordal mean (``dir_fuse``
    = agreement gate in degrees; 0 = off) and/or penalize inconsistent
    pairs' scores by ``cons_w`` x composition residual. Zero extra
    forwards.

    Returns ``AssemblyResult`` with ``merge_order`` = the winning
    hypothesis's edge set (tree edges for mst/swap/greedy hypotheses,
    the sorted kept-edge list for sync-family winners), ``scores`` =
    [verification cost], and ``piece_transforms`` the winning poses.
    """
    if refine_iters or icp_iters:
        raise ValueError(
            "ensemble_assemble verifies whole-pose hypotheses instead of "
            "polishing individual edges; use final_sync (default on) — "
            "refine_iters/icp_iters belong to the other assemblers")
    stack, k, pairs, idx_i, idx_j, active = _prepare_slots(
        pieces, num_points, pad_to)
    k0 = stack.shape[0]
    pos = {ij: p for p, ij in enumerate(pairs)}
    eye = np.eye(4, dtype=np.float32)

    if k == 1:
        return AssemblyResult(np.asarray(stack[0]), [], [], [0.0], [eye])

    mats, scores, _, _ = measure_all_pairs(
        model, variables, stack, active, idx_i, idx_j, measure_refine,
        tta_gauges=tta_gauges, tta_mag=tta_mag)
    mats_np = np.asarray(mats)
    scores_np = np.asarray(scores)
    if dir_fuse or cons_w:
        # direction-consistency fusion (spanning.symmetrize_measurements):
        # every hypothesis below builds from mats_np/scores_np, so fused
        # measurements improve the MST, its swaps, AND the sync solves
        mats_np, scores_np, _ = symmetrize_measurements(
            mats_np, scores_np, pos, k, dir_fuse, cons_w)

    weight = pair_weight(scores_np, pos)

    # --- hypotheses (host-only, no device work) ---
    hyps = []
    mst = _mst(k, weight)
    hyps.append(("mst", mst, _compose_tree(k, mst, mats_np, scores_np,
                                           pos)))
    for t, tree in enumerate(_tree_swaps(k, mst, weight)):
        hyps.append((f"swap{t}", tree,
                     _compose_tree(k, tree, mats_np, scores_np, pos)))
    for kf in keep_fracs:
        kept = _edge_selection(k, scores_np, pos, kf)
        edges = _edges_from_selection(kept, mats_np)
        hyps.append((f"sync@{kf}", sorted(kept),
                     synchronize_poses(k, edges, irls_iters=irls_iters)))
    if include_greedy and k > 2:
        from .greedy import greedy_assemble

        rg = greedy_assemble(model, variables, pieces,
                             num_points=num_points, pad_to=k0, grow=True)
        hyps.append(("greedy", rg.merge_order,
                     [np.asarray(t, np.float32)
                      for t in rg.piece_transforms]))

    # dedupe near-identical pose sets (edge-swap trees often coincide)
    seen, uniq = set(), []
    for name, tree, poses in hyps:
        key = np.round(np.stack(poses), 3).tobytes()
        if key in seen:
            continue
        seen.add(key)
        uniq.append((name, tree, poses))

    # --- verification: one posed re-scoring forward per hypothesis ---
    wa, wt, ws = verify_weights

    def measure(poses):
        poses_full = jnp.asarray(
            np.stack(list(poses) + [eye] * (k0 - k)))
        mats_r, scores_r, tf_r, tm_r = _score_posed(
            model, variables, stack, poses_full, active, idx_i, idx_j)
        mats_rn = np.asarray(mats_r)
        scores_rn = np.asarray(scores_r)
        # tops stay on device: only the polish path ever reads them
        per = _verify_per_piece(k, mats_rn, scores_rn, pos, wa, wt, ws)
        return (mats_rn, scores_rn, float(np.mean(per)), (tf_r, tm_r), per)

    best = None
    for name, tree, poses in uniq:
        mats_rn, scores_rn, v, tops, per = measure(poses)
        if best is None or v < best[0]:
            best = (v, name, tree, poses, mats_rn, scores_rn, tops, per)
    v, name, tree, poses, mats_rn, scores_rn, tops, per = best

    if final_sync:
        # sync_iters update from the winner's (already measured) posed
        # residuals: pull each kept correction back to piece frames
        # (x_i = T_i^-1 corr T_j x_j) and re-solve
        kept = _edge_selection(k, scores_rn, pos, keep_frac=0.6)
        edges = []
        for (i, j), (p_sel, inv, s) in kept.items():
            corr = mats_rn[p_sel]
            if inv:
                m = np.linalg.inv(
                    np.linalg.inv(poses[j]) @ corr @ poses[i])
            else:
                m = np.linalg.inv(poses[i]) @ corr @ poses[j]
            edges.append((i, j, m.astype(np.float32),
                          1.0 / (float(s) + 1e-3)))
        poses2 = synchronize_poses(k, edges, irls_iters=irls_iters)
        m2, s2, v2, t2, p2 = measure(poses2)
        if v2 < v:
            v, name, tree, poses = v2, name + "+sync", sorted(kept), poses2
            mats_rn, scores_rn, tops, per = m2, s2, t2, p2

    repaired = False
    for _ in range(repair_iters):
        if k < 3:
            break
        w_piece = int(np.argmax(per))
        # proposals: corrections from the worst piece's most reliable
        # partner edges in the CURRENT re-measurement. corr maps the
        # posed moved slot onto the posed fixed slot, so with w moved
        # the repaired absolute pose is corr @ pose_w; with w fixed,
        # keeping the partner in place and moving the pair rigidly back
        # gives inv(corr) @ pose_w.
        cands = []
        for j in range(k):
            if j == w_piece:
                continue
            p_mv = pos[(j, w_piece)]
            cands.append((float(scores_rn[p_mv]),
                          mats_rn[p_mv] @ poses[w_piece]))
            p_fx = pos[(w_piece, j)]
            cands.append((float(scores_rn[p_fx]),
                          np.linalg.inv(mats_rn[p_fx]) @ poses[w_piece]))
        cands.sort(key=lambda c: c[0])
        best_try = None
        for _, new_pose in cands[:repair_candidates]:
            poses_try = list(poses)
            poses_try[w_piece] = new_pose.astype(np.float32)
            m4, s4, v4, t4, p4 = measure(poses_try)
            if best_try is None or v4 < best_try[0]:
                best_try = (v4, poses_try, m4, s4, t4, p4)
        if best_try is None or best_try[0] >= v:
            break
        v, poses, mats_rn, scores_rn, tops, per = best_try
        repaired = True
    if repaired:
        name += "+repair"
        if not np.allclose(poses[0], eye, atol=1e-6):
            # piece 0 itself was repaired — restore the anchor gauge and
            # RE-MEASURE: the pairwise net consumes ABSOLUTE posed
            # coordinates (it is not rigid-invariant; --global_pose
            # training only randomizes over placement), so the reported
            # v and any later polish comparison must refer to the poses
            # actually returned. Non-anchor repairs never move piece 0
            # and skip the extra forward.
            g0 = np.linalg.inv(poses[0]).astype(np.float32)
            poses = [(g0 @ p).astype(np.float32) for p in poses]
            mats_rn, scores_rn, v, tops, per = measure(poses)

    if polish_iters:
        # joint boundary-contact polish of the winner (assembly/polish.py)
        # from its own posed re-measurement, kept only if it verifies
        # strictly better
        from .polish import polish_poses

        kept_p = _edge_selection(k, scores_rn, pos, keep_frac=0.6)
        poses3 = polish_poses(np.asarray(stack), list(poses), kept_p,
                              np.asarray(tops[0]), np.asarray(tops[1]),
                              iters=polish_iters)
        _, _, v3, _, p3 = measure(poses3)
        if v3 < v:
            v, name, poses, per = v3, name + "+polish", poses3, p3

    if cc_iters:
        from .complement import refine_poses

        def _verify(ps):
            _, _, vv, _, pp = measure(ps)
            return vv, pp

        poses5, v5, per5, improved = refine_poses(
            model, variables, stack, active, k, list(poses), _verify,
            cc_iters, v0=v, per0=per)
        if improved:
            v, poses, per = v5, poses5, per5
            name += "+cc"

    poses_full = np.stack(list(poses) + [eye] * (k0 - k))
    assembled = np.asarray(_union_fps_jit(
        stack, jnp.asarray(poses_full), active))
    return AssemblyResult(assembled, list(tree), [], [float(v)],
                          [np.asarray(t) for t in poses])
