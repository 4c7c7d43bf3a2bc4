"""Hierarchical (divide-and-conquer) multi-piece assembly.

The flat assemblers degrade fast past K ~ 6 (PERFORMANCE.md): at K = 8
every fragment is a sliver, pairwise measurements on sliver pairs are
poor, and one bad edge sinks the whole pose graph. This fifth assembler
exploits where the pairwise net is strong instead:

1. measure all pairs once (the shared compile-stable front-end,
   optionally measure_refine'd);
2. bipartition the pieces into two balanced, contiguous clusters by
   cutting one edge of the measurement MST (the most balanced cut,
   ties broken toward the weakest edge);
3. recursively assemble each cluster — at K <= base_k the flat verified
   ensemble runs in its sweet spot (85-95% success at K = 3-4);
4. merge the two ASSEMBLED clusters with one pairwise measurement. The
   two clusters are complements of the (sub)cloud by construction —
   exactly the single-cut complement distribution the net was trained
   on (--frag_cuts covers the recursive sub-fragment case), unlike
   greedy's cluster-vs-sliver intermediate merges;
5. verify the hierarchical poses by posed re-measurement and fall back
   to the flat ensemble if that verifies strictly better — the result
   can never verify worse than the flat assembler.

Compile-stability: every stage reuses the SAME padded fixed-shape
programs the flat assemblers own (_score_all_jit/_refine_all_jit/
_pose_stack_jit/_union_fps_jit at pad_to slots) — sub-problems and the
2-cluster merge just run with more inactive slots. No stage compiles
anything new. (Reference: no multi-piece code at all, README.md:14.)
"""

import jax.numpy as jnp
import numpy as np

from .ensemble import _verify_per_piece, ensemble_assemble
from .greedy import AssemblyResult, _prepare_slots
from .spanning import (_mst, _refine_all_jit, _union_fps_jit,
                       measure_all_pairs, pair_weight,
                       symmetrize_measurements)
from .sync import _score_posed


def _ranked_mst_cuts(k, tree, weight):
    """Rank the tree edges by how balanced the two-component split their
    removal yields (ties: cut the costliest edge). Returns the ranked
    list of (part_a, part_b) sorted-index-list pairs, best first."""
    cuts = []
    for drop in tree:
        rest = [e for e in tree if e != drop]
        adj = {i: [] for i in range(k)}
        for i, j in rest:
            adj[i].append(j)
            adj[j].append(i)
        comp, frontier = {drop[0]}, [drop[0]]
        while frontier:
            x = frontier.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    frontier.append(y)
        a = sorted(comp)
        b = sorted(set(range(k)) - comp)
        cuts.append(((min(len(a), len(b)), weight(*drop)), a, b))
    cuts.sort(key=lambda c: c[0], reverse=True)
    return [(a, b) for _, a, b in cuts]


def _balanced_mst_cut(k, tree, weight):
    """The most balanced MST cut (see _ranked_mst_cuts)."""
    return _ranked_mst_cuts(k, tree, weight)[0]


def hierarchical_assemble(model, variables, pieces, num_points=None,
                          pad_to=None, base_k=4, measure_refine=0,
                          repair_iters=0, polish_iters=0, irls_iters=2,
                          fallback=True, refine_iters=0, icp_iters=0,
                          cc_iters=0, tta_gauges=0, tta_mag=0.8,
                          beam_cuts=1, dir_fuse=0.0, cons_w=0.0):
    """Assemble K fragments by recursive bipartition + verified merge
    (module docstring). Same contract as the other assemblers: fragments
    [K, N, 3] (or list of [N, 3]) sharing N; result in the FIRST piece's
    frame.

    ``base_k``: sub-problems at or below this size run the flat verified
    ensemble directly. ``measure_refine``/``repair_iters``/
    ``polish_iters``/``irls_iters`` are passed through to the ensemble
    leaves (and measure_refine also refines the bipartition measurements
    and the cluster-cluster merge). ``fallback``: at the TOP level, also
    run the flat ensemble and return whichever poses verify better
    (posed re-measurement; same metric the ensemble optimizes) — the
    hierarchy then can never verify worse than flat. ``cc_iters``:
    cluster-complement refinement rounds (assembly/complement.py) of the
    TOP-LEVEL winner (hierarchical or flat-fallback), accepted only on
    strict verification improvement; leaves run their own ensemble-side
    cc refinement with the same count. ``beam_cuts``: at the TOP level,
    fully assemble this many of the most balanced MST bipartitions and
    keep the best-verifying result (each extra beam costs one full
    recursive assembly through the same compiled programs).
    ``dir_fuse``/``cons_w``: direction-consistency fusion
    (spanning.symmetrize_measurements) of the bipartition measurements,
    the cluster-cluster merges, and the ensemble leaves' measurements.
    """
    if refine_iters or icp_iters:
        raise ValueError(
            "hierarchical_assemble verifies whole-pose hypotheses; use "
            "measure_refine — refine_iters/icp_iters belong to the "
            "edge-polishing assemblers")
    pieces = [np.asarray(p, np.float32) for p in pieces]
    k = len(pieces)
    kw = dict(measure_refine=measure_refine, repair_iters=repair_iters,
              polish_iters=polish_iters, irls_iters=irls_iters,
              cc_iters=cc_iters, tta_gauges=tta_gauges, tta_mag=tta_mag,
              dir_fuse=dir_fuse, cons_w=cons_w)
    if k <= base_k:
        return ensemble_assemble(model, variables, pieces,
                                 num_points=num_points, pad_to=pad_to,
                                 **kw)

    stack, k, pairs, idx_i, idx_j, active = _prepare_slots(
        pieces, num_points, pad_to)
    k0 = stack.shape[0]
    pos = {ij: p for p, ij in enumerate(pairs)}
    eye = np.eye(4, dtype=np.float32)

    mats, scores, _, _ = measure_all_pairs(
        model, variables, stack, active, idx_i, idx_j, measure_refine,
        tta_gauges=tta_gauges, tta_mag=tta_mag)
    scores_np = np.asarray(scores)
    if dir_fuse or cons_w:
        _, scores_np, _ = symmetrize_measurements(
            np.asarray(mats), scores_np, pos, k, dir_fuse, cons_w)

    weight = pair_weight(scores_np, pos)
    tree = _mst(k, weight)
    cuts = _ranked_mst_cuts(k, tree, weight)[:max(1, beam_cuts)
                                             if fallback else 1]

    def assemble_cut(part_a, part_b):
        """Recurse on one bipartition + one complement-pair merge;
        returns (poses re-gauged to piece 0, m_ab)."""
        # --- recurse (same padded programs; no new compilations) ---
        sub_a = hierarchical_assemble(
            model, variables, [pieces[i] for i in part_a],
            num_points=num_points, pad_to=pad_to, base_k=base_k,
            fallback=False, **kw)
        sub_b = hierarchical_assemble(
            model, variables, [pieces[i] for i in part_b],
            num_points=num_points, pad_to=pad_to, base_k=base_k,
            fallback=False, **kw)

        # --- cluster-cluster merge: ONE in-distribution complement pair.
        # Reuse the padded scoring program with the two assembled
        # clusters in slots 0/1 and everything else inactive.
        pair_stack = jnp.asarray(np.stack(
            [sub_a.assembled, sub_b.assembled]
            + [np.zeros_like(sub_a.assembled)] * (k0 - 2)))
        pair_active = jnp.arange(k0) < 2
        m2, s2, _, _ = measure_all_pairs(
            model, variables, pair_stack, pair_active, idx_i, idx_j,
            measure_refine, tta_gauges=tta_gauges, tta_mag=tta_mag)
        m2_np, s2_np = np.asarray(m2), np.asarray(s2)
        if dir_fuse or cons_w:
            # fuse the two directions of the single cluster-cluster pair
            m2_np, s2_np, _ = symmetrize_measurements(
                m2_np, s2_np, pos, 2, dir_fuse, cons_w)
        p_ab, p_ba = pos[(0, 1)], pos[(1, 0)]
        if s2_np[p_ab] <= s2_np[p_ba]:      # fixed = A, moved = B
            m_ab = m2_np[p_ab]
        else:
            m_ab = np.linalg.inv(m2_np[p_ba]).astype(np.float32)

        # --- compose global poses (A's anchor frame), re-gauge to 0
        poses = [None] * k
        for i, t in zip(part_a, sub_a.piece_transforms):
            poses[i] = np.asarray(t, np.float32)
        for i, t in zip(part_b, sub_b.piece_transforms):
            poses[i] = (m_ab @ np.asarray(t)).astype(np.float32)
        g0 = np.linalg.inv(poses[0]).astype(np.float32)
        return [(g0 @ t).astype(np.float32) for t in poses], m_ab

    def measure(ps):
        ps_full = jnp.asarray(np.stack(list(ps) + [eye] * (k0 - k)))
        mats_r, scores_r, _, _ = _score_posed(
            model, variables, stack, ps_full, active, idx_i, idx_j)
        per = _verify_per_piece(k, np.asarray(mats_r),
                                np.asarray(scores_r), pos)
        return float(np.mean(per)), per

    # beam over the most balanced MST cuts (top level only): assemble
    # each candidate bipartition fully and keep the best-verifying poses
    v = per = poses = order = merge_mats = None
    for part_a, part_b in cuts:
        poses_c, m_ab = assemble_cut(part_a, part_b)
        v_c, per_c = measure(poses_c)
        if v is None or v_c < v:
            v, per, poses = v_c, per_c, poses_c
            order = [("cut", tuple(part_a), tuple(part_b))]
            merge_mats = [m_ab]
    if fallback:
        flat = ensemble_assemble(model, variables, pieces,
                                 num_points=num_points, pad_to=pad_to,
                                 **kw)
        v_flat, per_flat = measure(flat.piece_transforms)
        if v_flat < v:
            poses = [np.asarray(t, np.float32)
                     for t in flat.piece_transforms]
            v, per = v_flat, per_flat
            order, merge_mats = flat.merge_order, flat.transforms
    if cc_iters and fallback:
        # top-level complement refinement of whichever poses won (the
        # leaves refined their sub-assemblies; this closes at full K)
        from .complement import refine_poses

        poses2, v2, _, improved = refine_poses(
            model, variables, stack, active, k, list(poses), measure,
            cc_iters, v0=v, per0=per)
        if improved:
            poses, v = poses2, v2

    poses_full = np.stack(list(poses) + [eye] * (k0 - k))
    assembled = np.asarray(_union_fps_jit(
        stack, jnp.asarray(poses_full), active))
    return AssemblyResult(assembled, order, merge_mats, [float(v)], poses)
