"""Assembly + viz tests: greedy multi-piece loop runs end-to-end on a small
model; PLY/PTS writers roundtrip through our own readers."""

import jax
import numpy as np
import pytest

from puzzlenet_tpu import viz
from puzzlenet_tpu.assembly import greedy_assemble, score_pairs
from puzzlenet_tpu.data.meshio import plyread
from puzzlenet_tpu.models import PuzzleNet

pytestmark = pytest.mark.slow  # heavy e2e tier (see conftest.py)

N = 256


@pytest.fixture(scope="module")
def model_and_pieces():
    rng = np.random.default_rng(0)
    # 3 fragments of a sphere surface (thirds by z)
    u = rng.standard_normal((3 * N, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    order = np.argsort(u[:, 2])
    pieces = [u[order[i * N:(i + 1) * N]] for i in range(3)]
    model = PuzzleNet(num_points=N)
    variables = model.init(jax.random.PRNGKey(0), pieces[0][None],
                           pieces[1][None], train=False)
    return model, variables, pieces


class TestAssembly:
    def test_score_pairs_shapes(self, model_and_pieces):
        model, variables, pieces = model_and_pieces
        pairs, twists, scores = score_pairs(model, variables, pieces)
        assert len(pairs) == 6  # 3 * 2 ordered pairs
        assert twists.shape == (6, 6)
        assert scores.shape == (6,)
        assert np.all(np.isfinite(np.asarray(scores)))

    def test_greedy_assemble_converges(self, model_and_pieces):
        model, variables, pieces = model_and_pieces
        result = greedy_assemble(model, variables, pieces, num_points=N)
        assert result.assembled.shape == (N, 3)
        assert len(result.merge_order) == 2  # 3 pieces -> 2 merges
        assert len(result.transforms) == 2
        for g in result.transforms:
            assert g.shape == (4, 4)
            np.testing.assert_allclose(g[3], [0, 0, 0, 1], atol=1e-6)
        # anchor-frame contract: piece 0's pose is identity, every other
        # piece gets a rigid pose in that frame
        assert len(result.piece_transforms) == 3
        np.testing.assert_allclose(result.piece_transforms[0], np.eye(4),
                                   atol=1e-5)
        for t in result.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)

    def test_anchor_frame_bookkeeping(self, model_and_pieces):
        """piece_transforms reproduce the assembled cloud: applying each
        piece's pose to its input points lands inside the assembly's
        bounding region (the assembled cloud is an FPS subsample of the
        union of posed pieces)."""
        from puzzlenet_tpu.ops import chamfer_distances
        import jax.numpy as jnp

        model, variables, pieces = model_and_pieces
        result = greedy_assemble(model, variables, pieces, num_points=N)
        posed = np.concatenate([
            p @ t[:3, :3].T + t[:3, 3]
            for p, t in zip(pieces, result.piece_transforms)])
        # every assembled point came from the posed union (FPS selects a
        # subset) -> one-sided distance assembled->posed is ~0
        # (chamfer_distances returns (d_per_b, d_per_a))
        _, d_asm = chamfer_distances(jnp.asarray(result.assembled)[None],
                                     jnp.asarray(posed)[None])
        assert float(jnp.max(d_asm)) < 1e-6

    def test_greedy_assemble_compile_stable(self, model_and_pieces):
        """The whole K -> 1 loop reuses exactly two compilations (round
        scorer + merge) — the candidate-pair axis is padded to K*(K-1)
        with inactive pairs masked, so no round changes any shape."""
        from puzzlenet_tpu.assembly import greedy

        model, variables, pieces = model_and_pieces
        # 4 pieces: split the third fixture piece in two
        p = pieces[2]
        four = [pieces[0], pieces[1],
                np.concatenate([p[:N // 2], p[:N // 2]]),
                np.concatenate([p[N // 2:], p[N // 2:]])]
        base_round = greedy._round_jit._cache_size()
        base_merge = greedy._merge_jit._cache_size()
        result = greedy_assemble(model, variables, four)
        assert len(result.merge_order) == 3
        assert greedy._round_jit._cache_size() - base_round == 1
        assert greedy._merge_jit._cache_size() - base_merge == 1
        # merge order indexes the ORIGINAL slot table; merged cloud lands
        # in the fixed slot, the moved slot is never reused
        moved = [j for _, j in result.merge_order]
        assert len(set(moved)) == 3

    def test_pad_to_shares_one_compilation_across_k(self, model_and_pieces):
        """pad_to=K_max: one compiled program pair serves every K (the
        assembly_bench protocol — no recompile between a 3-piece and a
        4-piece problem)."""
        from puzzlenet_tpu.assembly import greedy

        model, variables, pieces = model_and_pieces
        p = pieces[2]
        four = [pieces[0], pieces[1],
                np.concatenate([p[:N // 2], p[:N // 2]]),
                np.concatenate([p[N // 2:], p[N // 2:]])]
        base_round = greedy._round_jit._cache_size()
        base_merge = greedy._merge_jit._cache_size()
        r3 = greedy_assemble(model, variables, pieces, pad_to=4)
        r4 = greedy_assemble(model, variables, four, pad_to=4)
        assert len(r3.merge_order) == 2 and len(r4.merge_order) == 3
        # both calls share ONE 4-slot program pair (<= 1: a previous test
        # may already have compiled the same shapes)
        assert greedy._round_jit._cache_size() - base_round <= 1
        assert greedy._merge_jit._cache_size() - base_merge <= 1
        # padded dummy slots must never be selected
        touched = {i for ij in r3.merge_order for i in ij}
        assert touched <= {0, 1, 2}

    def test_refine_iters(self, model_and_pieces):
        """Pose refinement composes valid rigid transforms and adds exactly
        one extra compiled program regardless of iters or rounds."""
        from puzzlenet_tpu.assembly import greedy

        model, variables, pieces = model_and_pieces
        base = greedy._refine_jit._cache_size()
        result = greedy_assemble(model, variables, pieces, pad_to=4,
                                 refine_iters=2)
        assert greedy._refine_jit._cache_size() - base <= 1
        assert len(result.merge_order) == 2
        for g in result.transforms:
            # composed transform stays rigid: R^T R = I, det = +1
            R = g[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
            np.testing.assert_allclose(g[3], [0, 0, 0, 1], atol=1e-6)

    def test_spanning_assemble(self, model_and_pieces):
        """Pose-graph assembly: k-1 tree edges, anchor-frame contract,
        rigid poses, assembled cloud is a subset of the posed union."""
        from puzzlenet_tpu.assembly import spanning_assemble
        from puzzlenet_tpu.ops import chamfer_distances
        import jax.numpy as jnp

        model, variables, pieces = model_and_pieces
        r = spanning_assemble(model, variables, pieces, num_points=N)
        assert r.assembled.shape == (N, 3)
        assert len(r.merge_order) == 2 and len(r.transforms) == 2
        # tree reaches every piece exactly once from the anchor
        children = [c for _, c in r.merge_order]
        assert sorted(children) == [1, 2]
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-6)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
        posed = np.concatenate([
            p @ t[:3, :3].T + t[:3, 3]
            for p, t in zip(pieces, r.piece_transforms)])
        _, d_asm = chamfer_distances(jnp.asarray(r.assembled)[None],
                                     jnp.asarray(posed)[None])
        assert float(jnp.max(d_asm)) < 1e-6

    def test_spanning_pad_to_compile_stable(self, model_and_pieces):
        """One compiled scoring + union program serves every K <= pad_to;
        padded dummy slots never appear in the tree."""
        from puzzlenet_tpu.assembly import spanning, spanning_assemble

        model, variables, pieces = model_and_pieces
        p = pieces[2]
        four = [pieces[0], pieces[1],
                np.concatenate([p[:N // 2], p[:N // 2]]),
                np.concatenate([p[N // 2:], p[N // 2:]])]
        base_score = spanning._score_all_jit._cache_size()
        base_union = spanning._union_fps_jit._cache_size()
        r3 = spanning_assemble(model, variables, pieces, pad_to=4)
        r4 = spanning_assemble(model, variables, four, pad_to=4)
        assert len(r3.merge_order) == 2 and len(r4.merge_order) == 3
        assert spanning._score_all_jit._cache_size() - base_score <= 1
        assert spanning._union_fps_jit._cache_size() - base_union <= 1
        touched = {i for ij in r3.merge_order for i in ij}
        assert touched <= {0, 1, 2}

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_synchronize_poses_recovers_ground_truth(self, seed):
        """Pure-math solver check: noisy relative measurements of known
        absolute poses -> synchronized poses within the noise floor.
        Parametrized over seeds: eigh returns the degenerate top-3
        eigenspace mixed by an arbitrary O(3) basis, and roughly half of
        all instances draw a REFLECTED basis — the regression this
        guards (project V0 V_i^T once, not each factor)."""
        from scipy.spatial.transform import Rotation

        from puzzlenet_tpu.assembly.sync import synchronize_poses

        rng = np.random.default_rng(seed)
        k = 6
        gt = [np.eye(4)]
        for _ in range(k - 1):
            T = np.eye(4)
            T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            T[:3, 3] = rng.normal(scale=0.5, size=3)
            gt.append(T)
        edges = []
        for i in range(k):
            for j in range(i + 1, k):
                M = np.linalg.inv(gt[i]) @ gt[j]      # T_i M_ij = T_j
                noise = np.eye(4)
                noise[:3, :3] = Rotation.from_rotvec(
                    rng.normal(scale=0.01, size=3)).as_matrix()
                noise[:3, 3] = rng.normal(scale=0.005, size=3)
                edges.append((i, j, M @ noise, 1.0))
        poses = synchronize_poses(k, edges)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        for p, g in zip(poses, gt):
            np.testing.assert_allclose(p[:3, :3], g[:3, :3], atol=0.03)
            np.testing.assert_allclose(p[:3, 3], g[:3, 3], atol=0.03)

    def test_synchronize_poses_label_gauge_invariance(self):
        """Relabeling pieces is a pure gauge operation — the solved poses
        must be identical up to the relabeling. Regression: the one-sided
        normalization A/d is NOT symmetric and np.linalg.eigh silently
        reads only one triangle, making results depend on input order
        under heterogeneous edge weights (fixed: symmetric
        D^-1/2 A D^-1/2)."""
        from scipy.spatial.transform import Rotation

        from puzzlenet_tpu.assembly.sync import synchronize_poses

        rng = np.random.default_rng(11)
        k = 5
        gt = [np.eye(4)]
        for _ in range(k - 1):
            T = np.eye(4)
            T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            T[:3, 3] = rng.normal(scale=0.5, size=3)
            gt.append(T)
        edges = []
        for i in range(k):
            for j in range(i + 1, k):
                M = np.linalg.inv(gt[i]) @ gt[j]
                noise = np.eye(4)
                noise[:3, :3] = Rotation.from_rotvec(
                    rng.normal(scale=0.05, size=3)).as_matrix()
                # strongly heterogeneous weights expose the asymmetry
                edges.append((i, j, M @ noise, float(rng.uniform(0.1, 9))))
        poses = synchronize_poses(k, edges)

        # relabel: swap pieces 1 and 3 (keep the anchor at 0)
        perm = [0, 3, 2, 1, 4]
        inv_perm = list(np.argsort(perm))
        edges_p = [(inv_perm[i], inv_perm[j], M, w) for i, j, M, w in edges]
        poses_p = synchronize_poses(k, edges_p)
        for i in range(k):
            np.testing.assert_allclose(poses[i], poses_p[inv_perm[i]],
                                       atol=1e-5)

    def test_sync_assemble(self, model_and_pieces):
        """End-to-end sync assembler: anchor frame, rigid poses, output
        is a subset of the posed union."""
        from puzzlenet_tpu.assembly import sync_assemble
        from puzzlenet_tpu.ops import chamfer_distances
        import jax.numpy as jnp

        model, variables, pieces = model_and_pieces
        r = sync_assemble(model, variables, pieces, num_points=N)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-5)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        posed = np.concatenate([
            p @ t[:3, :3].T + t[:3, 3]
            for p, t in zip(pieces, r.piece_transforms)])
        _, d_asm = chamfer_distances(jnp.asarray(r.assembled)[None],
                                     jnp.asarray(posed)[None])
        assert float(jnp.max(d_asm)) < 1e-6

    def test_grow_mode(self, model_and_pieces):
        """Accretion greedy: after the first merge every later merge
        involves the growing cluster slot, and the two compiled programs
        are shared with plain greedy (traced cluster scalar)."""
        from puzzlenet_tpu.assembly import greedy

        model, variables, pieces = model_and_pieces
        # 4 pieces so there are >= 2 post-seed merges to constrain
        rng = np.random.default_rng(3)
        extra = pieces[2] + rng.normal(scale=0.01, size=pieces[2].shape
                                       ).astype(np.float32)
        four = [pieces[0], pieces[1], pieces[2], extra]
        base = greedy._round_jit._cache_size()
        r = greedy_assemble(model, variables, four, num_points=N,
                            grow=True)
        r2 = greedy_assemble(model, variables, four, num_points=N)
        assert greedy._round_jit._cache_size() - base <= 1
        assert r.assembled.shape == (N, 3)
        cluster = r.merge_order[0][0]
        for i, j in r.merge_order[1:]:
            assert cluster in (i, j)
            cluster = i
        assert len(r2.merge_order) == 3

    def test_irls_rejects_outlier_edges(self):
        """synchronize_poses with irls_iters recovers ground-truth poses
        when a minority of edges are grossly wrong, where the plain
        weighted solve is pulled off."""
        from scipy.spatial.transform import Rotation
        from puzzlenet_tpu.assembly.sync import synchronize_poses

        rng = np.random.default_rng(0)
        k = 6
        poses = [np.eye(4, dtype=np.float32)]
        for _ in range(k - 1):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            T[:3, 3] = rng.normal(size=3)
            poses.append(T)

        def rel(i, j):
            return np.linalg.inv(poses[i]) @ poses[j]

        edges = []
        for i in range(k):
            for j in range(i + 1, k):
                M = rel(i, j)
                edges.append((i, j, M.astype(np.float32), 1.0))
        # corrupt 3 of the 15 edges with random junk at equal weight
        for e in (1, 7, 13):
            i, j, _, w = edges[e]
            M = np.eye(4, dtype=np.float32)
            M[:3, :3] = Rotation.random(random_state=rng).as_matrix()
            M[:3, 3] = rng.normal(size=3) * 2
            edges[e] = (i, j, M, w)

        def max_rot_err(sol):
            errs = []
            for t, g in zip(sol, poses):
                c = (np.trace(t[:3, :3].T @ g[:3, :3]) - 1) / 2
                errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
            return max(errs)

        plain = synchronize_poses(k, edges)
        robust = synchronize_poses(k, edges, irls_iters=3)
        assert max_rot_err(robust) < 1.0          # outliers shrunk away
        assert max_rot_err(robust) < max_rot_err(plain)

    def test_sync_iters(self, model_and_pieces):
        """Iterative synchronization keeps the contract (anchor frame,
        rigid poses) and runs its re-measurement loop without
        recompiling per iteration (fixed shapes)."""
        from puzzlenet_tpu.assembly import sync_assemble

        model, variables, pieces = model_and_pieces
        r = sync_assemble(model, variables, pieces, num_points=N,
                          sync_iters=2)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        # the re-measurement loop re-selects edges: bookkeeping stays
        # consistent (one entry per kept undirected edge)
        assert len(r.merge_order) == len(r.transforms) \
            == len(r.scores) >= len(pieces) - 1

    def test_measure_refine_identity_equals_score(self, model_and_pieces):
        """_refine_all_jit with identity measurements reproduces the raw
        scoring pass exactly: moved = identity-transformed slots, so the
        forward sees the same pairs and the composition with I is a
        no-op. Locks the composition order (corr @ mat) and the index
        contract (top_m addresses the ORIGINAL moved-slot point order)."""
        import jax.numpy as jnp
        from puzzlenet_tpu.assembly import spanning
        from puzzlenet_tpu.assembly.greedy import _prepare_slots

        model, variables, pieces = model_and_pieces
        stack, k, pairs, idx_i, idx_j, active = _prepare_slots(
            pieces, N, None)
        mats0, s0, tf0, tm0 = spanning._score_all_jit(
            model, variables, stack, active, idx_i, idx_j)
        eye = jnp.broadcast_to(jnp.eye(4), (len(pairs), 4, 4))
        mats1, s1, tf1, tm1 = spanning._refine_all_jit(
            model, variables, stack, active, idx_i, idx_j, eye)
        np.testing.assert_allclose(np.asarray(mats1), np.asarray(mats0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(tm1), np.asarray(tm0))

    def test_measure_refine_compile_stable(self, model_and_pieces):
        """All measure_refine rounds and all three pose-graph assemblers
        share ONE compiled refinement program per pad_to shape."""
        from puzzlenet_tpu.assembly import (ensemble_assemble, spanning,
                                            spanning_assemble,
                                            sync_assemble)

        model, variables, pieces = model_and_pieces
        spanning_assemble(model, variables, pieces, pad_to=4,
                          measure_refine=1)   # warm the 4-slot program
        base = spanning._refine_all_jit._cache_size()
        spanning_assemble(model, variables, pieces, pad_to=4,
                          measure_refine=3)
        sync_assemble(model, variables, pieces, pad_to=4,
                      measure_refine=2)
        ensemble_assemble(model, variables, pieces, pad_to=4,
                          measure_refine=2)
        assert spanning._refine_all_jit._cache_size() == base

    @pytest.mark.parametrize("algo", ["spanning", "sync", "ensemble"])
    def test_measure_refine_contract(self, model_and_pieces, algo):
        """Refined measurements keep every assembler's output contract:
        anchor-frame identity, rigid poses."""
        from puzzlenet_tpu.assembly import (ensemble_assemble,
                                            spanning_assemble,
                                            sync_assemble)

        model, variables, pieces = model_and_pieces
        fn = {"spanning": spanning_assemble, "sync": sync_assemble,
              "ensemble": ensemble_assemble}[algo]
        r = fn(model, variables, pieces, num_points=N, measure_refine=2)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9

    def test_hierarchical_assemble(self, model_and_pieces):
        """Recursive bipartition + verified cluster merge keeps the
        assembler contract above base_k (forces a real cut + merge)."""
        from puzzlenet_tpu.assembly import hierarchical_assemble

        model, variables, pieces = model_and_pieces
        p = pieces[2]
        five = [pieces[0], pieces[1],
                np.concatenate([p[:N // 2], p[:N // 2]]),
                np.concatenate([p[N // 2:], p[N // 2:]]),
                np.concatenate([p[::2], p[::2]])]
        r = hierarchical_assemble(model, variables, five, num_points=N,
                                  pad_to=5, base_k=3)
        assert r.assembled.shape == (N, 3)
        assert len(r.piece_transforms) == 5
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = np.asarray(t)[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        assert np.isfinite(r.scores[0])

    def test_hierarchical_below_base_k_is_ensemble(self, model_and_pieces):
        """At K <= base_k the hierarchy IS the flat ensemble."""
        from puzzlenet_tpu.assembly import (ensemble_assemble,
                                            hierarchical_assemble)

        model, variables, pieces = model_and_pieces
        ra = hierarchical_assemble(model, variables, pieces,
                                   num_points=N, base_k=4)
        rb = ensemble_assemble(model, variables, pieces, num_points=N)
        for ta, tb in zip(ra.piece_transforms, rb.piece_transforms):
            np.testing.assert_allclose(ta, tb, atol=1e-5)

    def test_hierarchical_compile_stable(self, model_and_pieces):
        """Every stage (bipartition measurement, leaves, cluster merge,
        verification, fallback) reuses the shared padded programs."""
        from puzzlenet_tpu.assembly import (hierarchical_assemble,
                                            spanning)
        from puzzlenet_tpu.assembly import sync as sync_mod

        model, variables, pieces = model_and_pieces
        p = pieces[2]
        five = [pieces[0], pieces[1],
                np.concatenate([p[:N // 2], p[:N // 2]]),
                np.concatenate([p[N // 2:], p[N // 2:]]),
                np.concatenate([p[::2], p[::2]])]
        hierarchical_assemble(model, variables, five, pad_to=5, base_k=3)
        base = (spanning._score_all_jit._cache_size()
                + sync_mod._pose_stack_jit._cache_size()
                + spanning._union_fps_jit._cache_size())
        hierarchical_assemble(model, variables, five[:4], pad_to=5,
                              base_k=3)
        after = (spanning._score_all_jit._cache_size()
                 + sync_mod._pose_stack_jit._cache_size()
                 + spanning._union_fps_jit._cache_size())
        assert after == base

    def test_hierarchical_rejects_edge_polish_knobs(self, model_and_pieces):
        from puzzlenet_tpu.assembly import hierarchical_assemble

        model, variables, pieces = model_and_pieces
        with pytest.raises(ValueError):
            hierarchical_assemble(model, variables, pieces, refine_iters=1)

    def test_balanced_mst_cut(self):
        """The cut maximizes balance, then prefers the weakest edge."""
        from puzzlenet_tpu.assembly.hierarchy import _balanced_mst_cut

        # path 0-1-2-3: middle edge gives 2|2, outer edges 1|3
        tree = [(0, 1), (1, 2), (2, 3)]
        w = {(0, 1): 1.0, (1, 2): 5.0, (2, 3): 1.0}
        a, b = _balanced_mst_cut(4, tree, lambda i, j: w[(min(i, j),
                                                          max(i, j))])
        assert sorted(map(len, (a, b))) == [2, 2]
        assert a == [0, 1] and b == [2, 3]

    def test_ensemble_assemble(self, model_and_pieces):
        """Verified hypothesis ensemble keeps the assembler contract
        (anchor frame, rigid poses, output ⊂ posed union) and reports
        its verification cost."""
        from puzzlenet_tpu.assembly import ensemble_assemble
        from puzzlenet_tpu.ops import chamfer_distances
        import jax.numpy as jnp

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces, num_points=N)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        assert len(r.scores) == 1 and np.isfinite(r.scores[0])
        posed = np.concatenate([
            p @ t[:3, :3].T + t[:3, 3]
            for p, t in zip(pieces, r.piece_transforms)])
        _, d_asm = chamfer_distances(jnp.asarray(r.assembled)[None],
                                     jnp.asarray(posed)[None])
        assert float(jnp.max(d_asm)) < 1e-6

    def test_ensemble_compile_stable(self, model_and_pieces):
        """Every ensemble hypothesis reuses the shared scorer/posed
        programs: no new compilations beyond the pad_to-shaped set the
        other assemblers already own."""
        from puzzlenet_tpu.assembly import ensemble_assemble, spanning
        from puzzlenet_tpu.assembly import sync as sync_mod

        model, variables, pieces = model_and_pieces
        # warm the shared programs at this pad_to shape
        ensemble_assemble(model, variables, pieces, pad_to=4)
        base = (spanning._score_all_jit._cache_size()
                + sync_mod._pose_stack_jit._cache_size()
                + spanning._union_fps_jit._cache_size())
        ensemble_assemble(model, variables, pieces + [pieces[0]],
                          pad_to=4)
        after = (spanning._score_all_jit._cache_size()
                 + sync_mod._pose_stack_jit._cache_size()
                 + spanning._union_fps_jit._cache_size())
        assert after == base

    def test_ensemble_repair_iters(self, model_and_pieces):
        """Worst-piece repair keeps the assembler contract (anchor
        identity after re-gauging, rigid poses) and never degrades the
        verification cost (strictly-better acceptance)."""
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        base = ensemble_assemble(model, variables, pieces, num_points=N)
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              repair_iters=3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        # repair accepts only strict verification improvements, but when
        # the ANCHOR piece is repaired the result is re-gauged and
        # honestly re-measured (the net is not rigid-invariant), which
        # can shift the reported cost — so assert finite + loosely
        # bounded rather than strictly monotone.
        assert np.isfinite(r.scores[0])
        assert r.scores[0] <= base.scores[0] + 1.0

    def test_ensemble_repair_compile_stable(self, model_and_pieces):
        """Repair proposals reuse the shared posed-scoring program — no
        new compilations."""
        from puzzlenet_tpu.assembly import ensemble_assemble, spanning
        from puzzlenet_tpu.assembly import sync as sync_mod

        model, variables, pieces = model_and_pieces
        ensemble_assemble(model, variables, pieces, pad_to=4)
        base = (spanning._score_all_jit._cache_size()
                + sync_mod._pose_stack_jit._cache_size()
                + spanning._union_fps_jit._cache_size())
        ensemble_assemble(model, variables, pieces, pad_to=4,
                          repair_iters=2)
        after = (spanning._score_all_jit._cache_size()
                 + sync_mod._pose_stack_jit._cache_size()
                 + spanning._union_fps_jit._cache_size())
        assert after == base

    def test_ensemble_rejects_edge_polish_knobs(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        with pytest.raises(ValueError):
            ensemble_assemble(model, variables, pieces, refine_iters=1)
        with pytest.raises(ValueError):
            ensemble_assemble(model, variables, pieces, icp_iters=1)

    def test_ensemble_single_piece(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces[:1], num_points=N)
        np.testing.assert_allclose(r.assembled, pieces[0], atol=1e-6)

    def test_polish_recovers_perturbation(self):
        """Joint boundary-contact polish pulls small per-piece pose
        perturbations back to ground truth (anchor fixed), using exact
        shared contact sets — the geometry-only contract of
        assembly/polish.py."""
        from puzzlenet_tpu.assembly import polish_poses
        from puzzlenet_tpu.semath import se3
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        k, n, m = 3, 64, 16
        # shared contact curves: B01 rows 0..15 of pieces 0 and 1,
        # B02 rows 16..31 of pieces 0 and 2, B12 rows 32..47 of 1 and 2
        stack = rng.standard_normal((k, n, 3)).astype(np.float32)
        curves = {(0, 1): rng.standard_normal((m, 3)).astype(np.float32),
                  (0, 2): rng.standard_normal((m, 3)).astype(np.float32),
                  (1, 2): rng.standard_normal((m, 3)).astype(np.float32)}
        rows = {(0, 1): (slice(0, 16), slice(0, 16)),
                (0, 2): (slice(16, 32), slice(16, 32)),
                (1, 2): (slice(32, 48), slice(32, 48))}
        for (i, j), c in curves.items():
            ri, rj = rows[(i, j)]
            stack[i][ri] = c
            stack[j][rj] = c
        pairs = [(i, j) for i in range(k) for j in range(k) if i != j]
        pos = {ij: p for p, ij in enumerate(pairs)}
        top_f = np.zeros((len(pairs), m), np.int64)
        top_m = np.zeros((len(pairs), m), np.int64)
        kept = {}
        for (i, j), c in curves.items():
            p = pos[(i, j)]
            ri, rj = rows[(i, j)]
            top_f[p] = np.arange(n)[ri]
            top_m[p] = np.arange(n)[rj]
            kept[(i, j)] = (p, False, 0.01)
        # GT poses = identity; perturb pieces 1 and 2 by small twists
        tw = np.zeros((k, 6), np.float32)
        tw[1] = 0.08 * rng.standard_normal(6)
        tw[2] = 0.08 * rng.standard_normal(6)
        poses = [np.asarray(p) for p in se3.exp(jnp.asarray(tw))]
        err0 = max(np.abs(p - np.eye(4)).max() for p in poses[1:])
        refined = polish_poses(stack, poses, kept, top_f, top_m,
                               iters=300, m=m)
        np.testing.assert_array_equal(refined[0], poses[0])  # anchor
        err1 = max(np.abs(p - np.eye(4)).max() for p in refined[1:])
        assert err1 < 0.2 * err0, (err0, err1)

    def test_polish_empty_graph_is_identity(self):
        """No kept edges (all pad weights zero) -> poses unchanged."""
        from puzzlenet_tpu.assembly import polish_poses

        rng = np.random.default_rng(4)
        stack = rng.standard_normal((3, 64, 3)).astype(np.float32)
        poses = [np.eye(4, dtype=np.float32) for _ in range(3)]
        poses[1][ :3, 3] = [0.3, 0.0, 0.0]
        refined = polish_poses(stack, poses, {}, np.zeros((6, 16), int),
                               np.zeros((6, 16), int), iters=10, m=16)
        for a, b in zip(refined, poses):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_sync_polish_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import sync_assemble

        model, variables, pieces = model_and_pieces
        r = sync_assemble(model, variables, pieces, num_points=N,
                          polish_iters=5)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)

    def test_ensemble_polish_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              polish_iters=5)
        assert r.assembled.shape == (N, 3)
        assert np.isfinite(r.scores[0])

    def test_ensemble_include_greedy_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              include_greedy=True)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)

    def test_icp_align_recovers_rigid_transform(self):
        """icp_align recovers a moderate known rigid motion between two
        noisy samplings of the same surface patch."""
        from scipy.spatial.transform import Rotation

        from puzzlenet_tpu.assembly import icp_align

        rng = np.random.default_rng(7)
        # curved patch (paraboloid) — full-rank geometry, no symmetry
        xy = rng.uniform(-1, 1, size=(128, 2))
        dst = np.concatenate(
            [xy, (0.7 * xy[:, :1] ** 2 + 0.3 * xy[:, 1:] ** 2)], axis=1
        ).astype(np.float32)
        R = Rotation.from_rotvec([0.12, -0.2, 0.15]).as_matrix()
        t = np.asarray([0.05, -0.08, 0.1])
        # src = inverse-motion applied to an independent noisy sampling
        src = ((dst + rng.normal(scale=5e-3, size=dst.shape)) - t) @ R
        mat = np.asarray(icp_align(src.astype(np.float32), dst, iters=8))
        np.testing.assert_allclose(mat[:3, :3], R, atol=0.02)
        np.testing.assert_allclose(mat[:3, 3], t, atol=0.02)
        Rr = mat[:3, :3]
        np.testing.assert_allclose(Rr.T @ Rr, np.eye(3), atol=1e-5)
        assert np.linalg.det(Rr) > 0.99

    def test_icp_iters(self, model_and_pieces):
        """Boundary-ICP polish composes valid rigid transforms and adds
        exactly one extra compiled program across rounds."""
        from puzzlenet_tpu.assembly import greedy

        model, variables, pieces = model_and_pieces
        base = greedy._icp_refine_jit._cache_size()
        result = greedy_assemble(model, variables, pieces, pad_to=4,
                                 icp_iters=4)
        assert greedy._icp_refine_jit._cache_size() - base <= 1
        assert len(result.merge_order) == 2
        for g in result.transforms:
            R = g[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
            np.testing.assert_allclose(g[3], [0, 0, 0, 1], atol=1e-6)

    def test_tta_zero_mag_is_identity(self, model_and_pieces):
        """With tta_mag=0 every gauge is the identity, so the gauged
        re-measurement reproduces the base measurement exactly and the
        min-merge changes nothing."""
        import jax.numpy as jnp
        from puzzlenet_tpu.assembly.greedy import _prepare_slots
        from puzzlenet_tpu.assembly.spanning import measure_all_pairs

        model, variables, pieces = model_and_pieces
        stack, k, _, idx_i, idx_j, active = _prepare_slots(pieces, N,
                                                           pad_to=None)
        m0, s0, tf0, tm0 = measure_all_pairs(model, variables, stack,
                                             active, idx_i, idx_j)
        m1, s1, tf1, tm1 = measure_all_pairs(model, variables, stack,
                                             active, idx_i, idx_j,
                                             tta_gauges=2, tta_mag=0.0)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   atol=1e-4)

    def test_tta_scores_never_worse(self, model_and_pieces):
        """TTA is a min-merge over presentations: per-pair scores can
        only improve, and the kept mats stay rigid."""
        from puzzlenet_tpu.assembly.greedy import _prepare_slots
        from puzzlenet_tpu.assembly.spanning import measure_all_pairs

        model, variables, pieces = model_and_pieces
        stack, k, _, idx_i, idx_j, active = _prepare_slots(pieces, N,
                                                           pad_to=4)
        _, s0, _, _ = measure_all_pairs(model, variables, stack, active,
                                        idx_i, idx_j)
        m1, s1, _, _ = measure_all_pairs(model, variables, stack, active,
                                         idx_i, idx_j, tta_gauges=3)
        s0, s1 = np.asarray(s0), np.asarray(s1)
        finite = np.isfinite(s0)
        assert (s1[finite] <= s0[finite] + 1e-6).all()
        assert np.isinf(s1[~finite]).all()
        for M in np.asarray(m1)[finite]:
            R = M[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            np.testing.assert_allclose(M[3], [0, 0, 0, 1], atol=1e-5)

    def test_ensemble_tta_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              tta_gauges=1)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)

    def test_hierarchical_beam_cuts(self, model_and_pieces):
        """Beam over the top-2 MST cuts keeps the contract and, since it
        verifies every beam with the same metric, can only match or beat
        the single-cut hierarchy's reported cost."""
        from puzzlenet_tpu.assembly import hierarchical_assemble

        model, variables, pieces = model_and_pieces
        quads = pieces + [pieces[0]]
        base = hierarchical_assemble(model, variables, quads,
                                     num_points=N, pad_to=4, base_k=2,
                                     fallback=False)
        r = hierarchical_assemble(model, variables, quads, num_points=N,
                                  pad_to=4, base_k=2, beam_cuts=2,
                                  fallback=False)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        assert r.scores[0] <= base.scores[0] + 1e-6

    def test_ranked_mst_cuts(self):
        from puzzlenet_tpu.assembly.hierarchy import _ranked_mst_cuts

        # path graph 0-1-2-3 with equal weights: the balanced cut drops
        # edge (1, 2); ranking must lead with it
        tree = [(0, 1), (1, 2), (2, 3)]
        cuts = _ranked_mst_cuts(4, tree, lambda i, j: 1.0)
        assert cuts[0] == ([0, 1], [2, 3])
        assert len(cuts) == 3

    def test_complement_corrections_shapes(self, model_and_pieces):
        """Complement measurement contract: one correction + fit score per
        slot, rigid corrections, +inf score on inactive slots."""
        import jax.numpy as jnp
        from puzzlenet_tpu.assembly.complement import (
            complement_corrections)
        from puzzlenet_tpu.assembly.greedy import _prepare_slots

        model, variables, pieces = model_and_pieces
        stack, k, _, _, _, active = _prepare_slots(pieces, N, pad_to=4)
        poses = [np.eye(4, dtype=np.float32)] * k
        corr, scores = complement_corrections(model, variables, stack,
                                              poses, active)
        assert corr.shape == (4, 4, 4) and scores.shape == (4,)
        for i in range(k):
            R = corr[i][:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.isfinite(scores[i])
        assert np.isinf(scores[k:]).all()

    def test_ensemble_cc_iters(self, model_and_pieces):
        """cc refinement keeps the assembler contract (anchor identity,
        rigid poses) and only ever accepts verified improvements."""
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        base = ensemble_assemble(model, variables, pieces, num_points=N)
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              cc_iters=2)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
        for t in r.piece_transforms:
            R = t[:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9
        # strict-improvement acceptance on the SAME verification metric:
        # cc can only lower the reported cost
        assert np.isfinite(r.scores[0])
        assert r.scores[0] <= base.scores[0] + 1e-6

    def test_cc_compile_stable(self, model_and_pieces):
        """The complement-measurement program is ONE fixed-shape compile
        at a given pad_to: a second call (different K, same padding)
        reuses it."""
        from puzzlenet_tpu.assembly import complement, ensemble_assemble

        model, variables, pieces = model_and_pieces
        ensemble_assemble(model, variables, pieces, pad_to=4, cc_iters=1)
        base = complement._complement_measure_jit._cache_size()
        ensemble_assemble(model, variables, pieces + [pieces[0]],
                          pad_to=4, cc_iters=1)
        assert complement._complement_measure_jit._cache_size() == base

    def test_hierarchical_cc_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import hierarchical_assemble

        model, variables, pieces = model_and_pieces
        r = hierarchical_assemble(model, variables,
                                  pieces + [pieces[0]], num_points=N,
                                  pad_to=4, base_k=2, cc_iters=1)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)

    def test_fragment_and_scatter(self):
        from puzzlenet_tpu.assembly import fragment_cloud, scatter_pieces

        rng = np.random.default_rng(0)
        u = rng.standard_normal((4 * N, 3)).astype(np.float32)
        pieces = fragment_cloud(u, 4, npoint=N // 2, rng=rng)
        assert len(pieces) == 4
        assert all(p.shape == (N // 2, 3) for p in pieces)
        scattered, gts = scatter_pieces(pieces, rng)
        assert len(scattered) == 4 and len(gts) == 4
        np.testing.assert_allclose(gts[0], np.eye(4))
        # scattered piece = igt . piece (row-vector convention)
        want = pieces[1] @ gts[1][:3, :3].T + gts[1][:3, 3]
        np.testing.assert_allclose(scattered[1], want, atol=1e-5)

    def test_fragment_pads_undersized_pieces(self):
        """k * npoint close to the cloud size forces the pad path: every
        fragment still comes back exactly [npoint, 3]."""
        from puzzlenet_tpu.assembly import fragment_cloud

        rng = np.random.default_rng(3)
        u = rng.standard_normal((4 * N + 40, 3)).astype(np.float32)
        pieces = fragment_cloud(u, 4, npoint=N, rng=rng)
        assert len(pieces) == 4
        assert all(p.shape == (N, 3) for p in pieces)
        assert all(np.isfinite(p).all() for p in pieces)

    @pytest.mark.parametrize("cut", ["sphere", "cylinder", "cone"])
    def test_fragment_curved_cuts(self, cut):
        """Curved-cut fragmentation (the vase_cone/-cyl/-sphere
        categories' assembly analogue): fragments are disjoint subsets
        of the source cloud with the full [npoint, 3] contract, and no
        two fragments share a point (the splitters partition)."""
        from puzzlenet_tpu.assembly import fragment_cloud

        rng = np.random.default_rng(7)
        u = rng.standard_normal((4 * N, 3)).astype(np.float32)
        pieces = fragment_cloud(u, 4, npoint=N // 2, rng=rng, cut=cut)
        assert len(pieces) == 4
        assert all(p.shape == (N // 2, 3) for p in pieces)
        src = {tuple(np.round(x, 5)) for x in u}
        seen = set()
        for p in pieces:
            keys = {tuple(np.round(x, 5)) for x in p}
            assert keys <= src
            assert not (keys & seen)           # disjoint fragments
            seen |= keys

    def test_fragment_degenerate_duplicate_cloud(self):
        """A cloud of (near-)duplicated coordinates defeats every plane
        cut AND puts all points on one side of the median — the fallback
        must still return k non-empty [npoint, 3] fragments instead of
        crashing in the resample padding (regression: rng.integers(0, 0))."""
        from puzzlenet_tpu.assembly import fragment_cloud

        rng = np.random.default_rng(5)
        u = np.ones((300, 3), np.float32)       # all points identical
        pieces = fragment_cloud(u, 3, npoint=64, rng=rng)
        assert len(pieces) == 3
        assert all(p.shape == (64, 3) for p in pieces)


class TestViz:
    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        p = tmp_path / "out.ply"
        viz.save_ply(str(p), pts)
        mesh = plyread(str(p))
        np.testing.assert_allclose(mesh.vertex_array, pts, rtol=1e-6)

    def test_pts_format(self, tmp_path):
        pts = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        p = tmp_path / "out.pts"
        viz.save_pts(str(p), pts)
        back = np.loadtxt(str(p))
        np.testing.assert_allclose(back, pts)


class TestDirectionFusion:
    """spanning.symmetrize_measurements: direction-consistency fusion of
    the two directional measurements of each unordered pair (zero extra
    forwards; see the probe's chosen-vs-oracle direction gap)."""

    @staticmethod
    def _tables(k):
        import itertools
        pairs = [(i, j) for i, j in itertools.product(range(k), range(k))
                 if i != j]
        return pairs, {ij: p for p, ij in enumerate(pairs)}

    @staticmethod
    def _rt(rotvec_deg, t):
        from scipy.spatial.transform import Rotation
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = Rotation.from_rotvec(
            np.deg2rad(np.asarray(rotvec_deg))).as_matrix()
        m[:3, 3] = t
        return m

    def test_antisymmetric_noise_cancels_exactly(self):
        """m_ij = T E(+w), inv(m_ji) = T E(-w): the chordal mean of the
        rotations is exactly R_T (the symmetric part projects to I), and
        the translation mean cancels the +-d offsets."""
        from puzzlenet_tpu.assembly.spanning import symmetrize_measurements

        _, pos = self._tables(2)
        T = self._rt([10.0, 20.0, 5.0], [0.2, -0.1, 0.3])
        E = self._rt([3.0, -2.0, 1.0], [0.0, 0.0, 0.0])   # pure rotation
        d = np.asarray([0.02, 0.01, -0.03], np.float32)
        m_ij = (T @ E).astype(np.float32)
        m_ij[:3, 3] += d
        alt = (T @ np.linalg.inv(E)).astype(np.float32)
        alt[:3, 3] -= d
        mats = np.stack([m_ij, np.linalg.inv(alt).astype(np.float32)])
        scores = np.asarray([0.02, 0.05], np.float32)
        fused, fscores, cons = symmetrize_measurements(
            mats, scores, pos, 2, dir_fuse=20.0)
        np.testing.assert_allclose(fused[0], T, atol=1e-5)
        np.testing.assert_allclose(fused[1], np.linalg.inv(T), atol=1e-5)
        # both directions get the better score
        np.testing.assert_allclose(fscores, [0.02, 0.02], atol=1e-7)
        # composition residual reported (2x the 3.7 deg perturbation + 2d)
        assert np.isfinite(cons[0]) and cons[0] == cons[1]
        # inputs untouched
        np.testing.assert_allclose(mats[0], m_ij)

    def test_inconsistent_pair_passes_through(self):
        from puzzlenet_tpu.assembly.spanning import symmetrize_measurements

        _, pos = self._tables(2)
        T = self._rt([10.0, 20.0, 5.0], [0.2, -0.1, 0.3])
        bad = self._rt([45.0, 0.0, 0.0], [0.0, 0.0, 0.0])
        mats = np.stack([T, np.linalg.inv(T @ bad).astype(np.float32)])
        scores = np.asarray([0.02, 0.05], np.float32)
        fused, fscores, _ = symmetrize_measurements(
            mats, scores, pos, 2, dir_fuse=20.0)
        np.testing.assert_allclose(fused, mats)
        np.testing.assert_allclose(fscores, scores)

    def test_cons_w_penalizes_inconsistent_pairs(self):
        """With cons_w, an inconsistent pair's scores rise by
        cons_w x (rot residual rad + trans residual) in BOTH directions,
        so edge selection ranks it below a consistent pair with an equal
        fit score."""
        from puzzlenet_tpu.assembly.spanning import symmetrize_measurements

        _, pos = self._tables(3)
        T = self._rt([10.0, 20.0, 5.0], [0.2, -0.1, 0.3])
        bad = self._rt([40.0, 0.0, 0.0], [0.0, 0.0, 0.0])
        # pair (0,1): perfectly consistent; pair (0,2): 40 deg off;
        # pair (1,2): consistent
        mats = np.zeros((6, 4, 4), np.float32)
        p01, p10 = pos[(0, 1)], pos[(1, 0)]
        p02, p20 = pos[(0, 2)], pos[(2, 0)]
        p12, p21 = pos[(1, 2)], pos[(2, 1)]
        mats[p01], mats[p10] = T, np.linalg.inv(T)
        mats[p02], mats[p20] = T, np.linalg.inv(T @ bad)
        mats[p12], mats[p21] = T, np.linalg.inv(T)
        scores = np.full(6, 0.02, np.float32)
        _, fscores, cons = symmetrize_measurements(
            mats, scores, pos, 3, dir_fuse=20.0, cons_w=0.1)
        assert fscores[p02] > fscores[p01]
        assert fscores[p20] > fscores[p10]
        np.testing.assert_allclose(fscores[p02] - 0.02,
                                   0.1 * cons[p02], rtol=1e-4)
        assert cons[p01] < 1e-5 and cons[p02] > 0.5

    def test_inactive_pairs_untouched(self):
        from puzzlenet_tpu.assembly.spanning import symmetrize_measurements

        _, pos = self._tables(3)
        T = self._rt([10.0, 0.0, 0.0], [0.1, 0.0, 0.0])
        mats = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
        p01, p10 = pos[(0, 1)], pos[(1, 0)]
        mats[p01], mats[p10] = T, np.linalg.inv(T)
        scores = np.full(6, np.inf, np.float32)
        scores[p01], scores[p10] = 0.02, 0.05
        fused, fscores, cons = symmetrize_measurements(
            mats, scores, pos, 3, dir_fuse=20.0, cons_w=0.1)
        # slot 2 is padding: every pair touching it keeps inf + identity
        for ij in ((0, 2), (2, 0), (1, 2), (2, 1)):
            assert np.isinf(fscores[pos[ij]])
            assert np.isinf(cons[pos[ij]])
            np.testing.assert_allclose(fused[pos[ij]], np.eye(4))

    def test_fused_rotations_stay_rigid(self):
        """Random noisy-but-consistent pairs: fused blocks are exact
        rotations (SVD projection), translations finite."""
        from puzzlenet_tpu.assembly.spanning import symmetrize_measurements

        rng = np.random.default_rng(3)
        _, pos = self._tables(2)
        for _ in range(10):
            T = self._rt(rng.normal(scale=30.0, size=3),
                         rng.normal(scale=0.3, size=3))
            E1 = self._rt(rng.normal(scale=3.0, size=3),
                          rng.normal(scale=0.02, size=3))
            E2 = self._rt(rng.normal(scale=3.0, size=3),
                          rng.normal(scale=0.02, size=3))
            mats = np.stack([
                (T @ E1).astype(np.float32),
                np.linalg.inv(T @ E2).astype(np.float32)])
            scores = np.asarray([0.02, 0.03], np.float32)
            fused, _, _ = symmetrize_measurements(mats, scores, pos, 2,
                                                  dir_fuse=25.0)
            R = fused[0][:3, :3]
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) > 0.99
            np.testing.assert_allclose(fused[1],
                                       np.linalg.inv(fused[0]), atol=1e-5)

    def test_ensemble_dir_fuse_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import ensemble_assemble

        model, variables, pieces = model_and_pieces
        r = ensemble_assemble(model, variables, pieces, num_points=N,
                              dir_fuse=20.0, cons_w=0.01)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)

    def test_hierarchical_dir_fuse_smoke(self, model_and_pieces):
        from puzzlenet_tpu.assembly import hierarchical_assemble

        model, variables, pieces = model_and_pieces
        quads = pieces + [pieces[0]]
        r = hierarchical_assemble(model, variables, quads, num_points=N,
                                  pad_to=4, base_k=2, dir_fuse=20.0)
        assert r.assembled.shape == (N, 3)
        np.testing.assert_allclose(r.piece_transforms[0], np.eye(4),
                                   atol=1e-4)
