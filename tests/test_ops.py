"""ops unit tests vs numpy oracles (SURVEY.md §4: FPS/kNN/gather vs numpy,
chamfer oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puzzlenet_tpu import ops


def _np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def _np_fps(xyz, npoint, start=0):
    """Independent numpy transcription of iterated max-min FPS
    (dataset.py:1147-1163 semantics, deterministic seed)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        dist = np.full(N, np.inf)
        far = start
        for i in range(npoint):
            out[b, i] = far
            d = ((xyz[b] - xyz[b, far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
    return out


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 128, 3)).astype(np.float32)


class TestPointOps:
    def test_square_distance(self, clouds):
        a = jnp.asarray(clouds)
        b = jnp.asarray(clouds[:, ::-1])
        d = ops.square_distance(a, b)
        np.testing.assert_allclose(
            np.asarray(d), _np_square_distance(clouds, clouds[:, ::-1]),
            rtol=1e-4, atol=1e-4)

    def test_index_points_2d(self, clouds):
        idx = jnp.asarray([[0, 5, 7], [1, 2, 3]], dtype=jnp.int32)
        got = ops.index_points(jnp.asarray(clouds), idx)
        want = np.stack([clouds[0, [0, 5, 7]], clouds[1, [1, 2, 3]]])
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_index_points_3d(self, clouds):
        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, 128, size=(2, 4, 5)),
            dtype=jnp.int32)
        got = ops.index_points(jnp.asarray(clouds), idx)
        want = np.stack([clouds[b][np.asarray(idx)[b]] for b in range(2)])
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_fps_matches_numpy(self, clouds):
        idx = ops.farthest_point_sample(jnp.asarray(clouds), 32,
                                        use_pallas=False)
        np.testing.assert_array_equal(np.asarray(idx), _np_fps(clouds, 32))

    def test_fps_start_idx(self, clouds):
        start = jnp.asarray([3, 9], dtype=jnp.int32)
        idx = ops.farthest_point_sample(jnp.asarray(clouds), 16,
                                        start_idx=start, use_pallas=False)
        assert int(idx[0, 0]) == 3 and int(idx[1, 0]) == 9
        np.testing.assert_array_equal(np.asarray(idx[0]),
                                      _np_fps(clouds[:1], 16, start=3)[0])

    def test_fps_masked_never_selects_invalid(self, clouds):
        mask = np.ones((2, 128), bool)
        mask[:, 64:] = False
        idx = ops.farthest_point_sample(
            jnp.asarray(clouds), 32, valid_mask=jnp.asarray(mask),
            use_pallas=False)
        assert int(np.asarray(idx).max()) < 64
        # masked FPS over the valid prefix == plain FPS on the prefix
        ref = ops.farthest_point_sample(jnp.asarray(clouds[:, :64]), 32,
                                        use_pallas=False)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))

    def test_knn_sorted_and_correct(self, clouds):
        q = jnp.asarray(clouds[:, :16])
        idx = ops.knn_indices(q, jnp.asarray(clouds), 8)
        d = _np_square_distance(clouds[:, :16], clouds)
        want = np.argsort(d, axis=-1, kind="stable")[:, :, :8]
        got_d = np.take_along_axis(d, np.asarray(idx, np.int64), axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)

    def test_ball_query_contract(self, clouds):
        xyz = jnp.asarray(clouds)
        new_xyz = xyz[:, :8]
        r, k = 0.9, 16
        idx = np.asarray(ops.ball_query(r, k, xyz, new_xyz))
        d = _np_square_distance(clouds[:, :8], clouds)
        for b in range(2):
            for s in range(8):
                inside = np.where(d[b, s] <= r * r)[0]
                want = inside[:k]
                got = idx[b, s]
                if len(want) == 0:
                    continue
                # first len(want) entries are the in-radius points in order,
                # rest backfilled with the first
                np.testing.assert_array_equal(got[:len(want)], want)
                if len(want) < k:
                    assert (got[len(want):] == want[0]).all()

    def test_sample_and_group_shapes(self, clouds):
        xyz = jnp.asarray(clouds)
        feats = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 128, 10)).astype(
                np.float32))
        new_xyz, grouped = ops.sample_and_group(32, 0, 8, xyz, feats, knn=True)
        assert new_xyz.shape == (2, 32, 3)
        assert grouped.shape == (2, 32, 8, 13)
        # relative coords of each group's own centroid are ~0 (centroid is
        # its own nearest neighbor)
        rel = np.asarray(grouped)[..., :3]
        assert np.abs(rel).min(axis=2).max() < 1e-6

    def test_sample_and_group_all(self, clouds):
        xyz = jnp.asarray(clouds)
        new_xyz, grouped = ops.sample_and_group_all(xyz, None)
        assert new_xyz.shape == (2, 1, 3)
        np.testing.assert_array_equal(np.asarray(grouped[:, 0]), clouds)


class TestChamfer:
    def test_matches_bruteforce(self, clouds):
        a = jnp.asarray(clouds)
        b = jnp.asarray(clouds[:, ::2] + 0.1)
        d_b, d_a = ops.chamfer_distances(a, b)
        D = _np_square_distance(clouds, clouds[:, ::2] + 0.1)
        np.testing.assert_allclose(np.asarray(d_b), D.min(1), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_a), D.min(2), rtol=1e-4,
                                   atol=1e-5)

    def test_identical_clouds_zero(self, clouds):
        a = jnp.asarray(clouds)
        loss = ops.chamfer_loss(a, a)
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)

    def test_grad_flows(self, clouds):
        a = jnp.asarray(clouds)

        def f(x):
            return jnp.sum(ops.chamfer_loss(x, a + 0.5))

        g = jax.grad(f)(a)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestTournamentArgReduce:
    """ops/lanered.py tournament arg-reductions vs jnp (used inside the
    FPS and fused-SG Pallas kernels' per-iteration selection)."""

    @pytest.mark.parametrize("n", [1024, 512, 256, 128, 96])
    def test_argmin_matches(self, n):
        from puzzlenet_tpu.ops.lanered import tournament_argmin
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((64, n)), jnp.float32)
        got = np.asarray(tournament_argmin(v))[:, 0]
        np.testing.assert_array_equal(got, np.argmin(np.asarray(v), axis=1))

    @pytest.mark.parametrize("n", [1024, 512, 128])
    def test_argmax_matches(self, n):
        from puzzlenet_tpu.ops.lanered import tournament_argmax
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.standard_normal((32, n)), jnp.float32)
        got = np.asarray(tournament_argmax(v))[:, 0]
        np.testing.assert_array_equal(got, np.argmax(np.asarray(v), axis=1))

    def test_tie_selects_equal_value(self):
        """On exact ties the tournament may pick a different index than
        jnp.argmin, but always one holding the minimum value."""
        from puzzlenet_tpu.ops.lanered import tournament_argmin
        v = np.ones((8, 1024), np.float32)
        v[:, 7] = -3.0
        v[:, 700] = -3.0
        idx = np.asarray(tournament_argmin(jnp.asarray(v)))[:, 0]
        assert np.all(np.isin(idx, [7, 700]))

    def test_iterative_masking_chain(self):
        """32-step argmin+mask chain (the SG kernel's selection loop)
        recovers the exact sorted top-32 set."""
        from puzzlenet_tpu.ops.lanered import tournament_argmin
        rng = np.random.default_rng(2)
        v = rng.standard_normal((16, 512)).astype(np.float32)
        d = jnp.asarray(v)
        got = []
        for _ in range(32):
            sel = tournament_argmin(d)
            got.append(np.asarray(sel)[:, 0])
            lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            d = jnp.where(lane == sel, jnp.inf, d)
        got = np.stack(got, 1)
        want = np.argsort(v, axis=1)[:, :32]
        np.testing.assert_array_equal(np.sort(got, 1), np.sort(want, 1))


class TestSortedTopk:
    """ops/lanered.py sorted-column top-k (the fused-SG kernel's selection
    phase): set-equality vs numpy argsort on distance-like inputs."""

    def test_sorting_networks_zero_one_principle(self):
        from puzzlenet_tpu.ops.lanered import _NETWORKS
        for g, net in _NETWORKS.items():
            for bits in range(2 ** g):
                v = [(bits >> i) & 1 for i in range(g)]
                for a, b in net:
                    if v[a] > v[b]:
                        v[a], v[b] = v[b], v[a]
                assert v == sorted(v), (g, bits)

    @pytest.mark.parametrize("n,k", [(1024, 32), (512, 32), (256, 8),
                                     (1024, 1)])
    def test_matches_argsort_set(self, n, k):
        from puzzlenet_tpu.ops.lanered import (sorted_topk,
                                               sorted_topk_supported)
        assert sorted_topk_supported(n)
        rng = np.random.default_rng(3)
        v = (rng.standard_normal((48, n)) ** 2).astype(np.float32)
        got = np.sort(np.asarray(sorted_topk(jnp.asarray(v), k)), axis=1)
        want = np.sort(np.argsort(v, axis=1)[:, :k], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_column_exhaustion(self):
        """All k winners concentrated in one lane's cross-chunk column:
        the column drains to the sentinel and extraction proceeds to the
        next-best lanes without repeats."""
        from puzzlenet_tpu.ops.lanered import sorted_topk
        n, g = 1024, 8
        L = n // g
        v = np.full((4, n), 1e6, np.float32)
        # lane 5 of every chunk: tiny values (8 of them); rest of top-32
        # spread over chunk 0
        for gi in range(g):
            v[:, gi * L + 5] = 1.0 + gi
        v[:, 32:56] = 100.0 + np.arange(24)
        got = np.sort(np.asarray(sorted_topk(jnp.asarray(v), 32)), axis=1)
        want = np.sort(np.argsort(v, axis=1)[:, :32], axis=1)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("n,nsteps", [(1024, 8), (1024, 7), (512, 4),
                                          (256, 3)])
    def test_pair_extraction_bit_identical(self, n, nsteps):
        """topk_stream_next2 (two-winners-per-reduce) returns the exact
        winner sequence of the serial stream — same values, same order —
        including interleaved incremental draws (the pipe kernel's
        consumption pattern)."""
        from jax import lax

        from puzzlenet_tpu.ops.lanered import (topk_stream_init,
                                               topk_stream_next,
                                               topk_stream_next2)
        rng = np.random.default_rng(7)
        v = (rng.standard_normal((24, n)) ** 2).astype(np.float32)
        cols, meta = topk_stream_init(jnp.asarray(v))
        lanes = lax.broadcasted_iota(jnp.int32, (24, meta[1]), 1)
        c1, c2 = cols, cols
        for _ in range(3):   # three incremental blocks, like the kernel
            c1, w1 = topk_stream_next(c1, lanes, meta, nsteps)
            c2, w2 = topk_stream_next2(c2, lanes, meta, nsteps)
            np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    @pytest.mark.parametrize("n,nsteps", [(1024, 8), (1024, 7), (512, 4)])
    def test_pair_extraction_T_bit_identical(self, n, nsteps):
        """topk_stream_next2_T matches the serial transposed stream
        exactly across interleaved incremental draws."""
        from jax import lax

        from puzzlenet_tpu.ops.lanered import (topk_stream_init_T,
                                               topk_stream_next_T,
                                               topk_stream_next2_T)
        rng = np.random.default_rng(9)
        v = (rng.standard_normal((24, n)) ** 2).astype(np.float32)
        vT = jnp.asarray(v.T.copy())
        cols, meta = topk_stream_init_T(vT)
        subs = lax.broadcasted_iota(jnp.int32, (meta[1], 24), 0)
        c1, c2 = cols, cols
        for _ in range(3):
            c1, w1 = topk_stream_next_T(c1, subs, meta, nsteps)
            c2, w2 = topk_stream_next2_T(c2, subs, meta, nsteps)
            np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_pair_extraction_same_lane_winners(self):
        """Both winners of a pair round living in the SAME lane's sorted
        column (the shift-by-2 path) drain correctly with no repeats."""
        from jax import lax

        from puzzlenet_tpu.ops.lanered import (topk_stream_init,
                                               topk_stream_next2)
        n, g = 1024, 8
        L = n // g
        v = np.full((4, n), 1e6, np.float32)
        # lane 3's cross-chunk column holds the 8 smallest values, so
        # every pair round's two winners share a lane until it drains
        for gi in range(g):
            v[:, gi * L + 3] = 1.0 + gi
        v[:, 40:64] = 100.0 + np.arange(24)
        cols, meta = topk_stream_init(jnp.asarray(v))
        lanes = lax.broadcasted_iota(jnp.int32, (4, meta[1]), 1)
        _, w = topk_stream_next2(cols, lanes, meta, 32)
        got = np.sort(np.asarray(w), axis=1)
        want = np.sort(np.argsort(v, axis=1)[:, :32], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_in_kernel_matches_unfused_knn(self):
        """End to end through the SG selection contract: sorted_topk on a
        squared-distance matrix selects the same neighbor set as
        knn_indices."""
        from puzzlenet_tpu.ops.lanered import sorted_topk
        from puzzlenet_tpu.ops.pointops import knn_indices, square_distance
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
        xyz = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
        want = np.sort(np.asarray(knn_indices(q, xyz, 32)), axis=-1)
        # sorted_topk's int32-bitcast ordering requires d >= 0; the matmul
        # expansion can round slightly negative (the SG kernel's in-VMEM
        # distances are computed exactly and cannot)
        d = jnp.maximum(square_distance(q, xyz), 0.0)
        got = np.stack([np.asarray(sorted_topk(d[b], 32))
                        for b in range(2)])
        np.testing.assert_array_equal(np.sort(got, axis=-1), want)


class TestFPSPrefixStability:
    """models/encoder.py stage 2 relies on FPS prefix-stability:
    re-running FPS over the FPS-ordered subset (same index-0 seed)
    reproduces the identity ordering, so x2 = x1[:, :256]."""

    def test_fps_of_fps_is_prefix(self):
        from puzzlenet_tpu.ops import farthest_point_sample, index_points
        rng = np.random.default_rng(7)
        xyz = jnp.asarray(rng.normal(size=(3, 256, 3)).astype(np.float32))
        idx1 = farthest_point_sample(xyz, 128)
        x1 = index_points(xyz, idx1)
        idx2 = np.asarray(farthest_point_sample(x1, 64))
        np.testing.assert_array_equal(
            idx2, np.broadcast_to(np.arange(64), (3, 64)))


class TestFPSPallasInterpret:
    def test_interpret_selects_valid_farthest_set(self, monkeypatch):
        """The Pallas FPS kernel in interpret mode on CPU returns a
        distinct, valid-index selection that matches the numpy FPS oracle
        (same start, same greedy argmax chain)."""
        import puzzlenet_tpu.ops.fps_pallas as fp

        monkeypatch.setattr(fp, "_INTERPRET", True)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 512, 3)).astype(np.float32)
        idx = np.asarray(fp.fps_pallas(jnp.asarray(x), 64,
                                       jnp.zeros((2,), jnp.int32)))
        for b in range(2):
            assert len(set(idx[b])) == 64
            ref = _np_fps(x[b:b + 1], 64, start=0)[0]
            np.testing.assert_array_equal(np.sort(idx[b]), np.sort(ref))
