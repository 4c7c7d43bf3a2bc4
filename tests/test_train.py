"""Training harness tests: loss modes, schedule, overfit-one-batch,
end-to-end smoke via the CLI, checkpoint save/restore, sharded step on the
8-device CPU mesh (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puzzlenet_tpu.core.config import Config

pytestmark = pytest.mark.slow  # heavy e2e tier (see conftest.py)
from puzzlenet_tpu.core.sharding import make_mesh, shard_batch
from puzzlenet_tpu.models import PuzzleNet
from puzzlenet_tpu.semath import se3, transforms
from puzzlenet_tpu.train import Batch, LossFlags, compute_losses
from puzzlenet_tpu.train.trainer import (Trainer, lr_schedule, make_optimizer,
                                         train_step)

N = 256  # small clouds for speed


def _make_batch(b=2, n=N, k=32, seed=0):
    """Synthetic, physically consistent batch: two halves of a sphere cloud,
    mrpc = igt . rpc."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(b, 2 * n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    fpc = pts[:, :n] * 0.98
    rpc = pts[:, n:]
    key = jax.random.PRNGKey(seed)
    mrpc, igts = [], []
    for i in range(b):
        s = transforms.random_transform_se3(jax.random.fold_in(key, i),
                                            jnp.asarray(rpc[i]), mag=0.8)
        mrpc.append(np.asarray(s.p1))
        igts.append(np.asarray(s.igt))
    from puzzlenet_tpu.data.boundary import get_boundary_np
    fpcb, rpcb, fidx, ridx = [], [], [], []
    for i in range(b):
        a, c, fi, ri = get_boundary_np(fpc[i], rpc[i], k=k)
        fpcb.append(a), rpcb.append(c), fidx.append(fi), ridx.append(ri)
    return Batch(jnp.asarray(fpc), jnp.asarray(np.stack(mrpc)),
                 jnp.asarray(np.stack(igts)), jnp.asarray(rpc),
                 jnp.asarray(np.stack(fpcb)), jnp.asarray(np.stack(rpcb)),
                 jnp.asarray(np.stack(fidx)), jnp.asarray(np.stack(ridx)))


@pytest.fixture(scope="module")
def batch():
    return _make_batch()


@pytest.fixture(scope="module")
def model_out(batch):
    model = PuzzleNet(num_points=N)
    variables = model.init(jax.random.PRNGKey(0), batch.fpc, batch.mrpc,
                           train=False)
    out = model.apply(variables, batch.fpc, batch.mrpc, train=False)
    return model, variables, out


class TestLosses:
    @pytest.mark.parametrize("mode", range(7))
    def test_all_loss_modes_finite(self, batch, model_out, mode):
        _, _, out = model_out
        loss, metrics = compute_losses(out, batch, LossFlags(loss_mode=mode),
                                       pretrain=False)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(metrics["train/fpc_iou"]))

    def test_pretrain_skips_boundary(self, batch, model_out):
        _, _, out = model_out
        _, metrics = compute_losses(out, batch, LossFlags(loss_mode=0),
                                    pretrain=True)
        assert "train/loss_fpcb_cel" not in metrics

    def test_loss_mode_composition(self, batch, model_out):
        _, _, out = model_out
        flags = LossFlags(loss_mode=1, log_all=True)
        _, m = compute_losses(out, batch, flags, pretrain=True)
        np.testing.assert_allclose(
            float(m["train_loss"]),
            float(m["train/loss_re"] + m["train/loss_g"]
                  + m["train/loss_emd"]), rtol=1e-5)

    def test_perfect_pose_gives_small_g_loss(self, batch, model_out):
        _, _, out = model_out
        # substitute a perfect twist: log(inv(igt))
        perfect = se3.log(se3.inverse(batch.igt))
        out2 = out._replace(twist=perfect)
        _, m = compute_losses(out2, batch, LossFlags(loss_mode=0),
                              pretrain=True)
        assert float(m["train/loss_g"]) < 1e-5
        assert float(m["train/loss_re"]) < 1e-5

    def test_bnd_w_scales_only_boundary(self, batch, model_out):
        """bnd_w scales the whole boundary branch and nothing else:
        total(bnd_w=w) == pose_total + w * (total(1) - pose_total)."""
        _, _, out = model_out
        full, _ = compute_losses(out, batch, LossFlags(loss_mode=0),
                                 pretrain=False)
        pose, _ = compute_losses(out, batch, LossFlags(loss_mode=0),
                                 pretrain=True)       # boundary skipped
        half, m = compute_losses(out, batch,
                                 LossFlags(loss_mode=0, bnd_w=0.5),
                                 pretrain=False)
        np.testing.assert_allclose(
            float(half), float(pose) + 0.5 * (float(full) - float(pose)),
            rtol=1e-5)
        # the logged per-term metrics stay unscaled (diagnostics)
        assert np.isfinite(float(m["train/loss_fpcb_cel"]))

    def test_aux_flags(self, batch, model_out):
        _, _, out = model_out
        flags = LossFlags(loss_mode=0, use_emd2=True, use_cd2=True)
        loss, m = compute_losses(out, batch, flags, pretrain=True)
        assert "train_emd2" in m and "train/cd2" in m
        base, _ = compute_losses(out, batch, LossFlags(loss_mode=0),
                                 pretrain=True)
        assert float(loss) != float(base)


class TestSchedule:
    def test_steplr(self):
        s = lr_schedule(1e-3)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(49)) == pytest.approx(1e-3)
        assert float(s(50)) == pytest.approx(1e-3 * 0.999)
        assert float(s(500)) == pytest.approx(1e-3 * 0.999 ** 10)


class TestTrainStep:
    def test_overfit_one_batch(self, batch):
        """The e2e slice (SURVEY.md §7.3): loss_mode 0, pretrain path,
        loss decreases when overfitting a single batch."""
        cfg = Config(batch_size=2, num_points=N, loss_mode=0, lr=3e-4)
        mesh = make_mesh(1, 1)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state(batch)
        flags = LossFlags(loss_mode=0)
        losses = []
        for _ in range(30):
            state, metrics = train_step(trainer.model, trainer.tx, flags,
                                        True, state, batch)
            losses.append(float(metrics["train_loss"]))
        # Adam spikes in the first steps on a fresh model; require the tail
        # to have descended clearly below the starting loss
        assert min(losses[-5:]) < losses[0] * 0.7, losses

    def test_sharded_step_on_8_devices(self):
        """Multi-chip validation on the virtual CPU mesh: batch sharded over
        8 devices, params replicated, one step runs and loss is finite."""
        assert len(jax.devices()) == 8
        mesh = make_mesh(8, 1)
        b = _make_batch(b=8)
        cfg = Config(batch_size=8, num_points=N, loss_mode=0)
        trainer = Trainer(cfg, mesh=mesh)
        sharded = shard_batch(mesh, b)
        state = trainer.init_state(sharded)
        state, metrics = train_step(trainer.model, trainer.tx,
                                    LossFlags(loss_mode=0), True, state,
                                    sharded)
        assert np.isfinite(float(metrics["train_loss"]))

    def test_tp_matches_single_device(self):
        """Tensor-parallel correctness (VERDICT round-1 weak #4): the
        ('data','model') = (4, 2) mesh — real column sharding on the large
        kernels — must reproduce the (1, 1) losses for 2 steps, like the
        dp test."""
        b = _make_batch(b=8, seed=5)
        cfg = Config(batch_size=8, num_points=N, loss_mode=0)

        t1 = Trainer(cfg, mesh=make_mesh(1, 1))
        s1 = t1.init_state(b)
        tt = Trainer(cfg, mesh=make_mesh(4, 2))
        sb = shard_batch(tt.mesh, b)
        st = tt.init_state(sb)

        for step in range(2):
            s1, m1 = train_step(t1.model, t1.tx, LossFlags(0), True, s1, b)
            st, mt = train_step(tt.model, tt.tx, LossFlags(0), True, st, sb)
            np.testing.assert_allclose(float(m1["train_loss"]),
                                       float(mt["train_loss"]), rtol=2e-3,
                                       err_msg=f"step {step}")

    def test_dp_matches_single_device(self):
        """Gradient all-reduce correctness: the sharded loss equals the
        unsharded loss at step 1 AND step 2 (step 2 sees the updated params,
        so any gradient error would compound). Param tensors are not
        compared bitwise: Adam's sqrt-normalized updates amplify
        reduction-order fp noise to ~eps*lr, which is expected."""
        b = _make_batch(b=8, seed=3)
        cfg = Config(batch_size=8, num_points=N, loss_mode=0)

        t1 = Trainer(cfg, mesh=make_mesh(1, 1))
        s1 = t1.init_state(b)
        t8 = Trainer(cfg, mesh=make_mesh(8, 1))
        sb = shard_batch(t8.mesh, b)
        s8 = t8.init_state(sb)

        for step in range(2):
            s1, m1 = train_step(t1.model, t1.tx, LossFlags(0), True, s1, b)
            s8, m8 = train_step(t8.model, t8.tx, LossFlags(0), True, s8, sb)
            np.testing.assert_allclose(float(m1["train_loss"]),
                                       float(m8["train_loss"]), rtol=2e-3,
                                       err_msg=f"step {step}")


class TestEndToEnd:
    def test_cli_smoke(self, tmp_path):
        """Tiny full run through the train CLI: 1 epoch, synthetic vaser,
        writes setting.txt, checkpoints, metrics.txt."""
        from puzzlenet_tpu.cli.train import main

        out = str(tmp_path / "run")
        result = main([
            "--dataset", "vaser", "--batch_size", "2", "--epochs", "1",
            "--pretrain_epochs", "0", "--loss_mode", "0", "--synth_count",
            "4", "--num_points", "256", "--num_workers", "2",
            "--output_path", out, "--max_steps", "2",
        ])
        assert os.path.exists(os.path.join(out, "setting.txt"))
        assert os.path.exists(os.path.join(out, "model.txt"))
        assert os.path.isdir(os.path.join(out, "checkpoints"))
        assert any(f.endswith("metrics.txt") for f in os.listdir(out))
        assert all(np.isfinite(v) for v in result.values())

    def test_checkpoint_roundtrip(self, tmp_path, batch):
        cfg = Config(batch_size=2, num_points=N, loss_mode=0,
                     output_path=str(tmp_path / "ckpt_run"))
        trainer = Trainer(cfg, mesh=make_mesh(1, 1))
        state = trainer.init_state(batch)
        state, m = train_step(trainer.model, trainer.tx, LossFlags(0), True,
                              state, batch)
        trainer.save_checkpoint(state, 0, float(m["train_loss"]))
        trainer.ckpt_manager.wait_until_finished()

        fresh = trainer.init_state(batch, seed=123)
        restored = trainer.restore_checkpoint(fresh)
        for a, c in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_final_checkpoint_survives_eviction(self, tmp_path, batch):
        """The final save can lose top-2-by-loss retention roulette to
        lucky mid-run dips (observed: vcone_bfp_r2 kept two noise dips
        and GC'd step 60000). ensure_final_checkpoint must re-write it
        out-of-band in the read-only restorer's layout."""
        import os
        cfg = Config(batch_size=2, num_points=N, loss_mode=0,
                     output_path=str(tmp_path / "final_run"))
        trainer = Trainer(cfg, mesh=make_mesh(1, 1))
        state = trainer.init_state(batch)
        trainer.save_checkpoint(state, 10, 1.0)
        trainer.save_checkpoint(state, 20, 2.0)
        trainer.save_checkpoint(state, 30, 9.0)   # "final", worst loss
        trainer.ckpt_manager.wait_until_finished()
        assert 30 not in trainer.ckpt_manager.all_steps()
        trainer.ensure_final_checkpoint(state, 30)
        fresh = trainer.init_state(batch, seed=9)
        restored = trainer.restore_checkpoint(
            fresh, os.path.join(cfg.output_path, "checkpoints"), step=30)
        for a, c in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_pretrain_checkpoints_evict_first(self, tmp_path, batch):
        """Pretrain-phase saves must never evict main-phase saves: the
        pose-only pretrain objective scores far lower raw losses, so a
        shared top-2-by-train_loss ranking would keep two 1.5k-step
        pretrain checkpoints and GC every main save INCLUDING the final
        trained model (regression: cadr_bfp_r round 4 retained only
        steps 2000/3000 mid-run)."""
        cfg = Config(batch_size=2, num_points=N, loss_mode=0,
                     output_path=str(tmp_path / "evict_run"))
        trainer = Trainer(cfg, mesh=make_mesh(1, 1))
        state = trainer.init_state(batch)
        # pretrain saves at tiny losses, then main saves at larger ones
        trainer.save_checkpoint(state, 1, 0.5, pretrain=True)
        trainer.save_checkpoint(state, 2, 0.4, pretrain=True)
        trainer.save_checkpoint(state, 10, 50.0)
        trainer.save_checkpoint(state, 20, 40.0)
        trainer.ckpt_manager.wait_until_finished()
        kept = sorted(trainer.ckpt_manager.all_steps())
        assert kept == [10, 20], kept


class TestLoader:
    def test_process_loader_matches_thread_loader(self):
        from puzzlenet_tpu.data import (MovedDataset, SlicedCloudDataset,
                                        synthetic_clouds)
        from puzzlenet_tpu.train.loader import Loader

        clouds = synthetic_clouds("blob", count=6, n_points=3000, seed=0)
        ds = MovedDataset(SlicedCloudDataset(clouds, mode="train",
                                             split_rate=1.0))
        lt = Loader(ds, 2, num_workers=2, use_processes=False)
        lp = Loader(ds, 2, num_workers=2, use_processes=True)
        for bt, bp in zip(lt, lp):
            for a, b in zip(bt, bp):
                np.testing.assert_array_equal(a, b)
        lp.close()

    def test_process_loader_epoch_propagates(self):
        """Spawn workers hold long-lived dataset copies; the epoch must
        still reach them (it rides with every task), so epoch-dependent
        draws change across epochs and match the thread loader's."""
        from puzzlenet_tpu.data import (MovedDataset, SlicedCloudDataset,
                                        synthetic_clouds)
        from puzzlenet_tpu.train.loader import Loader

        clouds = synthetic_clouds("blob", count=4, n_points=3000, seed=0)
        mk = lambda: MovedDataset(SlicedCloudDataset(  # noqa: E731
            clouds, mode="train", split_rate=1.0))
        lp = Loader(mk(), 2, num_workers=2, use_processes=True)
        lt = Loader(mk(), 2, num_workers=2, use_processes=False)

        lp.set_epoch(0)
        e0 = [b[0] for b in lp]
        lp.set_epoch(3)
        e3 = [b[0] for b in lp]
        assert not all(np.array_equal(a, b) for a, b in zip(e0, e3))
        lt.set_epoch(3)
        for bt, bp in zip(lt, lp):   # lp still at epoch 3
            np.testing.assert_array_equal(bt[0], bp[0])
        lp.close()


class TestEvaluatorBatchInvariance:
    def test_metrics_independent_of_batch_size(self, model_out):
        """The same checkpoint must write the same metrics.txt numbers at
        any --batch_size: per-SAMPLE rows, partial final batch padded and
        dropped (regression: per-batch row averaging over-weighted the
        partial batch and micro-averaged IoU within batches)."""
        from puzzlenet_tpu.train.evaluator import evaluate

        model, variables, _ = model_out
        big = _make_batch(b=5, seed=7)
        items = [[np.asarray(x[i]) for x in big] for i in range(5)]

        class DS:
            def __len__(self):
                return 5

            def __getitem__(self, i):
                return items[i]

        r1 = evaluate(model, variables["params"], variables["batch_stats"],
                      DS(), batch_size=1, num_workers=0)
        r2 = evaluate(model, variables["params"], variables["batch_stats"],
                      DS(), batch_size=2, num_workers=0)
        for k in r1:
            np.testing.assert_allclose(r1[k], r2[k], rtol=1e-5, atol=1e-6,
                                       err_msg=k)


class TestEvaluatorPretrain:
    def test_pretrain_metrics_pose_only(self, batch, model_out):
        """evaluate(pretrain=True) runs the predict6 path: real pose
        metrics, NaN boundary placeholders (model5_b.py:1178-1181)."""
        from puzzlenet_tpu.train.evaluator import test_step_metrics
        model, variables, _ = model_out
        row = np.asarray(test_step_metrics(
            model, variables["params"], variables["batch_stats"], batch,
            pretrain=True))
        assert row.shape == (batch.fpc.shape[0], 10)   # per-sample rows
        assert np.all(np.isfinite(row[:, :6]))
        assert np.all(np.isnan(row[:, 6:]))
        full = np.asarray(test_step_metrics(
            model, variables["params"], variables["batch_stats"], batch))
        assert np.all(np.isfinite(full))

    def test_refine_iters_metrics(self, batch, model_out):
        """refine_iters=0 is the plain path bit-for-bit; > 0 composes
        extra forwards, changes only pose-dependent columns (pose + the
        transformed-boundary chamfer), and keeps boundary IoU (computed
        from the FIRST forward) identical."""
        from puzzlenet_tpu.train.evaluator import test_step_metrics
        model, variables, _ = model_out
        base = np.asarray(test_step_metrics(
            model, variables["params"], variables["batch_stats"], batch))
        zero = np.asarray(test_step_metrics(
            model, variables["params"], variables["batch_stats"], batch,
            refine_iters=0))
        np.testing.assert_array_equal(base, zero)
        ref = np.asarray(test_step_metrics(
            model, variables["params"], variables["batch_stats"], batch,
            refine_iters=2))
        assert np.all(np.isfinite(ref))
        np.testing.assert_array_equal(base[:, 6:8], ref[:, 6:8])  # IoU
        np.testing.assert_array_equal(base[:, 8], ref[:, 8])      # cd_fpcb
        assert not np.allclose(base[:, :6], ref[:, :6])           # pose
