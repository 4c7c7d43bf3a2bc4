"""Serving API (puzzlenet_tpu/infer.py): warm session over a tiny CLI run
dir — padding/chunking, decoded outputs, transform consistency."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier (see conftest.py)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from puzzlenet_tpu.cli.train import main

    out = str(tmp_path_factory.mktemp("infer") / "run")
    main(["--dataset", "vaser", "--batch_size", "2", "--epochs", "1",
          "--pretrain_epochs", "0", "--loss_mode", "0", "--synth_count",
          "4", "--num_points", "256", "--num_workers", "0",
          "--output_path", out, "--max_steps", "2"])
    return out


class TestSession:
    def test_predict_contract(self, run_dir):
        from puzzlenet_tpu.infer import Session

        sess = Session.from_run(run_dir, batch_size=2)
        assert sess.num_points == 256
        rng = np.random.default_rng(0)
        # B=3 with batch_size=2: one full chunk + one padded chunk
        fpc = rng.normal(size=(3, 256, 3)).astype(np.float32)
        mrpc = rng.normal(size=(3, 256, 3)).astype(np.float32)
        out = sess.predict(fpc, mrpc, boundary_k=32)

        assert out["twist"].shape == (3, 6)
        assert out["transform"].shape == (3, 4, 4)
        assert out["mrpc_aligned"].shape == (3, 256, 3)
        for k in ("fpc_boundary_prob", "mrpc_boundary_prob"):
            assert out[k].shape == (3, 256)
            assert (out[k] >= 0).all() and (out[k] <= 1).all()
        for k in ("fpc_boundary_mask", "mrpc_boundary_mask"):
            assert out[k].sum(axis=1).tolist() == [32.0] * 3

        # transform really is exp(twist) applied to mrpc
        from puzzlenet_tpu.semath import se3
        import jax.numpy as jnp
        mat = np.asarray(se3.exp(jnp.asarray(out["twist"])))
        np.testing.assert_allclose(mat, out["transform"], atol=1e-5)
        want = mrpc @ mat[:, :3, :3].transpose(0, 2, 1) + mat[:, None, :3, 3]
        np.testing.assert_allclose(out["mrpc_aligned"], want, atol=1e-4)

        # padded-chunk results equal unpadded single-item results
        single = sess.predict(fpc[2], mrpc[2])
        np.testing.assert_allclose(single["twist"][0], out["twist"][2],
                                   atol=1e-5)

    def test_predict_resamples_arbitrary_n(self, run_dir):
        """Inputs with n != num_points are normalized (FPS down /
        resample-with-replacement up) instead of asserting."""
        from puzzlenet_tpu.infer import Session

        sess = Session.from_run(run_dir, batch_size=2)
        rng = np.random.default_rng(2)
        big = rng.normal(size=(700, 3)).astype(np.float32)    # FPS down
        small = rng.normal(size=(100, 3)).astype(np.float32)  # pad up
        out = sess.predict([big, small], [small, big], boundary_k=16)
        assert out["fpc"].shape == (2, 256, 3)
        assert out["twist"].shape == (2, 6)
        assert out["mrpc_aligned"].shape == (2, 256, 3)
        # normalized clouds are subsets/duplications of the originals
        assert {tuple(p) for p in out["fpc"][0]} <= {tuple(p) for p in big}
        assert {tuple(p) for p in out["fpc"][1]} <= {tuple(p) for p in small}
        # deterministic under the seed
        out2 = sess.predict([big, small], [small, big], boundary_k=16)
        np.testing.assert_array_equal(out["fpc"], out2["fpc"])
        np.testing.assert_allclose(out["twist"], out2["twist"], atol=1e-6)

    def test_convenience_predict_cached(self, run_dir):
        from puzzlenet_tpu import infer

        rng = np.random.default_rng(1)
        fpc = rng.normal(size=(1, 256, 3)).astype(np.float32)
        out = infer.predict(run_dir, fpc, fpc, batch_size=2)
        assert out["twist"].shape == (1, 6)
        s1 = infer._cached_session(run_dir, None, 2)
        s2 = infer._cached_session(run_dir, None, 2)
        assert s1 is s2


class TestExportTool:
    def test_export_roundtrip(self, run_dir):
        """tools/export_torch.py writes a reference-format .ckpt our own
        reference-checkpoint converter restores bit-exactly."""
        import jax

        from puzzlenet_tpu.core.torch_compat import (
            convert_lightning_checkpoint)
        from puzzlenet_tpu.infer import Session
        from tools.export_torch import main as export_main

        out = export_main(["--run_dir", run_dir])
        params, stats, hparams = convert_lightning_checkpoint(out)
        sess = Session.from_run(run_dir, batch_size=1)
        for a, b in zip(jax.tree_util.tree_leaves(sess.variables["params"]),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
                jax.tree_util.tree_leaves(sess.variables["batch_stats"]),
                jax.tree_util.tree_leaves(stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert hparams["dataset"] == "vaser"


def test_predict_refine_iters(session_fixture_or_none=None):
    """refine_iters composes rigid transforms; outputs keep shape and the
    refined transform stays a valid SE(3) element."""
    import jax
    import numpy as np

    from puzzlenet_tpu.infer import Session
    from puzzlenet_tpu.models import PuzzleNet
    import jax.numpy as jnp

    N = 256
    rng = np.random.default_rng(0)
    model = PuzzleNet(num_points=N)
    z = jnp.zeros((1, N, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
    sess = Session(variables["params"], variables["batch_stats"],
                   num_points=N, batch_size=2)
    fpc = rng.normal(size=(2, N, 3)).astype(np.float32)
    mrpc = rng.normal(size=(2, N, 3)).astype(np.float32)
    out0 = sess.predict(fpc, mrpc)
    out2 = sess.predict(fpc, mrpc, refine_iters=2)
    assert out2["transform"].shape == (2, 4, 4)
    for g in out2["transform"]:
        R = g[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
    # refinement changes the pose (untrained net != identity correction)
    assert not np.allclose(out0["transform"], out2["transform"])
