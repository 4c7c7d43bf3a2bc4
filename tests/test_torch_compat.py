"""Checkpoint-conversion tests: roundtrip our params through the
reference-named state_dict and back; converted trees drive the model."""

import jax
import jax.numpy as jnp
import numpy as np

from puzzlenet_tpu.core.torch_compat import (convert_lightning_checkpoint,
                                             convert_state_dict,
                                             export_state_dict)
from puzzlenet_tpu.models import PuzzleNet

N = 128


def _init():
    x = jnp.zeros((1, N, 3))
    model = PuzzleNet(num_points=N)
    return model, model.init(jax.random.PRNGKey(0), x, x, train=False)


class TestTorchCompat:
    def test_roundtrip(self):
        _, variables = _init()
        sd = export_state_dict(variables["params"], variables["batch_stats"])
        # reference-style key names present
        assert "Encoder.mlp1.weight" in sd
        assert "Encoder2.atten3.mlpq.weight" in sd
        assert "tfMLP.8.bias" in sd
        assert "Encoder.bn1.running_mean" in sd
        assert sd["Encoder.mlp1.weight"].shape == (64, 3)  # torch [out, in]

        params, stats = convert_state_dict(sd)
        flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        flat_b = jax.tree_util.tree_flatten_with_path(params)[0]
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), vb)
        flat_sa = jax.tree_util.tree_flatten_with_path(
            variables["batch_stats"])[0]
        flat_sb = jax.tree_util.tree_flatten_with_path(stats)[0]
        assert len(flat_sa) == len(flat_sb)

    def test_converted_tree_runs(self):
        model, variables = _init()
        sd = export_state_dict(variables["params"], variables["batch_stats"])
        params, stats = convert_state_dict(sd)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, N, 3)).astype(np.float32))
        out_a = model.apply(variables, x, x + 1, train=False)
        out_b = model.apply({"params": params, "batch_stats": stats}, x,
                            x + 1, train=False)
        np.testing.assert_allclose(np.asarray(out_a.twist),
                                   np.asarray(out_b.twist), atol=1e-6)

    def test_lightning_wrapper_and_skips(self):
        _, variables = _init()
        sd = export_state_dict(variables["params"], variables["batch_stats"])
        # simulate a Lightning checkpoint with prefixes and dead members
        sd = {k: v for k, v in sd.items()}
        sd["dt"] = np.ones((1, 6), np.float32)
        sd["fpc_decoder.something.weight"] = np.ones((4, 4), np.float32)
        sd["Encoder.bn1.num_batches_tracked"] = np.asarray(7)
        ckpt = {"state_dict": sd, "hyper_parameters": {"dataset": "vaser"}}
        params, stats, hparams = convert_lightning_checkpoint(ckpt)
        assert hparams["dataset"] == "vaser"
        assert "fpc_decoder" not in params
