"""Fused 3-NN inverse-distance interpolation (ops/interp_pallas.py):
interpret-mode Pallas kernels vs the XLA oracle, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import puzzlenet_tpu.ops.interp_pallas as ip


def _inputs(seed=0, B=2, N=512, S=256, C=32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32))
    sf = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32))
    return q, sx, sf


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ip, "_INTERPRET", True)


class TestThreeNNInterp:
    def test_fallback_matches_reference_semantics(self):
        """Off-TPU path == the direct top-3 formulation."""
        q, sx, sf = _inputs()
        out = ip.three_nn_interpolate(q, sx, sf)
        want = ip._xla_three_nn(q, sx, sf)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_kernel_forward(self, interpret_mode):
        q, sx, sf = _inputs(1)
        got = ip.three_nn_interpolate(q, sx, sf)
        want = ip._xla_three_nn(q, sx, sf)
        # bf16 gather rounding inside the kernel bounds the tolerance
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_kernel_idx_matches_topk(self, interpret_mode):
        q, sx, sf = _inputs(2)
        _, idx, w = ip._fwd_pallas(q, sx, sf)
        d = ip.square_distance(q, sx)
        _, want_idx = jax.lax.top_k(-d, 3)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), axis=-1),
            np.sort(np.asarray(want_idx), axis=-1))
        np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0,
                                   rtol=1e-5)

    def test_kernel_backward(self, interpret_mode):
        """vs a bf16-matched oracle: rounding the gathered features to
        bf16 exactly as the kernel does makes the a_i = g.f_i terms in
        the weight gradient line up (raw-f32 oracle differs by amplified
        bf16 noise on near-tie weight-gradient terms)."""
        q, sx, sf = _inputs(3)

        def oracle(q, sx, sf):
            fb = sf.astype(jnp.bfloat16).astype(jnp.float32)
            d = ip.square_distance(q, sx)
            negd, idx = jax.lax.top_k(-d, 3)
            recip = 1.0 / jnp.maximum(-negd, ip._EPS)
            w = recip / jnp.sum(recip, axis=-1, keepdims=True)
            f = ip.index_points(fb, idx)
            return jnp.sum(f * w[..., None], axis=2)

        def loss(impl, q, sx, sf):
            return jnp.sum(impl(q, sx, sf) ** 2)

        ga = jax.grad(lambda a, b, c: loss(ip.three_nn_interpolate, a, b, c),
                      argnums=(0, 1, 2))(q, sx, sf)
        gb = jax.grad(lambda a, b, c: loss(oracle, a, b, c),
                      argnums=(0, 1, 2))(q, sx, sf)
        for x, y, name in zip(ga, gb, ("dq", "dsx", "dsf")):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-2, atol=5e-2,
                                       err_msg=name)
