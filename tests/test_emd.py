"""EMD tests: lax annealing vs an independent numpy transcription of the
reference algorithm, Hungarian lower bound, analytic gradients
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from puzzlenet_tpu import ops


def _np_approx_match(xyz1, xyz2):
    """Loop-based numpy oracle of the annealing algorithm
    (emd_kernel.cu:26-158 semantics), written independently for testing."""
    n, m = len(xyz1), len(xyz2)
    multiL = 1.0 if n >= m else float(m // n)
    multiR = float(n // m) if n >= m else 1.0
    remainL = np.full(n, multiL, np.float32)
    remainR = np.full(m, multiR, np.float32)
    match = np.zeros((m, n), np.float32)
    D = ((xyz1[:, None, :] - xyz2[None, :, :]) ** 2).sum(-1).astype(np.float32)
    for j in range(7, -3, -1):
        level = 0.0 if j == -2 else -(4.0 ** j)
        K = np.exp(level * D)
        suml = 1e-9 + K @ remainR
        ratioL = remainL / suml
        sumr = (K.T @ ratioL) * remainR
        consumption = np.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = np.maximum(0.0, remainR - sumr)
        W = K * ratioL[:, None] * ratioR[None, :]
        match += W.T
        remainL = np.maximum(0.0, remainL - W.sum(1))
    return match, D


class TestApproxMatch:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        x1 = rng.normal(size=(2, 64, 3)).astype(np.float32)
        x2 = rng.normal(size=(2, 64, 3)).astype(np.float32)
        got = np.asarray(ops.approx_match(jnp.asarray(x1), jnp.asarray(x2)))
        for b in range(2):
            want, _ = _np_approx_match(x1[b], x2[b])
            np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-5)

    def test_mass_conservation(self):
        rng = np.random.default_rng(1)
        x1 = rng.normal(size=(1, 128, 3)).astype(np.float32)
        x2 = rng.normal(size=(1, 128, 3)).astype(np.float32)
        match = np.asarray(ops.approx_match(jnp.asarray(x1), jnp.asarray(x2)))
        assert match.min() >= 0
        # total matched mass ~ n (each left point carries capacity 1)
        assert abs(match.sum() - 128) / 128 < 0.05

    def test_unequal_sizes(self):
        rng = np.random.default_rng(2)
        x1 = rng.normal(size=(1, 128, 3)).astype(np.float32)
        x2 = rng.normal(size=(1, 32, 3)).astype(np.float32)
        got = np.asarray(ops.approx_match(jnp.asarray(x1), jnp.asarray(x2)))[0]
        want, _ = _np_approx_match(x1[0], x2[0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestEMDCost:
    def test_cost_matches_oracle(self):
        rng = np.random.default_rng(3)
        x1 = rng.normal(size=(2, 64, 3)).astype(np.float32)
        x2 = rng.normal(size=(2, 64, 3)).astype(np.float32)
        cost = np.asarray(
            ops.earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2),
                                     backend="lax"))
        for b in range(2):
            match, D = _np_approx_match(x1[b], x2[b])
            np.testing.assert_allclose(cost[b], (D * match.T).sum(),
                                       rtol=1e-3)

    def test_identical_clouds_near_zero(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 64, 3)).astype(np.float32)
        cost = float(ops.earth_mover_distance(jnp.asarray(x), jnp.asarray(x),
                                              backend="lax")[0])
        # perfect matching exists with zero cost; annealing should find ~it
        assert cost < 0.05

    def test_above_hungarian_lower_bound(self):
        rng = np.random.default_rng(5)
        x1 = rng.normal(size=(1, 48, 3)).astype(np.float32)
        x2 = rng.normal(size=(1, 48, 3)).astype(np.float32)
        D = ((x1[0][:, None] - x2[0][None]) ** 2).sum(-1)
        r, c = linear_sum_assignment(D)
        optimal = D[r, c].sum()
        cost = float(ops.earth_mover_distance(jnp.asarray(x1),
                                              jnp.asarray(x2),
                                              backend="lax")[0])
        assert cost >= optimal * 0.99  # LP lower bound (tolerating fp error)
        assert cost <= optimal * 2.0   # and the approximation is tight-ish

    def test_transpose_layout(self):
        rng = np.random.default_rng(6)
        x1 = rng.normal(size=(1, 3, 64)).astype(np.float32)
        x2 = rng.normal(size=(1, 3, 64)).astype(np.float32)
        a = ops.earth_mover_distance(jnp.asarray(x1), jnp.asarray(x2),
                                     transpose=True, backend="lax")
        b = ops.earth_mover_distance(jnp.asarray(x1).swapaxes(1, 2),
                                     jnp.asarray(x2).swapaxes(1, 2),
                                     backend="lax")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


class TestEMDGrad:
    def test_analytic_gradient_formula(self):
        rng = np.random.default_rng(7)
        x1 = rng.normal(size=(1, 32, 3)).astype(np.float32)
        x2 = rng.normal(size=(1, 32, 3)).astype(np.float32)
        j1, j2 = jnp.asarray(x1), jnp.asarray(x2)

        g1, g2 = jax.grad(
            lambda a, b: jnp.sum(ops.earth_mover_distance(a, b,
                                                          backend="lax")),
            argnums=(0, 1))(j1, j2)

        match, _ = _np_approx_match(x1[0], x2[0])
        want1 = 2 * (match.T.sum(1, keepdims=True) * x1[0] - match.T @ x2[0])
        want2 = 2 * (match.sum(1, keepdims=True) * x2[0] - match @ x1[0])
        np.testing.assert_allclose(np.asarray(g1)[0], want1, rtol=1e-2,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2)[0], want2, rtol=1e-2,
                                   atol=1e-4)

    def test_grad_finite_and_descends(self):
        rng = np.random.default_rng(8)
        x1 = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32) + 2.0)

        def f(a):
            return jnp.sum(ops.earth_mover_distance(a, x2, backend="lax"))

        g = jax.grad(f)(x1)
        assert np.all(np.isfinite(np.asarray(g)))
        # one gradient step reduces the cost
        before = float(f(x1))
        after = float(f(x1 - 1e-3 * g))
        assert after < before


class TestEMDPallasInterpret:
    def test_interpret_matches_lax_reference(self, monkeypatch):
        """The fused Pallas EMD kernel, run in interpret mode on CPU,
        reproduces the lax reference implementation exactly (same
        annealing ladder/epsilons) for cost and analytic grads. (FTZ-class
        hardware behavior is NOT covered here — see test_tpu_kernels.)"""
        import jax

        import puzzlenet_tpu.ops.emd_pallas as ep
        from puzzlenet_tpu.ops.emd import earth_mover_distance as emd_lax

        monkeypatch.setattr(ep, "_INTERPRET", True)
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(ep.emd_cost_pallas(a, b)),
                                   np.asarray(emd_lax(a, b)), rtol=1e-4)
        g_p = jax.grad(lambda x: ep.emd_cost_pallas(x, b).sum())(a)
        g_l = jax.grad(lambda x: emd_lax(x, b).sum())(a)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_l),
                                   rtol=1e-3, atol=1e-5)
