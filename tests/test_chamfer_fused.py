"""Fused chamfer kernel (ops/chamfer_pallas.py): interpret-mode Pallas vs
the XLA matmul-expansion oracle, forward values and custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import puzzlenet_tpu.ops.chamfer_pallas as cp
from puzzlenet_tpu.ops.pointops import square_distance


def _xla_oracle(a, b):
    P = square_distance(a, b, precision="highest")
    return jnp.min(P, axis=1), jnp.min(P, axis=2)


def _inputs(seed=0, B=2, N=512, M=384):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    return a, b


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setattr(cp, "_INTERPRET", True)


class TestFusedChamfer:
    def test_forward_values(self, interpret_mode):
        a, b = _inputs(1)
        db, da = cp.chamfer_distances_fused(a, b)
        want_db, want_da = _xla_oracle(a, b)
        # elementwise-exact kernel vs HIGHEST GEMM: the ORACLE carries
        # |a|^2+|b|^2-2ab cancellation, so allow its rounding band
        np.testing.assert_allclose(np.asarray(db), np.asarray(want_db),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da), np.asarray(want_da),
                                   rtol=5e-4, atol=1e-5)

    def test_forward_multiblock_accumulation(self, interpret_mode):
        """N spanning several 256-row grid steps exercises the cross-tile
        d_b min + packed-row argmin accumulators."""
        a, b = _inputs(2, B=1, N=1024, M=256)
        db, da = cp.chamfer_distances_fused(a, b)
        want_db, want_da = _xla_oracle(a, b)
        np.testing.assert_allclose(np.asarray(db), np.asarray(want_db),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da), np.asarray(want_da),
                                   rtol=5e-4, atol=1e-5)

    def test_grads_match_xla(self, interpret_mode):
        a, b = _inputs(3, B=2, N=256, M=256)

        def loss_fused(a, b):
            db, da = cp.chamfer_distances_fused(a, b)
            # uneven weights so both cotangents are exercised
            return jnp.mean(db) + 2.0 * jnp.mean(da ** 2)

        def loss_xla(a, b):
            db, da = _xla_oracle(a, b)
            return jnp.mean(db) + 2.0 * jnp.mean(da ** 2)

        ga, gb = jax.grad(loss_fused, argnums=(0, 1))(a, b)
        wa, wb = jax.grad(loss_xla, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                                   rtol=1e-4, atol=1e-6)

    def test_grad_zero_distance(self, interpret_mode):
        """Coincident points (d == 0 winners) must not blow up: the
        packed-id denormal shift and the 2*(x-y) grads both behave."""
        rng = np.random.default_rng(4)
        pts = rng.normal(size=(1, 256, 3)).astype(np.float32)
        a = jnp.asarray(pts)
        b = jnp.asarray(np.concatenate([pts[:, :128], pts[:, :128] + 0.5],
                                       axis=1))

        def loss(a, b):
            db, da = cp.chamfer_distances_fused(a, b)
            return jnp.sum(db) + jnp.sum(da)

        ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
        assert np.isfinite(np.asarray(ga)).all()
        assert np.isfinite(np.asarray(gb)).all()

    def test_router_small_sets_stay_xla(self):
        """chamfer_distances keeps the GEMM path for 128-point boundary
        sets (and off-TPU without interpret)."""
        assert not cp.pallas_supported(128, 128)

    def test_router_values(self, interpret_mode):
        from puzzlenet_tpu.ops.chamfer import chamfer_distances
        a, b = _inputs(5, B=1, N=512, M=512)
        assert cp.pallas_supported(512, 512)
        db, da = chamfer_distances(a, b)
        want_db, want_da = _xla_oracle(a, b)
        np.testing.assert_allclose(np.asarray(db), np.asarray(want_db),
                                   rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da), np.asarray(want_da),
                                   rtol=5e-4, atol=1e-5)
