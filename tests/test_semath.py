"""semath unit tests: sinc Taylor branches, SO(3)/SE(3) exp/log round trips,
oracle checks against scipy.spatial.transform (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from puzzlenet_tpu.semath import se3, sinc, so3, transforms


class TestSinc:
    def test_sinc1_matches_definition(self):
        t = jnp.linspace(-3.0, 3.0, 101)
        t = t[jnp.abs(t) > 0.02]
        np.testing.assert_allclose(sinc.sinc1(t), np.sin(t) / t, rtol=1e-6)

    def test_taylor_branch_continuity(self):
        # values just inside and outside the |t|<0.01 guard agree
        for fn in (sinc.sinc1, sinc.sinc2, sinc.sinc3, sinc.sinc4, sinc.rsinc1):
            lo, hi = fn(jnp.array(0.00999)), fn(jnp.array(0.01001))
            assert abs(float(lo) - float(hi)) < 1e-6, fn.__name__

    def test_values_at_zero(self):
        assert float(sinc.sinc1(jnp.array(0.0))) == pytest.approx(1.0)
        assert float(sinc.sinc2(jnp.array(0.0))) == pytest.approx(0.5)
        assert float(sinc.sinc3(jnp.array(0.0))) == pytest.approx(1 / 6)
        assert float(sinc.sinc4(jnp.array(0.0))) == pytest.approx(1 / 24)
        assert float(sinc.rsinc1(jnp.array(0.0))) == pytest.approx(1.0)

    def test_gradients_finite_at_zero(self):
        for fn in (sinc.sinc1, sinc.sinc2, sinc.sinc3, sinc.sinc4, sinc.rsinc1):
            g = jax.grad(lambda t: fn(t).sum())(jnp.array(0.0))
            assert np.isfinite(float(g)), fn.__name__

    def test_analytic_derivatives_match_autodiff(self):
        t = jnp.linspace(-2.0, 2.0, 41)
        for fn, dfn in ((sinc.sinc1, sinc.sinc1_dt),
                        (sinc.sinc2, sinc.sinc2_dt),
                        (sinc.sinc3, sinc.sinc3_dt)):
            auto = jax.vmap(jax.grad(fn))(t)
            np.testing.assert_allclose(auto, dfn(t), rtol=1e-4, atol=3e-5)

    def test_derivative_helpers(self):
        # the remaining reference helpers (se_math/sinc.py:36-48, 66-92):
        # sinc1_dt_rt = sinc1_dt / t, rsinc1_dt = d/dt rsinc1,
        # rsinc1_dt_csc = rsinc1_dt / sin(t)
        t = jnp.linspace(-2.0, 2.0, 41)
        np.testing.assert_allclose(
            sinc.sinc1_dt_rt(t), sinc.sinc1_dt(t) / jnp.where(t == 0, 1, t),
            rtol=1e-4, atol=3e-5)
        auto = jax.vmap(jax.grad(sinc.rsinc1))(t)
        np.testing.assert_allclose(sinc.rsinc1_dt(t), auto, rtol=1e-4,
                                   atol=3e-5)
        mask = jnp.abs(t) > 1e-3
        np.testing.assert_allclose(
            sinc.rsinc1_dt_csc(t)[mask],
            (sinc.rsinc1_dt(t) / jnp.sin(jnp.where(t == 0, 1, t)))[mask],
            rtol=1e-4, atol=3e-5)
        # value at 0 + both sides of the 0.25 Taylor guard vs an f64 oracle
        def oracle_rsinc1_dt(t):
            return (np.sin(t) - t * np.cos(t)) / np.sin(t) ** 2

        for fn, oracle, at0 in (
                (sinc.sinc1_dt_rt,
                 lambda t: (np.cos(t) / t - np.sin(t) / t**2) / t, -1.0 / 3),
                (sinc.rsinc1_dt, oracle_rsinc1_dt, 0.0),
                (sinc.rsinc1_dt_csc,
                 lambda t: oracle_rsinc1_dt(t) / np.sin(t), 1.0 / 3)):
            assert float(fn(jnp.array(0.0))) == pytest.approx(at0, abs=1e-6)
            for tv in (0.2499, 0.2501):  # Taylor side / exact side
                assert float(fn(jnp.array(tv))) == pytest.approx(
                    oracle(np.float64(tv)), abs=2e-6), fn.__name__


class TestSO3:
    def test_exp_matches_scipy(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(32, 3)).astype(np.float32)
        R = so3.exp(jnp.asarray(w))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(32, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(
            0.01, 3.0, size=(32, 1)).astype(np.float32)
        w2 = so3.log(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = (axis * (np.pi - 1e-4)).astype(np.float32)[None]
        w2 = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        R1 = Rotation.from_rotvec(w).as_matrix()
        R2 = Rotation.from_rotvec(w2).as_matrix()
        # near pi the axis recovery from (R - R^T)/(2 sinc1) is inherently
        # ill-conditioned in float32; 1e-2 on the matrices is the f32 floor
        np.testing.assert_allclose(R1, R2, atol=1e-2)

    def test_mat_vec_inverse(self):
        x = jnp.array([[0.3, -0.2, 0.9]])
        np.testing.assert_allclose(so3.vec(so3.mat(x)), x)

    def test_inv_vecs_is_inverse_of_vecs(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(8, 3)).astype(np.float32)
        V = so3.vecs_Xg_ig(jnp.asarray(w))
        H = so3.inv_vecs_Xg_ig(jnp.asarray(w))
        eye = jnp.broadcast_to(jnp.eye(3), V.shape)
        np.testing.assert_allclose(np.asarray(V @ H), np.asarray(eye), atol=1e-5)


class TestSE3:
    def test_exp_rotation_block_matches_scipy(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(16, 6)).astype(np.float32)
        g = se3.exp(jnp.asarray(x))
        R_ref = Rotation.from_rotvec(x[:, :3]).as_matrix()
        np.testing.assert_allclose(np.asarray(g[:, :3, :3]), R_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g[:, 3]), np.tile([0, 0, 0, 1], (16, 1)),
                                   atol=1e-7)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(16, 6)).astype(np.float32) * 0.8
        x2 = se3.log(se3.exp(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)

    def test_inverse(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(8, 6)).astype(np.float32)
        g = se3.exp(jnp.asarray(x))
        gi = se3.inverse(g)
        eye = jnp.broadcast_to(jnp.eye(4), g.shape)
        np.testing.assert_allclose(np.asarray(g @ gi), np.asarray(eye), atol=1e-5)

    def test_exp_of_negative_is_inverse(self):
        x = jnp.array([[0.2, -0.4, 0.1, 0.5, 0.0, -0.3]])
        gi1 = se3.exp(-x)
        gi2 = se3.inverse(se3.exp(x))
        np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi2), atol=1e-6)

    def test_transform_points_matches_columnwise_transform(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
        pts = jnp.asarray(rng.normal(size=(4, 100, 3)).astype(np.float32))
        g = se3.exp(x)
        a = se3.transform_points(g, pts)
        b = jnp.swapaxes(se3.transform(g, jnp.swapaxes(pts, -1, -2)), -1, -2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_grad_through_exp(self):
        def loss(x):
            g = se3.exp(x)
            return jnp.sum((g - jnp.eye(4)) ** 2)

        g = jax.grad(loss)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))
        # at identity, d||exp(x)-I||^2 = 0
        np.testing.assert_allclose(np.asarray(g), np.zeros(6), atol=1e-6)

    def test_mat_vec_roundtrip(self):
        x = jnp.array([[0.1, 0.2, 0.3, 0.4, 0.5, 0.6]])
        np.testing.assert_allclose(np.asarray(se3.vec(se3.mat(x))), np.asarray(x))


class TestRandomTransform:
    def test_igt_maps_p0_to_p1_and_gt_back(self):
        key = jax.random.PRNGKey(0)
        p0 = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
        s = transforms.random_transform_se3(key, p0, mag=0.8)
        p1 = se3.transform_points(s.igt, p0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(s.p1), atol=1e-5)
        p0back = se3.transform_points(s.gt, s.p1)
        np.testing.assert_allclose(np.asarray(p0back), np.asarray(p0), atol=1e-5)

    def test_twist_magnitude(self):
        key = jax.random.PRNGKey(2)
        x = transforms.random_twist(key, mag=0.8)
        assert float(jnp.linalg.norm(x)) == pytest.approx(0.8, abs=1e-5)

    def test_random_mag_bounded(self):
        for i in range(5):
            x = transforms.random_twist(jax.random.PRNGKey(i), mag=0.8,
                                        mag_randomly=True)
            assert float(jnp.linalg.norm(x)) <= 0.8 + 1e-5
