"""Metrics oracle tests against scipy + the reference formulas
(reference metrics.py; on-device Euler extraction vs scipy Rotation)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from puzzlenet_tpu import metrics
from puzzlenet_tpu.semath import se3


def _random_rotations(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3)) * scale
    return Rotation.from_rotvec(w).as_matrix().astype(np.float32)


class TestEuler:
    def test_matches_scipy_xyz_extrinsic(self):
        R = _random_rotations(64, 0)
        ours = np.asarray(metrics.euler_xyz_degrees(jnp.asarray(R)))
        ref = Rotation.from_matrix(R).as_euler("xyz", degrees=True)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_small_rotations(self):
        R = _random_rotations(64, 1, scale=0.05)
        ours = np.asarray(metrics.euler_xyz_degrees(jnp.asarray(R)))
        ref = Rotation.from_matrix(R).as_euler("xyz", degrees=True)
        np.testing.assert_allclose(ours, ref, atol=1e-3)


class TestPoseMetrics:
    def test_zero_error_for_exact_prediction(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32) * 0.5)
        igt = se3.exp(x)
        # perfect prediction: the net predicts igt^{-1} (model5_b.py:947-952)
        pred = se3.inverse(igt)
        R, t = pred[:, :3, :3], pred[:, :3, 3]
        r_mse, r_mae, t_mse, t_mae, r_iso, t_iso = metrics.compute_pose_metrics(
            R, t, igt)
        for m in (r_mse, r_mae, t_mse, t_mae, t_iso):
            np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-3)
        # arccos near 1 amplifies f32 roundoff: 1 ulp below 1.0 already gives
        # 0.028 deg, so the geodesic error needs a looser floor.
        np.testing.assert_allclose(np.asarray(r_iso), 0.0, atol=0.05)

    def test_anisotropic_matches_reference_formula(self):
        R1 = _random_rotations(16, 3)
        R2 = _random_rotations(16, 4)
        e1 = Rotation.from_matrix(R1).as_euler("xyz", degrees=True)
        e2 = Rotation.from_matrix(R2).as_euler("xyz", degrees=True)
        ref_mse = np.mean((e1 - e2) ** 2, axis=-1)
        ref_mae = np.mean(np.abs(e1 - e2), axis=-1)
        mse, mae = metrics.anisotropic_R_error(jnp.asarray(R1), jnp.asarray(R2))
        np.testing.assert_allclose(np.asarray(mse), ref_mse, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(mae), ref_mae, rtol=1e-3, atol=1e-3)

    def test_isotropic_R_known_angle(self):
        ang = 30.0
        R1 = Rotation.from_euler("z", ang, degrees=True).as_matrix().astype(
            np.float32)[None]
        R2 = np.eye(3, dtype=np.float32)[None]
        err = metrics.isotropic_R_error(jnp.asarray(R1), jnp.asarray(R2))
        np.testing.assert_allclose(np.asarray(err), [ang], atol=1e-3)

    def test_inv_R_t(self):
        R = jnp.asarray(_random_rotations(4, 5))
        t = jnp.asarray(np.random.default_rng(6).normal(size=(4, 3)).astype(
            np.float32))
        Ri, ti = metrics.inv_R_t(R, t)
        # applying (Ri, ti) after (R, t) is identity
        pts = jnp.asarray(np.random.default_rng(7).normal(size=(4, 10, 3)).astype(
            np.float32))
        moved = pts @ jnp.swapaxes(R, -1, -2) + t[:, None]
        back = moved @ jnp.swapaxes(Ri, -1, -2) + ti[:, None]
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
