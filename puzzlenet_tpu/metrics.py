"""Registration error metrics, fully on-device.

Capability parity with /root/reference/metrics.py. The reference computes the
anisotropic rotation errors by shipping every matrix to the host and calling
scipy's Euler extraction per sample (metrics.py:19-31) — a D2H sync per batch.
Here the Euler-xyz (extrinsic) angles are extracted in closed form in jnp so
the whole 10-metric suite stays inside jit. ``tests/test_metrics.py`` checks
the extraction against scipy.spatial.transform.Rotation.
"""

import jax.numpy as jnp


# Metric matmuls are 3x3: keep them in full f32 on TPU.
def _mm(a, b):
    return jnp.matmul(a, b, precision="highest")


def euler_xyz_degrees(R):
    """Extrinsic x-y-z Euler angles in degrees from R [..., 3, 3].

    For R = Rz(c) @ Ry(b) @ Rx(a) (scipy's ``as_euler('xyz')`` convention):
      a = atan2(R21, R22), b = asin(-R20), c = atan2(R10, R00).
    Gimbal-lock (|R20| ~ 1) resolves like scipy: set a = 0 and fold the
    remaining rotation into c.
    """
    r20 = jnp.clip(R[..., 2, 0], -1.0, 1.0)
    b = -jnp.arcsin(r20)
    locked = jnp.abs(r20) > 1.0 - 1e-7

    a = jnp.where(
        locked,
        jnp.zeros_like(b),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    c = jnp.where(
        locked,
        jnp.arctan2(-R[..., 0, 1], R[..., 1, 1]),
        jnp.arctan2(R[..., 1, 0], R[..., 0, 0]),
    )
    return jnp.stack([a, b, c], axis=-1) * (180.0 / jnp.pi)


def inv_R_t(R, t):
    """Invert rigid (R, t): returns (R^T, -R^T t) (metrics.py:7-10)."""
    inv_R = jnp.swapaxes(R, -1, -2)
    inv_t = -jnp.squeeze(_mm(inv_R, t[..., None]), -1)
    return inv_R, inv_t


def anisotropic_R_error(r1, r2):
    """Per-sample MSE/MAE of Euler-xyz angle differences in degrees
    (metrics.py:12-34)."""
    e1 = euler_xyz_degrees(r1)
    e2 = euler_xyz_degrees(r2)
    diff = e1 - e2
    return jnp.mean(diff ** 2, axis=-1), jnp.mean(jnp.abs(diff), axis=-1)


def anisotropic_t_error(t1, t2):
    """Per-sample translation MSE/MAE (metrics.py:37-51)."""
    diff = t1 - t2
    return jnp.mean(diff ** 2, axis=-1), jnp.mean(jnp.abs(diff), axis=-1)


def isotropic_R_error(r1, r2):
    """Geodesic rotation error in degrees: acos((tr(R2^T R1) - 1)/2)
    (metrics.py:54-70)."""
    r1r2 = _mm(jnp.swapaxes(r2, -1, -2), r1)
    tr = r1r2[..., 0, 0] + r1r2[..., 1, 1] + r1r2[..., 2, 2]
    rads = jnp.arccos(jnp.clip((tr - 1) / 2, -1.0, 1.0))
    return rads * (180.0 / jnp.pi)


def isotropic_t_error(t1, t2, R2):
    """|| inv(R2) t1 + inv_t2 || where (R2, t2) is the GT pair
    (metrics.py:73-84)."""
    R2i, t2i = inv_R_t(R2, t2)
    err = jnp.squeeze(_mm(R2i, t1[..., None]), -1) + t2i
    return jnp.linalg.norm(err, axis=-1)


def compute_pose_metrics(R, t, igt):
    """The 6 pose metrics against inv(igt), as in TouchedRegraster.compute_metrics
    (model5_b.py:1426-1440). Returns per-sample arrays:
    (r_mse, r_mae, t_mse, t_mae, r_isotropic, t_isotropic)."""
    gtR = igt[..., :3, :3]
    gtt = igt[..., :3, 3]
    inv_R, inv_t = inv_R_t(gtR, gtt)
    r_mse, r_mae = anisotropic_R_error(R, inv_R)
    t_mse, t_mae = anisotropic_t_error(t, inv_t)
    r_iso = isotropic_R_error(R, inv_R)
    t_iso = isotropic_t_error(t, inv_t, inv_R)
    return r_mse, r_mae, t_mse, t_mae, r_iso, t_iso
