"""Random rigid perturbations and point-cloud normalizers (functional).

Capability parity with /root/reference/se_math/transforms.py. The reference's
stateful torch transform objects become pure functions over explicit
``jax.random`` keys; each random transform returns the transformed points and
the ground-truth matrices it sampled.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3, so3


class RigidSample(NamedTuple):
    """Result of a random rigid perturbation.

    Mirrors RandomTransformSE3's stored state (transforms.py:178-187):
    p1 = transformed points, igt maps p0 -> p1, gt = igt^{-1} maps p1 -> p0,
    x is the sampled twist.
    """

    p1: jax.Array
    igt: jax.Array
    gt: jax.Array
    x: jax.Array


def random_twist(key, mag=0.8, mag_randomly=False, dtype=jnp.float32):
    """Sample a twist: unit-norm 6-vector scaled by mag (or U[0,1)*mag).

    Matches RandomTransformSE3.generate_transform (transforms.py:161-176).
    """
    k_dir, k_amp = jax.random.split(key)
    x = jax.random.normal(k_dir, (6,), dtype=dtype)
    x = x / jnp.linalg.norm(x)
    amp = jnp.asarray(mag, dtype)
    if mag_randomly:
        amp = amp * jax.random.uniform(k_amp, (), dtype=dtype)
    return x * amp


def random_transform_se3(key, p0, mag=0.8, mag_randomly=False):
    """Apply a random SE(3) twist of magnitude ``mag`` to points p0 [N, 3].

    Matches RandomTransformSE3.apply_transform (transforms.py:178-187):
    igt = exp(x) maps p0 to p1, gt = exp(-x) maps p1 back to p0.
    """
    x = random_twist(key, mag, mag_randomly, dtype=p0.dtype)
    igt = se3.exp(x)
    gt = se3.exp(-x)
    p1 = se3.transform_points(igt, p0)
    return RigidSample(p1=p1, igt=igt, gt=gt, x=x)


def apply_twist(x, p0):
    """Apply a fixed twist x [..., 6] to row points p0 [..., N, 3]."""
    return se3.transform_points(se3.exp(x), p0)


def on_unit_sphere(pts, zero_mean=False):
    """Scale to the unit sphere (transforms.py:21-33)."""
    v = pts - pts.mean(axis=0, keepdims=True) if zero_mean else pts
    nmax = jnp.max(jnp.linalg.norm(v, axis=1))
    return v / nmax


def on_unit_cube(pts):
    """Scale to a unit cube, centered (transforms.py:47-51, method2)."""
    extent = jnp.max(pts, axis=0) - jnp.min(pts, axis=0)
    v = pts / jnp.max(extent)
    return v - v.mean(axis=0, keepdims=True)


def resample(key, pts, num):
    """Random resample [N, D] -> [num, D] without replacement per cycle
    (transforms.py:58-76)."""
    n = pts.shape[0]
    reps = -(-num // n)
    keys = jax.random.split(key, reps)
    idx = jnp.concatenate([jax.random.permutation(k, n) for k in keys])[:num]
    return pts[idx]


def random_translate(key, pts, mag=1.0, randomly=True):
    """Random unit-direction translation scaled by mag (transforms.py:79-96)."""
    k_amp, k_dir = jax.random.split(key)
    amp = jax.random.uniform(k_amp, ()) if randomly else 1.0
    t = jax.random.normal(k_dir, (3,), dtype=pts.dtype)
    t = t / jnp.linalg.norm(t) * amp * mag
    g = jnp.eye(4, dtype=pts.dtype).at[0:3, 3].set(t)
    return pts + t, g


def random_rotator(key, pts, mag=jnp.pi, randomly=True):
    """Random axis-angle rotation of magnitude up to mag (transforms.py:99-115)."""
    k_amp, k_dir = jax.random.split(key)
    amp = jax.random.uniform(k_amp, ()) if randomly else 1.0
    w = jax.random.normal(k_dir, (3,), dtype=pts.dtype)
    w = w / jnp.linalg.norm(w) * amp * mag
    g = so3.exp(w)
    return pts @ g.T, g


def random_rotator_z(key, pts):
    """Random rotation about z by U[0, 2pi) (transforms.py:118-129)."""
    ang = jax.random.uniform(key, (), dtype=pts.dtype) * 2 * jnp.pi
    w = jnp.array([0.0, 0.0, 1.0], dtype=pts.dtype) * ang
    g = so3.exp(w)
    return pts @ g.T, g


def random_jitter(key, pts, scale=0.01, clip=0.05):
    """Clipped Gaussian jitter (transforms.py:132-148)."""
    noise = jnp.clip(jax.random.normal(key, pts.shape, dtype=pts.dtype) * scale,
                     -clip, clip)
    return pts + noise
