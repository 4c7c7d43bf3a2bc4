"""Host-side (numpy) rigid augmentation.

Numpy twins of semath.se3/transforms for the data-worker path, so per-item
augmentation never round-trips through the device. Semantics match
RandomTransformSE3 (se_math/transforms.py:151-197): unit twist scaled by mag
(or U[0,1)*mag), igt = exp(x) maps p0 -> p1.
"""

import numpy as np


def se3_exp_np(x):
    """Twist [6] -> SE(3) [4, 4] via Rodrigues + V-matrix (float64 internal,
    float32 out)."""
    x = np.asarray(x, np.float64)
    w, v = x[:3], x[3:]
    t = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]],
                  [w[2], 0, -w[0]],
                  [-w[1], w[0], 0]])
    S = K @ K
    if t < 1e-8:
        s1, s2, s3 = 1.0, 0.5, 1.0 / 6
    else:
        s1 = np.sin(t) / t
        s2 = (1 - np.cos(t)) / t ** 2
        s3 = (t - np.sin(t)) / t ** 3
    R = np.eye(3) + s1 * K + s2 * S
    V = np.eye(3) + s2 * K + s3 * S
    g = np.eye(4)
    g[:3, :3] = R
    g[:3, 3] = V @ v
    return g.astype(np.float32)


def random_twist_np(rng, mag=0.8, mag_randomly=False):
    x = rng.standard_normal(6)
    x = x / np.linalg.norm(x)
    amp = mag * (rng.random() if mag_randomly else 1.0)
    return (x * amp).astype(np.float32)


def random_se3_np(rng, p0, mag=0.8, mag_randomly=False):
    """Returns (p1, igt, gt, x). p1 = igt . p0 (row points)."""
    x = random_twist_np(rng, mag, mag_randomly)
    igt = se3_exp_np(x)
    gt = se3_exp_np(-x)
    p1 = p0 @ igt[:3, :3].T + igt[:3, 3]
    return p1.astype(np.float32), igt, gt, x


def transform_np(g, pts):
    return (pts @ g[:3, :3].T + g[:3, 3]).astype(np.float32)


def fps_np(points, npoint, rng=None, start=None):
    """Host FPS (iterated max-min), matching dataset.py:1147-1163.

    Returns the sampled points (like the reference) or None if fewer than
    npoint inputs. Seeded via ``rng`` (reference uses np.random.randint).
    Prefers the C++ kernel in puzzlenet_tpu/native when built.
    """
    n = points.shape[0]
    if n < npoint:
        return None
    if start is None:
        start = int(rng.integers(0, n)) if rng is not None else 0

    try:
        from ..native import fps_native
        idx = fps_native(np.ascontiguousarray(points[:, :3], np.float32),
                         npoint, start)
        return points[idx]
    except (ImportError, OSError):
        pass

    xyz = points[:, :3]
    dist = np.full(n, np.inf)
    far = start
    out = np.empty(npoint, np.int64)
    for i in range(npoint):
        out[i] = far
        d = ((xyz - xyz[far]) ** 2).sum(-1)
        np.minimum(dist, d, out=dist)
        far = int(np.argmax(dist))
    return points[out]
