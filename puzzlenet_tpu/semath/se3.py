"""SE(3): rigid-body transforms and the se(3) Lie algebra in pure jnp.

Capability parity with /root/reference/se_math/se3.py (twist <-> matrix
conversions, exp/log via Rodrigues + V-matrix, transform, inverse). Twists
are 6-vectors [w, v] with w the rotation part. Everything is batched over
arbitrary leading axes; ``jax.grad`` flows through exp directly, replacing
the reference's generator-based ExpMap.backward (se3.py:129-165).
"""

import jax.numpy as jnp

from . import so3
from .sinc import sinc1, sinc2, sinc3

# Lie math operates on tiny 3x3/4x4 matrices where TPU's default
# bf16-precision matmul passes would inject ~1e-3 orthonormality error into
# every rotation; force full-f32 MXU passes (cost is negligible at this size).
def _safe_norm(x):
    """L2 norm over the last axis with a NaN-free gradient at x = 0.

    jnp.linalg.norm has a NaN gradient at 0 (d|x|/dx = x/|x|); this is the
    reason the reference needed hand-written ExpMap.backward functions. The
    double-where trick gives the correct (zero) derivative contribution at
    the origin so plain jax.grad works everywhere.
    """
    sq = jnp.sum(x * x, axis=-1)
    zero = sq == 0
    safe = jnp.where(zero, jnp.ones_like(sq), sq)
    return jnp.where(zero, jnp.zeros_like(sq), jnp.sqrt(safe))


def _mm(a, b):
    return jnp.matmul(a, b, precision="highest")


def twist_prod(x, y):
    """Lie bracket of twists (se3.py:7-19)."""
    xw, xv = x[..., 0:3], x[..., 3:6]
    yw, yv = y[..., 0:3], y[..., 3:6]
    zw = so3.cross_prod(xw, yw)
    zv = so3.cross_prod(xw, yv) + so3.cross_prod(xv, yw)
    return jnp.concatenate([zw, zv], axis=-1)


def liebracket(x, y):
    return twist_prod(x, y)


def mat(x):
    """se(3) hat: [..., 6] -> [..., 4, 4]."""
    w, v = x[..., 0:3], x[..., 3:6]
    W = so3.mat(w)
    top = jnp.concatenate([W, v[..., None]], axis=-1)
    bottom = jnp.zeros(x.shape[:-1] + (1, 4), dtype=x.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def vec(X):
    """se(3) vee: [..., 4, 4] -> [..., 6]."""
    w = jnp.stack([X[..., 2, 1], X[..., 0, 2], X[..., 1, 0]], axis=-1)
    v = X[..., 0:3, 3]
    return jnp.concatenate([w, v], axis=-1)


def genvec():
    return jnp.eye(6)


def genmat():
    return mat(genvec())


def exp(x):
    """Exponential map se(3) -> SE(3) (se3.py:57-80).

    R = I + sinc1(t) W + sinc2(t) W^2,  V = I + sinc2(t) W + sinc3(t) W^2,
    p = V v, with t = |w|.
    """
    x = jnp.asarray(x)
    w, v = x[..., 0:3], x[..., 3:6]
    t = _safe_norm(w)[..., None, None]
    W = so3.mat(w)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=x.dtype)

    R = I + sinc1(t) * W + sinc2(t) * S
    V = I + sinc2(t) * W + sinc3(t) * S
    p = jnp.squeeze(_mm(V, v[..., None]), -1)

    return _rp_to_g(R, p)


def _rp_to_g(R, p):
    """Assemble [..., 3, 3] + [..., 3] into [..., 4, 4] homogeneous form."""
    top = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(g):
    """SE(3) inverse: [R, p] -> [R^T, -R^T p] (se3.py:83-94)."""
    R = g[..., 0:3, 0:3]
    p = g[..., 0:3, 3]
    Q = jnp.swapaxes(R, -1, -2)
    q = -jnp.squeeze(_mm(Q, p[..., None]), -1)
    return _rp_to_g(Q, q)


def log(g):
    """Logarithm map SE(3) -> se(3) (se3.py:97-107)."""
    R = g[..., 0:3, 0:3]
    p = g[..., 0:3, 3]
    w = so3.log(R)
    H = so3.inv_vecs_Xg_ig(w)
    v = jnp.squeeze(_mm(H, p[..., None]), -1)
    return jnp.concatenate([w, v], axis=-1)


def transform(g, a):
    """Apply SE(3): g [..., 4, 4] to points a.

    Matches se3.transform (se3.py:110-120): if a has the same rank as g it is
    treated as [..., 3, N] (column points); otherwise as [..., 3] with
    broadcasting over leading axes.
    """
    R = g[..., 0:3, 0:3]
    p = g[..., 0:3, 3]
    if g.ndim == a.ndim:
        return _mm(R, a) + p[..., None]
    return jnp.squeeze(_mm(R, a[..., None]), -1) + p


def transform_points(g, pts):
    """Apply SE(3) g [..., 4, 4] to row-point clouds pts [..., N, 3].

    TPU-friendly convenience (one matmul, no permutes) equivalent to the
    reference's ``transform(g, pc.permute(0,2,1)).permute(0,2,1)`` idiom
    (model5_b.py:948-949).
    """
    R = g[..., 0:3, 0:3]
    p = g[..., 0:3, 3]
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + p[..., None, :]


def group_prod(g, h):
    return _mm(g, h)
