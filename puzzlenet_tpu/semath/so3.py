"""SO(3): rotations and the so(3) Lie algebra in pure jnp.

Capability parity with /root/reference/se_math/so3.py (exp via Rodrigues,
log with the theta = pi branch, vecs_Xg_ig / inv_vecs_Xg_ig). All functions
are batched over arbitrary leading axes and differentiable with plain
``jax.grad`` — the reference's ExpMap autograd Function (so3.py:185-221) is
unnecessary because JAX differentiates the guarded closed form.
"""

import jax.numpy as jnp

from .sinc import sinc1, sinc2, sinc3


# Tiny 3x3 matmuls: force full-f32 precision (TPU default is bf16-level,
# which corrupts rotation orthonormality by ~1e-3).
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


def cross_prod(x, y):
    """Cross product on the last axis ([..., 3] x [..., 3] -> [..., 3])."""
    return jnp.cross(x, y, axis=-1)


def liebracket(x, y):
    return cross_prod(x, y)


def mat(x):
    """Hat operator: [..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
    zero = jnp.zeros_like(x1)
    row0 = jnp.stack([zero, -x3, x2], axis=-1)
    row1 = jnp.stack([x3, zero, -x1], axis=-1)
    row2 = jnp.stack([-x2, x1, zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def vec(X):
    """Vee operator: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([X[..., 2, 1], X[..., 0, 2], X[..., 1, 0]], axis=-1)


def genvec():
    return jnp.eye(3)


def genmat():
    return mat(genvec())


def exp(x):
    """Exponential map so(3) -> SO(3) via Rodrigues.

    R = I + sinc1(t) W + sinc2(t) W^2 with t = |x| (so3.py:61-74).
    """
    x = jnp.asarray(x)
    t = _safe_norm(x)[..., None, None]
    W = mat(x)
    S = _mm(W, W)
    I = jnp.eye(3, dtype=x.dtype)
    return I + sinc1(t) * W + sinc2(t) * S


def inverse(g):
    """SO(3) inverse = transpose."""
    return jnp.swapaxes(g, -1, -2)


def btrace(X):
    """Batch trace over the last two axes."""
    return jnp.trace(X, axis1=-2, axis2=-1)


def log(g):
    """Logarithm map SO(3) -> so(3).

    Capability parity with se_math/so3.py:94-129 but numerically redesigned:
    the reference recovers theta = arccos((tr-1)/2), which in float32 loses
    the residual pi - theta entirely once tr rounds to -1 (already at
    theta ~ pi - 3e-4). Here the angle comes from
    ``atan2(|vee(R - R^T)|/2, (tr-1)/2)``, which keeps full relative
    precision at both ends; the axis comes from the skew part in the generic
    case and (like the reference's pi branch) from the diagonal of the
    symmetric part when sin(theta) underflows it.
    """
    g = jnp.asarray(g)
    skew = (g - jnp.swapaxes(g, -1, -2)) / 2
    s_vec = vec(skew)                      # sin(theta) * axis
    s = _safe_norm(s_vec)                  # sin(theta) >= 0 for theta in [0, pi]
    c = jnp.clip((btrace(g) - 1) / 2, -1.0, 1.0)
    t = jnp.arctan2(s, c)                  # theta in [0, pi]

    # Generic branch: w = theta / sin(theta) * s_vec (guarded at s = 0).
    s_safe = jnp.where(s < 1e-6, jnp.ones_like(s), s)
    factor = jnp.where(s < 1e-6, jnp.ones_like(s), t / s_safe)
    w_main = factor[..., None] * s_vec

    # Near-pi branch: axis^2 from the diagonal, a_i^2 = (R_ii - c)/(1 - c);
    # signs from the symmetric off-diagonals (a_i a_j (1 - c)), with a_1 >= 0
    # (the overall sign is ambiguous at exactly pi, as in the reference).
    one_minus_c = jnp.maximum(1.0 - c, 1e-12)[..., None]
    diag = jnp.stack([g[..., 0, 0], g[..., 1, 1], g[..., 2, 2]], axis=-1)
    a_sq = jnp.clip((diag - c[..., None]) / one_minus_c, 0.0, 1.0)
    a_abs = jnp.sqrt(a_sq)
    sym02 = g[..., 0, 2] + g[..., 2, 0]
    sym12 = g[..., 1, 2] + g[..., 2, 1]
    sgn_3 = jnp.where(sym02 < 0, -1.0, 1.0)
    sgn_2 = jnp.where(sym12 < 0, -1.0, 1.0) * sgn_3
    axis = jnp.stack(
        [a_abs[..., 0], a_abs[..., 1] * sgn_2, a_abs[..., 2] * sgn_3], axis=-1)
    w_pi = t[..., None] * axis

    near_pi = (c < 0) & (s < 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_main)


def transform(g, a):
    """Rotate points: g [..., 3, 3] applied to a [..., 3] or [..., 3, N]."""
    if g.ndim == a.ndim:
        return _mm(g, a)
    return jnp.squeeze(_mm(g, a[..., None]), -1)


def group_prod(g, h):
    return _mm(g, h)


def vecs_Xg_ig(x):
    """V(x) = I + sinc2(t) W + sinc3(t) W^2 (left Jacobian of SO(3))."""
    t = _safe_norm(x)[..., None, None]
    X = mat(x)
    S = _mm(X, X)
    I = jnp.eye(3, dtype=x.dtype)
    return I + sinc2(t) * X + sinc3(t) * S


def inv_vecs_Xg_ig(x):
    """H = V(x)^{-1} = I - W/2 + eta(t) W^2 (so3.py:166-182).

    eta(t) = (1 - (t/2) cot(t/2)) / t^2 with an O(t^8) Taylor guard below
    t = 0.01.
    """
    x = jnp.asarray(x)
    t = _safe_norm(x)[..., None, None]
    X = mat(x)
    S = _mm(X, X)
    I = jnp.eye(3, dtype=x.dtype)

    small = t < 0.01
    t_safe = jnp.where(small, jnp.ones_like(t), t)
    t2 = t * t
    eta_taylor = ((t2 / 40 + 1) * t2 / 42 + 1) * t2 / 720 + 1.0 / 12
    eta_exact = (1 - (t_safe / 2) / jnp.tan(t_safe / 2)) / (t_safe * t_safe)
    eta = jnp.where(small, eta_taylor, eta_exact)

    return I - 0.5 * X + eta * S
