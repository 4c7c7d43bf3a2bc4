"""Taylor-guarded sinc family.

Capability parity with /root/reference/se_math/sinc.py:6-168 (sinc1/2/3/4,
rsinc1, each with an |t| < 0.01 Taylor branch for numerical stability near 0).
The reference pairs each function with a hand-written autograd Function
(sinc.py:171-241); here the guarded branches are written with the double-where
trick so plain ``jax.grad`` produces finite, correct derivatives at t = 0 and
no custom VJPs are required.
"""

import jax.numpy as jnp

# The reference branches to Taylor below |t| < 0.01 (sinc.py:8), which in
# float32 leaves the closed forms exposed to catastrophic cancellation just
# above the guard (e.g. (1-cos t)/t^2 at t=0.0101 is only ~3 decimal digits).
# The O(t^8) Taylor series here are float32-exact well past t=0.25, so the
# guard is widened to 0.25: strictly more accurate than the reference, same
# semantics.
_EPS = 0.25


def _guard(t, small):
    """Return (t_safe, use_taylor) where t_safe == `small` wherever the
    Taylor branch will be selected, so the trig branch never evaluates (or
    differentiates) a near-zero denominator."""
    use_taylor = jnp.abs(t) < _EPS
    t_safe = jnp.where(use_taylor, jnp.ones_like(t) * small, t)
    return t_safe, use_taylor


def sinc1(t):
    """sinc1: t -> sin(t)/t."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = 1 - t2 / 6 * (1 - t2 / 20 * (1 - t2 / 42))  # O(t^8)
    exact = jnp.sin(t_safe) / t_safe
    return jnp.where(use_taylor, taylor, exact)


def sinc1_dt(t):
    """d/dt sinc1 = cos(t)/t - sin(t)/t^2."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = -t / 3 * (1 - t2 / 10 * (1 - t2 / 28 * (1 - t2 / 54)))
    exact = jnp.cos(t_safe) / t_safe - jnp.sin(t_safe) / (t_safe * t_safe)
    return jnp.where(use_taylor, taylor, exact)


def sinc1_dt_rt(t):
    """d/dt(sinc1) / t (reference se_math/sinc.py:36-48)."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = -(1.0 / 3) * (1 - t2 / 10 * (1 - t2 / 28 * (1 - t2 / 54)))
    exact = (jnp.cos(t_safe) / t_safe - jnp.sin(t_safe) / (t_safe * t_safe)) / t_safe
    return jnp.where(use_taylor, taylor, exact)


def rsinc1(t):
    """rsinc1: t -> t/sin(t)."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = (((31 * t2) / 42 + 7) * t2 / 60 + 1) * t2 / 6 + 1
    exact = t_safe / jnp.sin(t_safe)
    return jnp.where(use_taylor, taylor, exact)


def rsinc1_dt(t):
    """d/dt(rsinc1) (reference se_math/sinc.py:66-77)."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = ((((127 * t2) / 30 + 31) * t2 / 28 + 7) * t2 / 30 + 1) * t / 3
    sin_t = jnp.sin(t_safe)
    # (sin t - t cos t)/sin^2 is the reference's 1/sin - t cos/sin^2
    # rearranged to subtract before dividing (the two ~1/t-sized quotients
    # cancel catastrophically in f32 near the guard)
    exact = (sin_t - t_safe * jnp.cos(t_safe)) / (sin_t * sin_t)
    return jnp.where(use_taylor, taylor, exact)


def rsinc1_dt_csc(t):
    """d/dt(rsinc1) / sin(t) (reference se_math/sinc.py:81-92)."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = t2 * (t2 * ((4 * t2) / 675 + 2.0 / 63) + 2.0 / 15) + 1.0 / 3
    sin_t = jnp.sin(t_safe)
    exact = (sin_t - t_safe * jnp.cos(t_safe)) / (sin_t * sin_t * sin_t)
    return jnp.where(use_taylor, taylor, exact)


def sinc2(t):
    """sinc2: t -> (1 - cos(t)) / t^2."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = 0.5 * (1 - t2 / 12 * (1 - t2 / 30 * (1 - t2 / 56)))
    # half-angle form 2 sin^2(t/2) / t^2 avoids the 1 - cos(t) cancellation
    half_sin = jnp.sin(t_safe / 2)
    exact = 2 * half_sin * half_sin / (t_safe * t_safe)
    return jnp.where(use_taylor, taylor, exact)


def sinc2_dt(t):
    """d/dt sinc2 = sin(t)/t^2 - 2(1-cos(t))/t^3."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = -t / 12 * (1 - t2 / 5 * (1.0 / 3 - t2 / 56 * (1.0 / 2 - t2 / 135)))
    ts2 = t_safe * t_safe
    exact = jnp.sin(t_safe) / ts2 - 2 * (1 - jnp.cos(t_safe)) / (ts2 * t_safe)
    return jnp.where(use_taylor, taylor, exact)


def sinc3(t):
    """sinc3: t -> (t - sin(t)) / t^3."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = 1.0 / 6 * (1 - t2 / 20 * (1 - t2 / 42 * (1 - t2 / 72)))
    exact = (t_safe - jnp.sin(t_safe)) / (t_safe ** 3)
    return jnp.where(use_taylor, taylor, exact)


def sinc3_dt(t):
    """d/dt sinc3 = (3 sin(t) - t(cos(t) + 2)) / t^4."""
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = -t / 60 * (1 - t2 / 21 * (1 - t2 / 24 * (1.0 / 2 - t2 / 165)))
    exact = (3 * jnp.sin(t_safe) - t_safe * (jnp.cos(t_safe) + 2)) / (t_safe ** 4)
    return jnp.where(use_taylor, taylor, exact)


def sinc4(t):
    """sinc4: t -> (1/2 - sinc2(t)) / t^2.

    Note the reference's sinc4 (se_math/sinc.py:156-168) computes this value
    but is missing its ``return`` statement (a latent bug); this version
    returns it.
    """
    t = jnp.asarray(t)
    t_safe, use_taylor = _guard(t, 1.0)
    t2 = t * t
    taylor = 1.0 / 24 * (1 - t2 / 30 * (1 - t2 / 56 * (1 - t2 / 90)))
    ts2 = t_safe * t_safe
    exact = (0.5 - (1 - jnp.cos(t_safe)) / ts2) / ts2
    return jnp.where(use_taylor, taylor, exact)
