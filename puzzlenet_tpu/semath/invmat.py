"""Batched matrix inverse.

Capability parity with /root/reference/se_math/invmat.py (batch_inverse plus
an autograd Function carrying the analytic gradient dX^-1 = -X^-1 dX X^-1).
In JAX, ``jnp.linalg.inv`` already has this exact VJP built in, so the module
reduces to thin, batched wrappers kept for API parity; ``batch_inverse_dx``
exposes the analytic derivative tensor for tests.
"""

import jax.numpy as jnp


def batch_inverse(x):
    """Inverse of [..., N, N]."""
    return jnp.linalg.inv(x)


def batch_inverse_dx(y):
    """d(X^-1)/dX evaluated via Y = X^-1: out[..., i, j, k, l] = -Y[i,k] Y[l,j]
    (invmat.py:21-38)."""
    return -jnp.einsum("...ik,...lj->...ijkl", y, y)


def batch_pinv(x):
    """Left pseudo-inverse (X^T X)^-1 X^T for [..., M, N], M >= N
    (the forward of invmat.py:41-63; its analytic derivative is what
    ``jax.jacobian(batch_pinv)`` computes)."""
    xt = jnp.swapaxes(x, -1, -2)
    return batch_inverse(xt @ x) @ xt


inv = batch_inverse
