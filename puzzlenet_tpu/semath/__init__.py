"""Lie-group math for rigid motion: sinc family, SO(3), SE(3).

Pure-jnp re-design of the reference's ``se_math`` package
(/root/reference/se_math/{sinc,so3,se3}.py). Unlike the reference, no custom
autograd Functions are needed: JAX differentiates the Taylor-guarded closed
forms directly (the guards use the double-where trick so gradients stay
finite at t=0).
"""

from . import se3, sinc, so3
from .sinc import sinc1, sinc2, sinc3, sinc4, rsinc1, rsinc1_dt

__all__ = ["se3", "so3", "sinc", "sinc1", "sinc2", "sinc3", "sinc4",
           "rsinc1", "rsinc1_dt"]
