"""Closed-form SE(3)/SO(3) Jacobians (tangent order [omega, v]).

Analytic replacements for autodiff linearization of the factor residuals:
the reference differentiates numerically (cylinderFactor.cpp:40-49), autodiff
mirrors that but produces large XLA graphs; these closed forms compile and
run an order of magnitude faster.

Conventions: right retraction X <- X * Exp(xi); Exp/Log as in se3.py.
Formulas follow Barfoot, "State Estimation for Robotics" (Q matrix eq. 7.86,
adapted to [omega, v] ordering), validated against jax.jacfwd in
tests/test_jacobians.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3


def _theta2(omega):
    return jnp.sum(omega * omega, axis=-1)[..., None, None]


def so3_left_jacobian(omega):
    th2 = _theta2(omega)
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    W = se3.skew(omega)
    W2 = W @ W
    small = th2 < 1e-8
    a = jnp.where(small, 0.5 - th2 / 24.0, (1 - jnp.cos(th)) / th2)
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / (th2 * th))
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * W + b * W2


def so3_left_jacobian_inv(omega):
    th2 = _theta2(omega)
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    W = se3.skew(omega)
    W2 = W @ W
    small = th2 < 1e-8
    half = 0.5 * th
    cot_term = jnp.where(
        small, 1.0 / 12.0 + th2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / th2)
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye - 0.5 * W + cot_term * W2


def se3_Q(omega, v):
    """The off-diagonal block of the SE(3) left Jacobian (Barfoot 7.86 with
    phi = omega, rho = v)."""
    th2 = _theta2(omega)
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    small = th2 < 1e-8
    W = se3.skew(omega)
    V = se3.skew(v)
    WV, VW = W @ V, V @ W
    WVW = WV @ W
    th3 = th2 * th
    th4 = th2 * th2
    th5 = th4 * th
    c1 = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                   (th - jnp.sin(th)) / th3)
    c2 = jnp.where(small, 1.0 / 24.0 - th2 / 720.0,
                   (1.0 - 0.5 * th2 - jnp.cos(th)) / th4)
    c3 = jnp.where(small, -(1.0 / 120.0) + th2 / 2520.0,
                   (th - jnp.sin(th) - th3 / 6.0) / th5)
    # 0.5*(c2 - 3*c3) coefficient of the 4th-order terms (Barfoot 7.86)
    c4 = 0.5 * (c2 - 3.0 * c3)
    return (0.5 * V
            + c1 * (WV + VW + WVW)
            - c2 * (W @ W @ V + V @ W @ W - 3.0 * WVW)
            - c4 * (WVW @ W + W @ WVW))


def se3_left_jacobian_inv(xi):
    omega, v = xi[..., :3], xi[..., 3:6]
    Jinv = so3_left_jacobian_inv(omega)
    Q = se3_Q(omega, v)
    top = jnp.concatenate([Jinv, jnp.zeros_like(Jinv)], axis=-1)
    bottom = jnp.concatenate([-Jinv @ Q @ Jinv, Jinv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_right_jacobian_inv(xi):
    """Jr^{-1}(xi) = Jl^{-1}(-xi)."""
    return se3_left_jacobian_inv(-xi)


def se3_adjoint(pose):
    """Ad_T as a 6x6 on [omega, v]: [R w; [t]x R w + R v]."""
    R = se3.quat_to_matrix(se3.quat(pose))
    t = se3.trans(pose)
    tx = se3.skew(t)
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, z], axis=-1)
    bottom = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
