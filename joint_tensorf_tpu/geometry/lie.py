"""SE(3)/SO(3) Lie algebra maps (pure jnp, fully differentiable).

Semantics follow the reference's Taylor-series formulation
(/root/reference/camera.py:59-145): the A,B,C coefficients of the exponential
map are evaluated as truncated Taylor series (nth=8 for the se(3) forward map,
nth=10 elsewhere) instead of closed form.  The series form is smooth and
stable at theta -> 0, which matters because pose gradients flow through these
maps during joint optimization.  On TPU they compile to a handful of fused
VPU ops.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def taylor_A(x, nth: int = 10):
    """Taylor expansion of sin(x)/x (reference camera.py:122)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * (x ** (2 * i) / denom)
    return ans


def taylor_B(x, nth: int = 10):
    """Taylor expansion of (1-cos(x))/x**2 (reference camera.py:130)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * (x ** (2 * i) / denom)
    return ans


def taylor_C(x, nth: int = 10):
    """Taylor expansion of (x-sin(x))/x**3 (reference camera.py:138)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * (x ** (2 * i) / denom)
    return ans


def _taylor_A_sq(x2, nth: int = 10):
    """taylor_A evaluated from x^2 — smooth at 0 (no sqrt in the graph)."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * (x2**i / denom)
    return ans


def _taylor_B_sq(x2, nth: int = 10):
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * (x2**i / denom)
    return ans


def _taylor_C_sq(x2, nth: int = 10):
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * (x2**i / denom)
    return ans


def skew(w):
    """[...,3] -> [...,3,3] skew-symmetric matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([O, -w2, w1], axis=-1),
            jnp.stack([w2, O, -w0], axis=-1),
            jnp.stack([-w1, w0, O], axis=-1),
        ],
        axis=-2,
    )


def so3_to_SO3(w):
    """Exponential map so(3) -> SO(3). [...,3] -> [...,3,3].

    The series coefficients are evaluated in theta^2 so the map (and its
    gradient) is smooth at w = 0 — the pose embedding is zero-initialized
    and optimized from there, so exp must be differentiable at the origin.
    """
    wx = skew(w)
    th2 = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = _taylor_A_sq(th2)
    B = _taylor_B_sq(th2)
    return I + A * wx + B * (wx @ wx)


def SO3_to_so3(R, eps: float = 1e-7):
    """Log map SO(3) -> so(3). [...,3,3] -> [...,3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
    theta = jnp.mod(theta, np.pi)[..., None, None]
    lnR = 1 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu, nth: int = 8):
    """Exponential map se(3) -> SE(3). [...,6] -> [...,3,4] = [R|t].

    nth=8 matches the reference forward map (camera.py:91-93).
    """
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    th2 = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_A_sq(th2, nth=nth)
    B = _taylor_B_sq(th2, nth=nth)
    C = _taylor_C_sq(th2, nth=nth)
    R = I + A * wx + B * (wx @ wx)
    V = I + B * wx + C * (wx @ wx)
    t = V @ u[..., None]
    return jnp.concatenate([R, t], axis=-1)


def SE3_to_se3(Rt, eps: float = 1e-8):
    """Log map SE(3) -> se(3). [...,3,4] -> [...,6]."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def rotation_distance(R1, R2, eps: float = 1e-7):
    """Geodesic angle between rotations (reference camera.py:342)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
