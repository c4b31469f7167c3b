"""Quaternion utilities (parity with the reference's camera.py:147-196).

Functional jnp versions of q<->R conversion, Hamilton product, inverse.
The reference notes its R_to_q is "a bit problematic"; this version uses
the same sqrt/sign construction as the fast path, with the eigenvector
fallback replaced by a numerically safer branchless variant (Shepperd's
method would require data-dependent branching, hostile to jit).
Quaternion layout: (w, x, y, z).
"""
from __future__ import annotations

import jax.numpy as jnp


def q_to_R(q):
    """[..., 4] unit quaternion -> [..., 3, 3] rotation (camera.py:149-156)."""
    qa, qb, qc, qd = jnp.moveaxis(q, -1, 0)
    return jnp.stack([
        jnp.stack([1 - 2 * (qc ** 2 + qd ** 2), 2 * (qb * qc - qa * qd),
                   2 * (qa * qc + qb * qd)], axis=-1),
        jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb ** 2 + qd ** 2),
                   2 * (qc * qd - qa * qb)], axis=-1),
        jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd),
                   1 - 2 * (qb ** 2 + qc ** 2)], axis=-1),
    ], axis=-2)


def R_to_q(R, eps: float = 1e-8):
    """[..., 3, 3] rotation -> [..., 4] quaternion (camera.py:158-181)."""
    R00, R11, R22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    qa = 0.5 * jnp.sqrt(jnp.maximum(1 + t, 0.0) + eps)
    qb = (jnp.sign(R[..., 2, 1] - R[..., 1, 2])
          * 0.5 * jnp.sqrt(jnp.maximum(1 + R00 - R11 - R22, 0.0) + eps))
    qc = (jnp.sign(R[..., 0, 2] - R[..., 2, 0])
          * 0.5 * jnp.sqrt(jnp.maximum(1 - R00 + R11 - R22, 0.0) + eps))
    qd = (jnp.sign(R[..., 1, 0] - R[..., 0, 1])
          * 0.5 * jnp.sqrt(jnp.maximum(1 - R00 - R11 + R22, 0.0) + eps))
    q = jnp.stack([qa, qb, qc, qd], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def invert(q):
    """Quaternion inverse (camera.py:183-187)."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0])
    return conj / jnp.sum(q * q, axis=-1, keepdims=True)


def product(q1, q2):
    """Hamilton product (camera.py:189-196)."""
    a1, b1, c1, d1 = jnp.moveaxis(q1, -1, 0)
    a2, b2, c2, d2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)
