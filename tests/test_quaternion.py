"""Quaternion utils (camera.py:147-196 parity) and pose-grad viz."""
import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.geometry import lie, quaternion as quat


def _rand_R(key, n=8):
    w = jax.random.normal(key, (n, 3)) * 0.8
    return lie.so3_to_SO3(w) if hasattr(lie, "so3_to_SO3") else \
        lie.se3_to_SE3(jnp.concatenate([jnp.zeros((n, 3)), w], -1))[..., :3]


def test_q_R_roundtrip():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (16, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # q -> R -> q is identity up to sign
    q2 = quat.R_to_q(quat.q_to_R(q))
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q),
                               rtol=1e-4, atol=1e-4)


def test_product_matches_rotation_compose():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q1 = jax.random.normal(k1, (8, 4))
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = jax.random.normal(k2, (8, 4))
    q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
    R12 = quat.q_to_R(quat.product(q1, q2))
    np.testing.assert_allclose(np.asarray(R12),
                               np.asarray(quat.q_to_R(q1) @ quat.q_to_R(q2)),
                               rtol=1e-5, atol=1e-5)


def test_invert():
    q = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    e = quat.product(q, quat.invert(q))
    np.testing.assert_allclose(np.asarray(e),
                               np.tile([1.0, 0, 0, 0], (8, 1)),
                               rtol=1e-5, atol=1e-5)


def test_delta_pose_identity_at_zero():
    from joint_tensorf_tpu.viz.grad_viz import delta_pose
    p = delta_pose(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(p),
                               np.concatenate([np.eye(3), np.zeros((3, 1))], 1),
                               atol=1e-7)
