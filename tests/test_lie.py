import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.geometry import lie, poses


def rand_se3(key, n, scale=0.3):
    return jax.random.normal(key, (n, 6)) * scale


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    wu = rand_se3(key, 32)
    Rt = lie.se3_to_SE3(wu)
    wu2 = lie.SE3_to_se3(Rt)
    np.testing.assert_allclose(np.asarray(wu2), np.asarray(wu), atol=1e-4)


def test_so3_closed_form():
    # compare series exp map against closed-form Rodrigues
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (16, 3)) * 0.5
    R = lie.so3_to_SO3(w)
    theta = np.linalg.norm(np.asarray(w), axis=-1)
    for i in range(16):
        wx = np.asarray(lie.skew(w[i]))
        th = theta[i]
        R_cf = np.eye(3) + np.sin(th) / th * wx + (1 - np.cos(th)) / th**2 * wx @ wx
        np.testing.assert_allclose(np.asarray(R[i]), R_cf, atol=1e-6)


def test_rotation_is_orthonormal():
    key = jax.random.PRNGKey(2)
    wu = rand_se3(key, 8, scale=1.0)
    R = lie.se3_to_SE3(wu)[..., :3]
    RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_exp_at_zero_is_identity():
    Rt = lie.se3_to_SE3(jnp.zeros((1, 6)))
    np.testing.assert_allclose(np.asarray(Rt[0, :, :3]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Rt[0, :, 3]), np.zeros(3), atol=1e-7)


def test_exp_is_differentiable_at_zero():
    g = jax.grad(lambda wu: jnp.sum(lie.se3_to_SE3(wu)))(jnp.zeros(6))
    assert np.isfinite(np.asarray(g)).all()


def test_pose_compose_invert():
    key = jax.random.PRNGKey(3)
    wu = rand_se3(key, 4)
    p = lie.se3_to_SE3(wu)
    p_inv = poses.invert(p)
    ident = poses.compose_pair(p, p_inv)
    np.testing.assert_allclose(
        np.asarray(ident), np.broadcast_to(np.eye(3, 4), ident.shape), atol=1e-5
    )


def test_compose_order():
    # compose([a, b]) applies a first then b: x -> b(a(x))
    a = lie.se3_to_SE3(jnp.array([[0.1, 0, 0, 1.0, 0, 0]]))
    b = lie.se3_to_SE3(jnp.array([[0, 0.2, 0, 0, 2.0, 0]]))
    ab = poses.compose([a, b])
    x = jnp.array([[0.3, -0.4, 0.5]])
    lhs = poses.world2cam(poses.world2cam(x, a[0]), b[0])
    rhs = poses.world2cam(x, ab[0])
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_rotation_distance():
    w = jnp.array([[0.3, 0.0, 0.0]])
    R1 = lie.so3_to_SO3(w)
    R2 = lie.so3_to_SO3(jnp.zeros((1, 3)))
    d = lie.rotation_distance(R1, R2)
    np.testing.assert_allclose(np.asarray(d), [0.3], atol=1e-5)


def test_matches_torch_reference_semantics():
    torch = pytest.importorskip("torch")
    # independent torch implementation of the same Taylor series
    def taylor_A_t(x, nth=8):
        ans, denom = torch.zeros_like(x), 1.0
        for i in range(nth + 1):
            if i > 0:
                denom *= (2 * i) * (2 * i + 1)
            ans = ans + (-1) ** i * x ** (2 * i) / denom
        return ans

    x = np.linspace(0, 2.0, 11, dtype=np.float32)
    ours = np.asarray(lie.taylor_A(jnp.asarray(x), nth=8))
    theirs = taylor_A_t(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
