import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.data.synthetic import sphere_poses
from joint_tensorf_tpu.geometry import align, lie, poses as pose_ops


def test_prealign_identity_is_zero_error():
    gt = jnp.asarray(sphere_poses(8))
    aligned, sim3 = align.prealign_cameras(gt, gt)
    r, t = align.evaluate_camera_alignment(aligned, gt)
    assert float(jnp.rad2deg(r).max()) < 0.1
    assert float(t.max()) < 1e-4
    np.testing.assert_allclose(sim3.R, np.eye(3), atol=1e-5)


def test_prealign_recovers_known_rigid_transform():
    # express all poses in a rigidly transformed world frame; alignment must
    # undo it exactly.  w' = R_g w + t_g, so pose'(w') = pose(W^-1(w')),
    # i.e. pred = pose ∘ W^-1 = compose_pair(invert(W), pose).
    gt = jnp.asarray(sphere_poses(8))
    W_tf = pose_ops.make(
        R=lie.so3_to_SO3(jnp.array([0.3, -0.2, 0.5])),
        t=jnp.array([0.4, -0.3, 0.8]))
    W_inv = pose_ops.invert(W_tf)
    pred = pose_ops.compose_pair(jnp.broadcast_to(W_inv, gt.shape), gt)
    aligned, _ = align.prealign_cameras(pred, gt)
    r, t = align.evaluate_camera_alignment(aligned, gt)
    assert float(jnp.rad2deg(r).max()) < 0.5
    assert float(t.max()) < 0.01


def test_prealign_small_noise_small_error():
    """Regression: camera centers must be non-coplanar for sim(3) alignment
    to be well-posed (a planar ring admits a flipped solution)."""
    gt = jnp.asarray(sphere_poses(6))
    centers = np.asarray(align.camera_centers(gt))
    # the test scene's centers are genuinely non-planar
    _, sv, _ = np.linalg.svd(centers - centers.mean(0))
    assert sv[2] > 0.05 * sv[0]

    noise = lie.se3_to_SE3(jax.random.normal(jax.random.PRNGKey(0), (6, 6)) * 0.1)
    pred = pose_ops.compose([noise, gt])
    aligned, _ = align.prealign_cameras(pred, gt)
    r, _ = align.evaluate_camera_alignment(aligned, gt)
    assert float(jnp.rad2deg(r).max()) < 30.0  # same order as the noise
