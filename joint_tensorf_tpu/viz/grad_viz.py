"""Pose-gradient visualization: per-pixel jacobian heatmaps.

TPU re-design of the reference's `visualize_gradient` (nerf.py:444-517):
for one training view, compute the jacobian of the per-pixel MSE w.r.t. a
3-angle + 3-translation delta pose (evaluated at zero) composed ahead of
the current training pose, and return six signed [H, W] maps (rot X/Y/Z,
trans X/Y/Z).  The reference loops `autograd.functional.jacobian` over
64-ray chunks; here a jitted `jax.jacrev` over the 6-vector is scanned
over ray chunks — one compile, no per-chunk dispatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import poses as pose_ops


def delta_pose(delta):
    """[6] (angles XYZ, translation XYZ) -> [3,4] pose, identity at zero."""
    rx = pose_ops.angle_to_rotation_matrix(delta[0], "X")
    ry = pose_ops.angle_to_rotation_matrix(delta[1], "Y")
    rz = pose_ops.angle_to_rotation_matrix(delta[2], "Z")
    return jnp.concatenate([rx @ ry @ rz, delta[3:6, None]], axis=-1)


def pose_gradient_maps(render_mse_fn, H, W, n_rays_chunk: int = 256):
    """render_mse_fn(delta [6], ray_idx [R]) -> per-pixel mse [R, 3].

    Returns (rot_maps [3, H, W], trans_maps [3, H, W]): d(sum_c mse)/d(delta)
    per pixel, channel-summed like the reference heatmaps (nerf.py:504-506).
    """
    n_pix = H * W
    pad = (-n_pix) % n_rays_chunk
    idx_all = jnp.arange(n_pix + pad) % n_pix
    idx_chunks = idx_all.reshape(-1, n_rays_chunk)

    @jax.jit
    def jac_all():
        def one_chunk(_, ray_idx):
            # jacobian of channel-summed mse: [R, 6]
            j = jax.jacrev(
                lambda d: jnp.sum(render_mse_fn(d, ray_idx), axis=-1))(
                    jnp.zeros(6))
            return None, j
        _, jacs = jax.lax.scan(one_chunk, None, idx_chunks)
        return jacs.reshape(-1, 6)[:n_pix]

    j = np.asarray(jac_all())                              # [HW, 6]
    rot = j[:, :3].T.reshape(3, H, W)
    trans = j[:, 3:].T.reshape(3, H, W)
    return rot, trans
