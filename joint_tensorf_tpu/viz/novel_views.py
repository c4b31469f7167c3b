"""Novel-view camera trajectory generators.

Reference camera.py:368-402: circular oscillation around an anchor pose
(Blender/BARF style) and an orbit around the scene bbox.
"""
from __future__ import annotations

import numpy as np

from ..geometry import poses as pose_ops


def _angle_rot(a, axis: str):
    import jax.numpy as jnp

    from ..geometry.poses import angle_to_rotation_matrix

    return angle_to_rotation_matrix(jnp.asarray(a, jnp.float32), axis)


def novel_view_poses(pose_anchor, n: int = 60, scale: float = 1.0):
    """Small circular oscillations around an anchor pose (camera.py:368-378)."""
    import jax.numpy as jnp

    theta = jnp.arange(n) / n * 2 * np.pi
    R_x = _angle_rot(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
    R_y = _angle_rot(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
    pose_rot = pose_ops.make(R=R_y @ R_x)
    pose_shift = pose_ops.make(t=jnp.asarray([0, 0, -4.0 * scale]))
    pose_shift2 = pose_ops.make(t=jnp.asarray([0, 0, 3.8 * scale]))
    pose_oscil = pose_ops.compose([pose_shift, pose_rot, pose_shift2])
    return pose_ops.compose([pose_oscil, jnp.asarray(pose_anchor)[None]])


def novel_view_around_bbox(scene_bbox, n: int = 120, scale: float = 1.0):
    """Orbit around the scene bbox (camera.py:380-402)."""
    import jax.numpy as jnp

    bbox = jnp.asarray(scene_bbox, jnp.float32).reshape(2, 3)
    norm = jnp.linalg.norm(bbox[0] - bbox[1])
    theta = jnp.arange(n) / n * 2 * np.pi
    camera_dist = norm * 0.6 * scale
    bbox_height = jnp.abs(bbox[1, 1] - bbox[0, 1])
    h_above = bbox_height * 0.1 * scale
    pitch = jnp.arctan(h_above / camera_dist)

    R_x = _angle_rot(jnp.full_like(theta, pitch), "X")
    R_y = _angle_rot(theta, "Y")
    R_dwn = _angle_rot(jnp.full_like(theta, np.pi / 2), "X")
    t = jnp.stack([jnp.zeros_like(theta),
                   jnp.full_like(theta, h_above),
                   jnp.full_like(theta, camera_dist)], axis=-1)
    return pose_ops.make(R=R_x @ R_y @ R_dwn, t=t)
