"""sim(3) Procrustes alignment and camera-pose error metrics.

Evaluation-only code paths — run on host in float64 for the SVD
(the reference also upcasts to double, camera.py:360-363; TPUs have no f64).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import poses as pose_ops
from .lie import rotation_distance


@dataclasses.dataclass
class Sim3:
    t0: np.ndarray  # [3]
    t1: np.ndarray
    s0: float
    s1: float
    R: np.ndarray  # [3,3]

    @staticmethod
    def identity():
        return Sim3(t0=np.zeros(3), t1=np.zeros(3), s0=1.0, s1=1.0, R=np.eye(3))


def procrustes_analysis(X0, X1) -> Sim3:
    """Similarity transform aligning X1 to X0 ([N,3] camera centers).

    Reference camera.py:349-366.  X1to0 = (X1-t1)/s1 @ R^T * s0 + t0.
    """
    X0 = np.asarray(X0, dtype=np.float64)
    X1 = np.asarray(X1, dtype=np.float64)
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = np.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = np.sqrt((X1c**2).sum(axis=-1).mean())
    U, S, Vt = np.linalg.svd(X0c.T / s0 @ (X1c / s1))
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return Sim3(t0=t0, t1=t1, s0=float(s0), s1=float(s1), R=R)


def rigid_points_registration(x, y):
    """Differentiable batched Kabsch: (R, t) with R @ x_i + t ~= y_i.

    The TPU-native stand-in for ``roma.rigid_points_registration`` used by
    the reference's L2G engine (l2g_bat.py:198) to re-fit one global SE(3)
    per view from per-ray local warps.  x, y: [..., N, 3]; returns
    (R [..., 3, 3] special-orthogonal, t [..., 3]).  Runs in jnp (SVD of a
    3x3 — fine on device) and is differentiable, as the reference's
    global-alignment MSE loss backprops through the registration.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    cx = x.mean(axis=-2, keepdims=True)
    cy = y.mean(axis=-2, keepdims=True)
    xc, yc = x - cx, y - cy
    # covariance: sum_i (y_i - cy)(x_i - cx)^T
    H = jnp.swapaxes(yc, -2, -1) @ xc                       # [..., 3, 3]
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[..., None, :]) @ Vt                          # det(R) = +1
    t = cy[..., 0, :] - (R @ cx[..., 0, :, None])[..., 0]
    return R, t


def camera_centers(pose):
    """World-space camera centers of [N,3,4] world->cam poses."""
    center = jnp.zeros((pose.shape[0], 1, 3), dtype=pose.dtype)
    return pose_ops.cam2world(center, pose)[:, 0]


def prealign_cameras(pose, pose_GT):
    """Align predicted poses to GT up to sim(3) (reference bat.py:211-227).

    Returns (pose_aligned [N,3,4], sim3).
    """
    center_pred = np.asarray(camera_centers(pose))
    center_GT = np.asarray(camera_centers(pose_GT))
    try:
        sim3 = procrustes_analysis(center_GT, center_pred)
    except np.linalg.LinAlgError:
        sim3 = Sim3.identity()
    R_s = jnp.asarray(sim3.R, dtype=pose.dtype)
    center_aligned = (
        (jnp.asarray(center_pred, pose.dtype) - sim3.t1.astype(np.float32))
        / sim3.s1 @ R_s.T * sim3.s0 + sim3.t0.astype(np.float32)
    )
    R_aligned = pose[..., :3] @ R_s.T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return pose_ops.make(R=R_aligned, t=t_aligned), sim3


def align_test_pose(pose, sim3: Sim3):
    """Map GT-frame test poses into the learned frame (reference bat.py:354-362)."""
    center = camera_centers(pose)
    R_s = jnp.asarray(sim3.R, dtype=pose.dtype)
    center_aligned = (
        (center - sim3.t0.astype(np.float32)) / sim3.s0 @ R_s * sim3.s1
        + sim3.t1.astype(np.float32)
    )
    R_aligned = pose[..., :3] @ R_s
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return pose_ops.make(R=R_aligned, t=t_aligned)


def evaluate_camera_alignment(pose_aligned, pose_GT):
    """Rotation (rad) and translation errors per view (reference bat.py:229-237)."""
    R_aligned, t_aligned = pose_aligned[..., :3], pose_aligned[..., 3:]
    R_GT, t_GT = pose_GT[..., :3], pose_GT[..., 3:]
    R_error = rotation_distance(R_aligned, R_GT)
    t_error = jnp.linalg.norm((t_aligned - t_GT)[..., 0], axis=-1)
    return R_error, t_error
