"""Ray generation from camera intrinsics/extrinsics.

Conventions follow the reference (camera.py:231-261): pixel centers at +0.5,
ray directions = grid_3D @ R (the transpose trick — pose stores world->cam
[R|t], so cam->world rotation applied from the right), camera centers
= -t^T @ R.  The pixel grid is constant (stop_gradient); centers/dirs stay
differentiable w.r.t. the pose so pose gradients flow through rendering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(H: int, W: int, dtype=jnp.float32):
    """[H*W, 2] pixel-center coordinates (x, y)."""
    y = jnp.arange(H, dtype=dtype) + 0.5
    x = jnp.arange(W, dtype=dtype) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def img2cam(X, intr_inv):
    return X @ jnp.swapaxes(intr_inv, -1, -2)


def camera_grid_3d(H: int, W: int, intr_inv, ray_idx=None):
    """Back-project the pixel grid into camera space.

    intr_inv: [B,3,3] inverse intrinsics.  Returns [B, N, 3] where
    N = H*W or len(ray_idx).  Constant w.r.t. pose (stop_gradient'd).
    """
    grid = pixel_grid(H, W, dtype=intr_inv.dtype)
    if ray_idx is not None:
        grid = grid[ray_idx]
    grid_h = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)
    out = img2cam(grid_h[None], intr_inv)  # [B, N, 3]
    return jax.lax.stop_gradient(out)


def get_center_and_ray(H: int, W: int, pose, intr_inv, ray_idx=None):
    """Camera centers and ray directions in world space.

    pose: [B,3,4] world->cam.  Returns (centers [B,N,3], dirs [B,N,3]).
    Differentiable w.r.t. pose (reference camera.py:248-253 keeps the
    dependency; only the pixel grid is no-grad).
    """
    grid_3d = camera_grid_3d(H, W, intr_inv, ray_idx=ray_idx)
    t = pose[..., 3:]          # [B,3,1]
    R = pose[..., :3]          # [B,3,3]
    ray_dirs = grid_3d @ R     # [B,N,3]  (= grid_3d @ R, i.e. R^T applied)
    centers = -(jnp.swapaxes(t, -2, -1) @ R)  # [B,1,3]
    centers = jnp.broadcast_to(centers, ray_dirs.shape)
    return centers, ray_dirs
