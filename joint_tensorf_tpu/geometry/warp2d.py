"""2D warps for the planar alignment pipeline.

Reference warp.py: normalized pixel grids (aspect-preserving, [-1,1] on the
long side), SO(2)/SE(2)/SL(3) exponential maps, warp dispatch by dof, and
the corner-range check used when sampling perturbations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalized_pixel_grid(H: int, W: int):
    """[HW, 2] aspect-normalized pixel centers (warp.py:10-16)."""
    s = max(H, W)
    y = ((jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / s)
    x = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / s)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def normalized_pixel_grid_crop(H: int, W: int, H_crop: int, W_crop: int):
    """Center-crop region of the normalized grid (warp.py:18-26)."""
    s = max(H, W)
    y0, y1 = H // 2 - H_crop // 2, H // 2 + H_crop // 2
    x0, x1 = W // 2 - W_crop // 2, W // 2 + W_crop // 2
    y = ((jnp.arange(y0, y1, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / s)
    x = ((jnp.arange(x0, x1, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / s)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


# ------------------------------------------------------------------ Lie maps
def so2_to_SO2(theta):  # [...,1] -> [...,2,2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.concatenate([c, -s], -1),
                      jnp.concatenate([s, c], -1)], -2)


def _taylor_A2(x, nth=10):
    ans, denom = jnp.zeros_like(x), 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_B2(x, nth=10):
    # (1-cos x)/x
    ans, denom = jnp.zeros_like(x), 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x ** (2 * i + 1) / denom
    return ans


def se2_to_SE2(delta):  # [...,3] -> [...,2,3]
    u, theta = delta[..., :2], delta[..., 2:]
    A = _taylor_A2(theta)
    B = _taylor_B2(theta)
    V = jnp.stack([jnp.concatenate([A, -B], -1),
                   jnp.concatenate([B, A], -1)], -2)
    R = so2_to_SO2(theta)
    return jnp.concatenate([R, V @ u[..., None]], -1)


def sl3_to_SL3(h):  # [...,8] -> [...,3,3] homography via matrix exp
    h1, h2, h3, h4, h5, h6, h7, h8 = jnp.split(h, 8, axis=-1)
    A = jnp.stack([jnp.concatenate([h5, h3, h1], -1),
                   jnp.concatenate([h4, -h5 - h6, h2], -1),
                   jnp.concatenate([h7, h8, h6], -1)], -2)
    return jax.scipy.linalg.expm(A)


def warp_grid(xy_grid, warp, warp_type: str):
    """xy_grid: [B,N,2]; warp: [B,dof] -> warped [B,N,2] (warp.py:28-48)."""
    if warp_type == "translation":
        return xy_grid + warp[..., None, :]
    if warp_type == "rotation":
        M = so2_to_SO2(warp)
        return xy_grid @ jnp.swapaxes(M, -2, -1)
    hom = jnp.concatenate([xy_grid, jnp.ones_like(xy_grid[..., :1])], -1)
    if warp_type == "rigid":
        M = se2_to_SE2(warp)
        return hom @ jnp.swapaxes(M, -2, -1)
    if warp_type == "homography":
        M = sl3_to_SL3(warp)
        out = hom @ jnp.swapaxes(M, -2, -1)
        return out[..., :2] / (out[..., 2:] + 1e-8)
    raise ValueError(warp_type)


def warp_corners(warp_param, warp_type: str, H, W, H_crop, W_crop):
    s = max(H, W)
    y_crop = (H // 2 - H_crop // 2, H // 2 + H_crop // 2)
    x_crop = (W // 2 - W_crop // 2, W // 2 + W_crop // 2)
    Y = [((y + 0.5) / H * 2 - 1) * (H / s) for y in y_crop]
    X = [((x + 0.5) / W * 2 - 1) * (W / s) for x in x_crop]
    corners = jnp.asarray([(X[0], Y[0]), (X[0], Y[1]), (X[1], Y[1]),
                           (X[1], Y[0])], dtype=jnp.float32)
    corners = jnp.broadcast_to(corners, warp_param.shape[:-1] + (4, 2))
    return warp_grid(corners, warp_param, warp_type)


def check_corners_in_range(warp_param, warp_type: str, H, W, H_crop, W_crop):
    c = warp_corners(warp_param, warp_type, H, W, H_crop, W_crop)
    X = (c[..., 0] / W * max(H, W) + 1) / 2 * W - 0.5
    Y = (c[..., 1] / H * max(H, W) + 1) / 2 * H - 0.5
    ok = ((0 <= X) & (X < W) & (0 <= Y) & (Y < H)).all()
    return bool(np.asarray(ok))
