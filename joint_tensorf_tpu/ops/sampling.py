"""Bilinear plane / linear line sampling of factor grids.

Equivalent of F.grid_sample(align_corners=True) on the VM factor grids
(reference tensoRF.py:230-270), channels-last and differentiable w.r.t. the
sampling coordinates — the coordinate derivative of the bilinear weights is
exactly the path pose gradients take (SURVEY.md §3.5).

Out-of-range coordinates are clamped to the border; callers mask those
samples out (the reference zero-pads instead, but also masks them via
ray_valid, so inside-the-volume results are identical).

This is the jnp reference implementation; ops/pallas_sampling.py provides a
fused Pallas kernel for the same contract, validated against this one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pix(coord, size: int):
    """Normalized [-1,1] -> continuous pixel index [0, size-1] (align corners)."""
    return jnp.clip((coord + 1.0) * 0.5 * (size - 1), 0.0, size - 1.0)


def _floor_frac(x, size: int):
    x0 = jnp.clip(jnp.floor(jax.lax.stop_gradient(x)), 0, size - 2 if size > 1 else 0)
    frac = x - x0
    return x0.astype(jnp.int32), frac


def sample_line(line, w):
    """line: [D, R]; w: [N] normalized coord along the line axis -> [N, R]."""
    D, R = line.shape
    x = _pix(w, D)
    i0, fx = _floor_frac(x, D)
    i1 = jnp.minimum(i0 + 1, D - 1)
    f0 = jnp.take(line, i0, axis=0)
    f1 = jnp.take(line, i1, axis=0)
    return f0 * (1.0 - fx)[:, None] + f1 * fx[:, None]


def sample_plane(plane, u, v):
    """plane: [H, W, R]; u (->W axis), v (->H axis): [N] in [-1,1] -> [N, R]."""
    H, W, R = plane.shape
    x = _pix(u, W)
    y = _pix(v, H)
    x0, fx = _floor_frac(x, W)
    y0, fy = _floor_frac(y, H)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = plane.reshape(H * W, R)
    f00 = jnp.take(flat, y0 * W + x0, axis=0)
    f01 = jnp.take(flat, y0 * W + x1, axis=0)
    f10 = jnp.take(flat, y1 * W + x0, axis=0)
    f11 = jnp.take(flat, y1 * W + x1, axis=0)

    w00 = ((1 - fy) * (1 - fx))[:, None]
    w01 = ((1 - fy) * fx)[:, None]
    w10 = (fy * (1 - fx))[:, None]
    w11 = (fy * fx)[:, None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def sample_image(img, coords, mode: str = "bilinear"):
    """grid_sample(align_corners=False, padding=zeros) on an image.

    img: [C, H, W]; coords: [N, 2] (x, y) in [-1,1] -> [N, C].
    Used by the planar pipeline (planar.py:129, planar_svd.py:344).
    """
    C, H, W = img.shape
    x = (coords[:, 0] + 1.0) * W / 2.0 - 0.5
    y = (coords[:, 1] + 1.0) * H / 2.0 - 0.5
    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = img.reshape(C, H * W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        out = jnp.take(flat, idx, axis=1).T
        return out * inb[:, None]
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    flat = img.reshape(C, H * W)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=1).T        # [N, C]
        return vals * (w * inb)[:, None]

    return (corner(x0, y0, (1 - fx) * (1 - fy))
            + corner(x0 + 1, y0, fx * (1 - fy))
            + corner(x0, y0 + 1, (1 - fx) * fy)
            + corner(x0 + 1, y0 + 1, fx * fy))


def sample_grid3d(grid, xyz):
    """Trilinear sample of a dense 3D grid (the alpha mask).

    grid: [X, Y, Z]; xyz: [N, 3] normalized to [-1,1] per axis -> [N].
    Matches AlphaGridMask.sample_alpha (tensorBase.py:91-95) which uses
    grid_sample on a volume laid out [D=Z, H=Y, W=X] with coords (x, y, z).
    """
    X, Y, Z = grid.shape
    x = _pix(xyz[:, 0], X)
    y = _pix(xyz[:, 1], Y)
    z = _pix(xyz[:, 2], Z)
    x0, fx = _floor_frac(x, X)
    y0, fy = _floor_frac(y, Y)
    z0, fz = _floor_frac(z, Z)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)

    flat = grid.reshape(-1)

    def gat(xi, yi, zi):
        return jnp.take(flat, (xi * Y + yi) * Z + zi)

    c000 = gat(x0, y0, z0)
    c001 = gat(x0, y0, z1)
    c010 = gat(x0, y1, z0)
    c011 = gat(x0, y1, z1)
    c100 = gat(x1, y0, z0)
    c101 = gat(x1, y0, z1)
    c110 = gat(x1, y1, z0)
    c111 = gat(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx
