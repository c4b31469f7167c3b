"""Dense alpha-grid mask for empty-space culling.

Re-design of AlphaGridMask / updateAlphaMask (tensorBase.py:80-98, 618-661):
the mask is a dense float {0,1} grid stored [X, Y, Z] with its own aabb,
sampled trilinearly.  On TPU we keep culling *dense*: sigma is multiplied by
(mask > 0) instead of boolean-gathering the surviving samples — no dynamic
shapes under jit.

The refresh itself runs at scheduled steps outside the train jit: evaluate
density on the dense grid, max-pool (kernel 5), threshold, and propose a
tightened bbox.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import sample_grid3d
from . import vm as vm_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AlphaMask:
    grid: Any            # [X, Y, Z] float 0/1
    aabb: Any            # [2,3]
    packed: Any = None   # [8, X*Y*Z] uint8: 2x2x2 neighborhood, channel-major


def pack_neighborhoods(grid):
    """[X,Y,Z] -> [8, X*Y*Z] uint8, channel (dx*4+dy*2+dz) = clamped neighbor.

    Turns the trilinear mask lookup into ONE 8-wide row gather + a weight
    dot — measured 12x faster than eight 1-wide gathers on TPU v5e
    (265 ms -> 21 ms at 2M points; scripts in git history).

    Storage is uint8 and CHANNEL-MAJOR: the mask is a jit *argument*, and
    XLA's row-gather kernel wants the [rows, 8] operand in a dim-0-minor
    layout — with the default row-major [X,Y,Z,8] f32 array it inserted a
    131 MB re-layout loop into EVERY train step (round-3 profile while.67,
    ~7 ms).  A [8, XYZ] row-major array transposed inside the consumer is
    already in that layout (the transpose becomes a bitcast), and uint8
    quarters the bytes the gather streams.
    """
    g = jnp.pad(grid, ((0, 1), (0, 1), (0, 1)), mode="edge")
    X, Y, Z = grid.shape
    chans = [g[dx:X + dx, dy:Y + dy, dz:Z + dz]
             for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    return jnp.stack([c.reshape(-1) for c in chans], axis=0).astype(jnp.uint8)


def sample_alpha(mask: AlphaMask, xyz):
    """World coords -> trilinear alpha values [N] (tensorBase.py:91-95).

    xyz: [N,3] array, or a (x, y, z) tuple of [N] arrays (the hot path:
    per-axis arrays keep every op full-lane — vm.coord_axes docstring).
    """
    if isinstance(xyz, (tuple, list)):
        wx, wy, wz = xyz
    else:
        wx, wy, wz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    nx = (wx - mask.aabb[0, 0]) * (2.0 / (mask.aabb[1, 0] - mask.aabb[0, 0])) - 1.0
    ny = (wy - mask.aabb[0, 1]) * (2.0 / (mask.aabb[1, 1] - mask.aabb[0, 1])) - 1.0
    nz = (wz - mask.aabb[0, 2]) * (2.0 / (mask.aabb[1, 2] - mask.aabb[0, 2])) - 1.0
    if mask.packed is None:
        return sample_grid3d(mask.grid, jnp.stack([nx, ny, nz], axis=-1))
    X, Y, Z = mask.grid.shape
    x = jnp.clip((nx + 1) * 0.5 * (X - 1), 0, X - 1)
    y = jnp.clip((ny + 1) * 0.5 * (Y - 1), 0, Y - 1)
    z = jnp.clip((nz + 1) * 0.5 * (Z - 1), 0, Z - 1)
    x0 = jnp.clip(jnp.floor(x), 0, X - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, Y - 2).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, Z - 2).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0
    # packed is [8, XYZ] row-major; the transpose here is layout-free for
    # the row-gather's preferred dim-0-minor operand (see pack_neighborhoods)
    rows = jnp.take(mask.packed.T, (x0 * Y + y0) * Z + z0,
                    axis=0).astype(fx.dtype)                      # [N, 8]
    w = jnp.stack([
        (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
        (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
        fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
        fx * fy * (1 - fz), fx * fy * fz,
    ], axis=-1)
    return jnp.sum(rows * w, axis=-1)


def dense_alpha(state: vm_lib.VMState, cfg: vm_lib.VMConfig, grid_size,
                step_size: float, chunk: int = 128 * 1024):
    """Opacity alpha = 1-exp(-sigma*step) on a dense grid (tensorBase.py:618-634)."""
    gx, gy, gz = [int(g) for g in grid_size]
    xs = jnp.linspace(0, 1, gx)
    ys = jnp.linspace(0, 1, gy)
    zs = jnp.linspace(0, 1, gz)
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    samples = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    xyz = state.aabb[0] * (1 - samples) + state.aabb[1] * samples

    @jax.jit
    def eval_chunk(coords):
        norm = vm_lib.normalize_coord(coords, state.aabb)
        feat = vm_lib.compute_density_feature(state, cfg, norm,
                                              stop_coord_grad=True)
        if cfg.component_wise_feature2density:
            sigma = feat
        else:
            sigma = vm_lib.feature2density(cfg, feat)
        return 1.0 - jnp.exp(-sigma * step_size)

    outs = []
    n = xyz.shape[0]
    pad = (-n) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    for s in range(0, n + pad, chunk):
        outs.append(eval_chunk(xyz_p[s:s + chunk]))
    alpha = jnp.concatenate(outs)[:n].reshape(gx, gy, gz)
    return alpha, xyz.reshape(gx, gy, gz, 3)


def _maxpool3d_same(x, k: int = 5):
    """Stride-1 'same' max pool (padding k//2), matching F.max_pool3d."""
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(k, k, k),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (pad, pad), (pad, pad)),
    )


def dilate_mask(mask: AlphaMask, radius) -> AlphaMask:
    """Max-pool-dilate a mask by ``radius`` cells per axis (int or 3-tuple).

    Used for BLUR-ACTIVE culling (trainer._refresh_blur_mask): the paper's
    separability identity makes the component-wise factor blur an EXACT 3D
    convolution of the density field with a normalized positive separable
    kernel, so

        blurred_alpha(x) <= max_{|d_i| <= r_i cells} sharp_alpha(x + d)

    for any radius covering the kernel support — the dilated sharp mask is
    a conservative occupancy gate for the blurred field (same approximation
    class as the reference's own culling threshold, tensorBase.py:750-755;
    the reference simply disables culling under blur, batBase.py:76-82).
    """
    if isinstance(radius, int):
        radius = (radius, radius, radius)
    rx, ry, rz = (int(r) for r in radius)
    # max-pooling is separable: three 1-D passes give the same result as
    # the monolithic (2r+1)^3 window at O(r) taps per cell instead of
    # O(r^3) (ADVICE round-4: ~185k taps/cell at r=28 otherwise)
    g = mask.grid
    for axis, r in ((0, rx), (1, ry), (2, rz)):
        if r == 0:
            continue
        window = [1, 1, 1]
        window[axis] = 2 * r + 1
        pad = [(0, 0), (0, 0), (0, 0)]
        pad[axis] = (r, r)
        g = jax.lax.reduce_window(
            g, -jnp.inf, jax.lax.max,
            window_dimensions=tuple(window), window_strides=(1, 1, 1),
            padding=tuple(pad))
    return AlphaMask(grid=g, aabb=mask.aabb, packed=pack_neighborhoods(g))


def capped_mask_res(res, cap_voxels: int = 256 ** 3):
    """Mask-build resolution: ``res`` isotropically scaled down so the total
    voxel count stays under ``cap_voxels``.

    The reference SKIPS the alpha-mask update entirely once the grid passes
    256^3 (tensorf.py:482-483) — at its own Blender headline config
    (update_alphamask_iters [12k, 20k], final res 400^3) it therefore never
    culls.  Building the mask at a capped resolution instead keeps culling
    and sample compaction real at Blender scale; a coarser-than-grid mask
    is already normal reference behavior (masks built at earlier phases are
    kept and queried at finer grid resolutions, tensorf.py:484-485).
    """
    res = [int(r) for r in res]
    vol = res[0] * res[1] * res[2]
    if vol <= cap_voxels:
        return res
    scale = (cap_voxels / vol) ** (1.0 / 3.0)
    return [max(1, int(r * scale)) for r in res]


def update_alpha_mask(state: vm_lib.VMState, cfg: vm_lib.VMConfig, grid_size,
                      step_size: float, alpha_thresh: float):
    """Recompute the mask; returns (AlphaMask, proposed new aabb [2,3] np).

    Reference tensorBase.py:636-661.
    """
    alpha, dense_xyz = dense_alpha(state, cfg, grid_size, step_size)
    alpha = jnp.clip(alpha, 0, 1)
    pooled = _maxpool3d_same(alpha, 5)
    grid = (pooled >= alpha_thresh).astype(jnp.float32)

    mask = AlphaMask(grid=grid, aabb=state.aabb,
                     packed=pack_neighborhoods(grid))

    grid_np = np.asarray(grid)
    xyz_np = np.asarray(dense_xyz)
    valid = xyz_np[grid_np > 0.5]
    if valid.size == 0:
        new_aabb = np.asarray(state.aabb)
    else:
        new_aabb = np.stack([valid.min(axis=0), valid.max(axis=0)])
    return mask, new_aabb
