"""Dense-grid density evaluation: trilinear lookup of the VM expansion.

Because trilinear interpolation weights factorize per axis, interpolating
the *dense* rank expansion G = sum_axes sum_r plane_r (x) line_r at a point
is EXACTLY the factored sample the reference computes per point
(tensoRF.py:230-251): for each axis term,

    trilinear(P (x) L)(x,y,z)
      = sum_{dx,dy,dz} wx wy wz P[proj+d_proj] L[vec+d_vec]
      = (sum_{d_proj} w P[..]) * (sum_{d_vec} w L[..])
      = bilinear(P)(proj) * linear(L)(vec),

so summing the dense grids over axes and components first changes nothing
(verified to float32 epsilon in tests/test_densify.py).

Why this wins on TPU: the factored path pays ~6 HBM row ops per sample per
backward (gathers + scatter-adds into 3 planes and 3 lines) and row ops are
latency-bound at ~23 ns/row (docs/DESIGN_NOTES.md).  The dense path pays
ONE 8-channel corner-packed row gather forward and ONE row scatter backward
per sample, plus a per-step grid build that is pure MXU einsum work + a
streamed corner-packing pass — O(XYZ) HBM traffic independent of the
sample count.  Gradients flow to the factor grids through the einsum
transposes (more MXU matmuls) and to the sampling coordinates through the
interpolation fractions — the pose-gradient path (SURVEY.md §3.5) — all
via plain autodiff: the single `take` transposes to a single scatter-add.

Appearance features cannot be densified (app_dim * XYZ is too large); the
renderer instead gates them onto a top-K weight-selected subset
(render/renderer.py app_k).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift(a, axis):
    """Edge-clamped +1 shift along ``axis`` (same clamp as pack_plane)."""
    idx_main = [slice(None)] * a.ndim
    idx_last = [slice(None)] * a.ndim
    idx_main[axis] = slice(1, None)
    idx_last[axis] = slice(-1, None)
    return jnp.concatenate([a[tuple(idx_main)], a[tuple(idx_last)]], axis=axis)


def pack_corners(G):
    """[X, Y, Z] -> [X, Y, Z, 8] trilinear corner neighborhoods.

    Channel c = dx*4 + dy*2 + dz holds G[x+dx, y+dy, z+dz] (edge-clamped).
    Plain jnp on purpose: its autodiff transpose is the dense fold of the
    packed gradient (8 slice-adds), so no hand-written scatter is needed.
    """
    g = jnp.stack([G, _shift(G, 2)], axis=-1)            # dz
    g = jnp.concatenate([g, _shift(g, 1)], axis=-1)      # dy
    g = jnp.concatenate([g, _shift(g, 0)], axis=-1)      # dx
    return g


def _pix(coord, size: int):
    return jnp.clip((coord + 1.0) * 0.5 * (size - 1), 0.0, size - 1.0)


def _floor_frac(x, size: int):
    x0 = jnp.clip(jnp.floor(jax.lax.stop_gradient(x)), 0,
                  size - 2 if size > 1 else 0)
    frac = x - x0
    return x0.astype(jnp.int32), frac


def sample_packed_grid(G8, coords):
    """Trilinear sample of a corner-packed grid.

    G8: [X, Y, Z, 8] from pack_corners; coords: [N, 3] in [-1, 1] per axis
    (x -> X etc., the normalize_coord convention) -> [N].

    One row gather forward; its VJP is one row scatter-add plus elementwise
    work, and coordinate gradients match the factored path exactly
    (both differentiate the same trilinear weights).
    """
    X, Y, Z, _ = G8.shape
    if isinstance(coords, (tuple, list)):
        cx, cy, cz = coords            # per-axis [N] (lane-friendly)
    else:
        cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]
    x0, fx = _floor_frac(_pix(cx, X), X)
    y0, fy = _floor_frac(_pix(cy, Y), Y)
    z0, fz = _floor_frac(_pix(cz, Z), Z)
    rows = jnp.take(G8.reshape(X * Y * Z, 8),
                    (x0 * Y + y0) * Z + z0, axis=0)       # [N, 8]
    wx = jnp.stack([1.0 - fx, fx], axis=-1)               # [N, 2]
    wy = jnp.stack([1.0 - fy, fy], axis=-1)
    wz = jnp.stack([1.0 - fz, fz], axis=-1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)           # [N, 8], c=dx*4+dy*2+dz
    return jnp.sum(rows * w, axis=-1)
