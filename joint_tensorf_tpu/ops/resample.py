"""Align-corners linear resampling as (host-built) interpolation matrices.

The reference upsamples factor grids with F.interpolate(align_corners=True)
(tensoRF.py:274-287).  jax.image.resize uses half-pixel sampling, so instead
we build the exact align-corners interpolation matrix with numpy (upsampling
happens only at phase boundaries, outside jit) and apply it as a matmul.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def resize_matrix(src: int, dst: int, dtype=np.float32) -> np.ndarray:
    """[dst, src] align-corners linear interpolation matrix."""
    M = np.zeros((dst, src), dtype=dtype)
    if src == 1:
        M[:, 0] = 1.0
        return M
    if dst == 1:
        M[0, 0] = 1.0
        return M
    pos = np.arange(dst, dtype=np.float64) * (src - 1) / (dst - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, src - 1)
    i1 = np.clip(i0 + 1, 0, src - 1)
    frac = (pos - i0).astype(dtype)
    np.add.at(M, (np.arange(dst), i0), 1.0 - frac)
    np.add.at(M, (np.arange(dst), i1), frac)
    return M


def resize_line(line, dst: int):
    """[D, R] -> [dst, R] align-corners linear."""
    M = jnp.asarray(resize_matrix(line.shape[0], dst))
    return M @ line


def resize_plane(plane, dst_h: int, dst_w: int):
    """[H, W, R] -> [dst_h, dst_w, R] align-corners bilinear."""
    M_h = jnp.asarray(resize_matrix(plane.shape[0], dst_h))
    M_w = jnp.asarray(resize_matrix(plane.shape[1], dst_w))
    out = jnp.einsum("vw,hwr->hvr", M_w, plane)
    out = jnp.einsum("uh,hwr->uwr", M_h, out)
    return out
