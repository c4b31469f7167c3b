"""Separable Gaussian filtering of factor grids, expressed as matmuls.

The reference implements component-wise blur as grouped conv1d with replicate
padding (bateRF.py:8-39).  On TPU we instead materialize the equivalent
banded blur matrix B (B[i, j] = sum_k kernel[k] * [clip(i + k - half) == j])
once per step and apply it with einsums — every blur becomes a dense matmul
that runs on the MXU, the kernel (and its width sigma) stays a traced value,
and shapes stay static.  Matrix construction is O(L * taps) scatter-adds,
negligible next to the render cost.
"""
from __future__ import annotations

import jax.numpy as jnp


def blur_matrix(kernel, length: int, padding: str = "replicate"):
    """[L, L] matrix equivalent to 1D 'same' convolution.

    kernel: [taps] (odd), may be traced.  blurred = B @ signal.
    padding: "replicate" (the 3D factor blur, bateRF.py:16) or "zero"
    (the planar pipeline's conv1d padding="same", planar_svd.py:318).
    """
    taps = kernel.shape[-1]
    half = taps // 2
    i = jnp.arange(length)[:, None]                      # [L, 1]
    k = jnp.arange(taps)[None, :]                        # [1, T]
    raw = i + k - half
    cols = jnp.clip(raw, 0, length - 1)                  # [L, T]
    rows = jnp.broadcast_to(i, cols.shape)
    vals = jnp.broadcast_to(kernel, cols.shape)
    if padding == "zero":
        vals = jnp.where((raw >= 0) & (raw < length), vals, 0.0)
    B = jnp.zeros((length, length), dtype=kernel.dtype)
    B = B.at[rows, cols].add(vals)
    return B


def blur_line(line, B_d):
    """line: [D, R]; B_d: [D, D] -> [D, R]."""
    return B_d @ line


def blur_plane(plane, B_h, B_w):
    """plane: [H, W, R]; separable 2D blur = two matmuls (exact)."""
    out = jnp.einsum("vw,hwr->hvr", B_w, plane)   # blur along W
    out = jnp.einsum("uh,hwr->uwr", B_h, out)     # blur along H
    return out


def blur_images_hw(images, B_h, B_w):
    """images: [..., H, W]; separable 2D blur along the trailing two axes."""
    out = jnp.einsum("vw,...hw->...hv", B_w, images)
    out = jnp.einsum("uh,...hw->...uw", B_h, out)
    return out
