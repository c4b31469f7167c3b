"""Sobel edge-magnitude masks for the edge-guided loss.

Reference model/nerf.py:116-148: 3x3 Sobel over replicate-padded RGB images,
gradient summed across channels, magnitude thresholded at mean * thresh.
"""
from __future__ import annotations

import jax.numpy as jnp

_KX = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=jnp.float32)
_KY = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=jnp.float32)


def _conv3x3(images, k):
    """images: [B, H, W] (already padded by 1); k: [3,3] -> [B, H-2, W-2]."""
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + k[dy, dx] * images[:, dy:images.shape[1] - 2 + dy,
                                           dx:images.shape[2] - 2 + dx]
    return out


def edge_magnitude(images):
    """images: [B, 3, H, W] -> Sobel gradient magnitude [B, H, W].

    The reference's conv2d with a [1,3,3,3] kernel sums Gx/Gy over the three
    color channels before the magnitude (nerf.py:126-139).
    """
    B, C, H, W = images.shape
    flat = images.reshape(B * C, H, W)
    padded = jnp.pad(flat, ((0, 0), (1, 1), (1, 1)), mode="edge")
    gx = _conv3x3(padded, _KX).reshape(B, C, H, W).sum(axis=1)
    gy = _conv3x3(padded, _KY).reshape(B, C, H, W).sum(axis=1)
    return jnp.sqrt(gx**2 + gy**2)


def hard_edge_mask(images, mean_thresh: float = 1.25):
    """[B,3,H,W] -> uint8 mask [B, H*W]: 1 where magnitude > mean * thresh."""
    B = images.shape[0]
    gg = edge_magnitude(images).reshape(B, -1)
    mean = gg.mean(axis=1, keepdims=True)
    return (gg > mean * mean_thresh).astype(jnp.uint8)


def soft_edge_mask(images):
    """[B,3,H,W] -> float mask [B, H*W] normalized by the per-image max."""
    B = images.shape[0]
    gg = edge_magnitude(images).reshape(B, -1)
    return gg / gg.max(axis=1, keepdims=True)
