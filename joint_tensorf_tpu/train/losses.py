"""Training losses: photometric MSE (with edge-guided masking), L1, TV.

Reference semantics: MSE is nanmean over all elements (base.py:256-261);
the edge-guided variant reweights edge vs non-edge pixels with hard masks on
alternating iterations (tensorf.py:104-122).
"""
from __future__ import annotations

import jax.numpy as jnp


def mse(pred, target):
    d = (pred - target) ** 2
    return jnp.nanmean(d)


def psnr_from_mse(m):
    return -10.0 * jnp.log10(m)


def edge_weighted_render_loss(rgb, target, edge_mask, edge_factor,
                              non_edge_factor, use_edge):
    """rgb/target: [B,R,3]; edge_mask: [B,R] (0/1); use_edge: traced 0/1.

    use_edge=1 -> f_e*MSE(rgb*m, t*m) + f_ne*MSE(rgb*(1-m), t*(1-m))
    use_edge=0 -> plain MSE.
    """
    m = edge_mask[..., None].astype(rgb.dtype)
    edge_part = mse(rgb * m, target * m)
    non_edge_part = mse(rgb * (1 - m), target * (1 - m))
    edge_loss = edge_factor * edge_part + non_edge_factor * non_edge_part
    plain = mse(rgb, target)
    return use_edge * edge_loss + (1.0 - use_edge) * plain


def soft_edge_render_loss(rgb, target, edge_mask, edge_factor, non_edge_factor):
    """Soft-mask variant (tensorf.py:114-117)."""
    m = edge_mask[..., None].astype(rgb.dtype) * edge_factor + non_edge_factor
    return mse(rgb * m, target * m)


def depth_tv_loss(depth, grid_h: int, grid_w: int):
    """TV over the sampled ray grid (tensorf.py:133-140)."""
    d = depth.reshape(-1, grid_h, grid_w)
    h_tv = jnp.sum((d[:, 1:, :] - d[:, :-1, :]) ** 2) / grid_h
    w_tv = jnp.sum((d[:, :, 1:] - d[:, :, :-1]) ** 2) / grid_w
    return h_tv + w_tv
