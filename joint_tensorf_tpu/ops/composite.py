"""Volume-rendering quadrature: alpha, transmittance, weighted compositing.

Reference semantics (tensorBase.py:57-65): alpha = 1 - exp(-sigma * dist),
T = exclusive cumprod of (1 - alpha + 1e-10), weights = alpha * T.
"""
from __future__ import annotations

import jax.numpy as jnp


def raw2alpha(sigma, dists):
    """sigma, dists: [N_rays, N_samples] -> (alpha, weights, bg_weight [N,1])."""
    alpha = 1.0 - jnp.exp(-sigma * dists)
    one_minus = 1.0 - alpha + 1e-10
    T_incl = jnp.cumprod(one_minus, axis=-1)                     # T after sample i
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=-1  # T before sample i
    )
    weights = alpha * T_excl
    return alpha, weights, T_incl[:, -1:]


def composite(weights, rgb, z_vals, acc_last_dir=None):
    """weights: [N,S]; rgb: [N,S,3]; z_vals: [N,S].

    Returns (rgb_map [N,3], depth_map [N], acc_map [N]).  Depth gets the
    reference's background completion term if acc_last_dir ([N], the ray's z
    direction) is given (tensorBase.py:795-796).
    """
    acc_map = jnp.sum(weights, axis=-1)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    if acc_last_dir is not None:
        depth_map = depth_map + (1.0 - acc_map) * acc_last_dir
    return rgb_map, depth_map, acc_map
