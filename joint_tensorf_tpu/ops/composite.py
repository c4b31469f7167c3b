"""Volume-rendering quadrature: alpha, transmittance, weighted compositing.

Reference semantics (tensorBase.py:57-65): alpha = 1 - exp(-sigma * dist),
T = exclusive cumprod of (1 - alpha + 1e-10), weights = alpha * T.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def exclusive_cumprod(one_minus):
    """T_excl[i] = prod_{j<i} one_minus[j] along the last axis, with an
    ANALYTIC VJP.

    Autodiff of jnp.cumprod transposes the associative scan into generic
    scan machinery that measured 26 ms/step at [2000, 1000] in the dense
    phase (round-4 phase_profile, fusion root "transpose(jvp(cumprod))").
    The analytic gradient is one reverse cumsum + elementwise:

        dT_i/d om_j = T_i / om_j           (j < i; om_j >= 1e-10 > 0)
        d om_j      = (sum_{i>j} dT_i T_i) / om_j

    The division is exact algebra (every T_i with i>j carries om_j as a
    factor), and sum_{i>j} dT_i T_i itself scales with om_j, so the ratio
    stays O(1); exactness vs autodiff is pinned in tests/test_ops.py
    including saturated (om -> 1e-10) rays.
    """
    T_incl = jnp.cumprod(one_minus, axis=-1)
    return jnp.concatenate(
        [jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=-1)


def _excl_cumprod_fwd(one_minus):
    T_excl = exclusive_cumprod(one_minus)
    return T_excl, (one_minus, T_excl)


def _excl_cumprod_bwd(res, dT):
    one_minus, T_excl = res
    s = dT * T_excl
    # suffix[j] = sum_{i > j} s_i: reverse-inclusive cumsum shifted left
    # (flip-cumsum-flip, no total-minus-prefix cancellation)
    rev = jnp.flip(jnp.cumsum(jnp.flip(s, axis=-1), axis=-1), axis=-1)
    suffix = jnp.concatenate(
        [rev[:, 1:], jnp.zeros_like(rev[:, :1])], axis=-1)
    return (suffix / one_minus,)


exclusive_cumprod.defvjp(_excl_cumprod_fwd, _excl_cumprod_bwd)


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
