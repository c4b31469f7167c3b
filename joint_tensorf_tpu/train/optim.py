"""Minimal pytree Adam with per-leaf learning-rate scaling.

The reference drives torch.optim.Adam with per-group lrs that are rescaled
every iteration and rebuilt at upsample boundaries (tensorf.py:428-436,
463-478).  Here learning rates are *runtime inputs* (traced scalars) so lr
decay/reset/warmup never trigger recompilation; the Adam moments are a
pytree mirroring the params and are re-initialized at phase boundaries
(matching the reference's optimizer reset on upsample).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Any
    nu: Any
    count: Any  # scalar int32


def adam_init(params) -> AdamState:
    # moments live in float32 even for reduced-precision params (bf16
    # factor storage, VMConfig.factor_dtype) — moment EMAs accumulate
    # many small contributions and must not round them away
    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    return AdamState(mu=zeros,
                     nu=jax.tree.map(lambda p: jnp.zeros(p.shape,
                                                         jnp.float32), params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lr_tree,
                b1: float = 0.9, b2: float = 0.99, eps: float = 1e-8):
    """One Adam step.  lr_tree: pytree of (traced) scalars or one scalar.

    Returns (new_params, new_state).  Matches torch.optim.Adam semantics
    (bias-corrected moments).
    """
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1**c
    bc2 = 1.0 - b2**c

    if not isinstance(lr_tree, (dict, list, tuple)) and not dataclasses.is_dataclass(lr_tree):
        lr_tree = jax.tree.map(lambda _: lr_tree, params)

    # frozen (lr==0) leaves keep their old moments too: a non-finite grad
    # reaching a frozen leaf must not poison mu/nu, or the leaf breaks
    # permanently if its lr later becomes nonzero (ADVICE round-4)
    mu = jax.tree.map(
        lambda m, g, lr: jnp.where(
            lr == 0.0, m, b1 * m + (1 - b1) * g.astype(jnp.float32)),
        state.mu, grads, lr_tree)
    nu = jax.tree.map(
        lambda v, g, lr: jnp.where(
            lr == 0.0, v,
            b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32))),
        state.nu, grads, lr_tree)

    # update math in float32; result cast back to the parameter's storage
    # dtype (no-op for float32 params)
    # zero-lr leaves (aabb, frozen groups) are EXACTLY frozen: `p - 0*m`
    # would still propagate a non-finite moment into the parameter
    # (0 * NaN = NaN), so select the old value instead of scaling by 0
    new_params = jax.tree.map(
        lambda p, m, v, lr: jnp.where(
            lr == 0.0, p.astype(jnp.float32),
            p.astype(jnp.float32)
            - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(p.dtype),
        params, mu, nu, lr_tree,
    )
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def masked_update(do_step, new_params, new_state, params, state):
    """where-gated optimizer step (for pose-gradient accumulation cadence)."""
    sel = lambda a, b: jax.tree.map(
        lambda x, y: jnp.where(do_step, x, y), a, b)
    return sel(new_params, params), AdamState(
        mu=sel(new_state.mu, state.mu),
        nu=sel(new_state.nu, state.nu),
        count=jnp.where(do_step, new_state.count, state.count),
    )


def field_lr_tree(field, lr_index, lr_basis):
    """Per-leaf lrs for a VMState: factor grids get lr_index, basis/shading
    get lr_basis (reference tensoRF.py:189-195).  aabb gets lr 0."""
    import dataclasses as dc

    return dc.replace(
        field,
        density_planes=[lr_index for _ in field.density_planes],
        density_lines=[lr_index for _ in field.density_lines],
        app_planes=[lr_index for _ in field.app_planes],
        app_lines=[lr_index for _ in field.app_lines],
        basis=lr_basis,
        shading=jax.tree.map(lambda _: lr_basis, field.shading),
        aabb=jnp.zeros(()),
    )
