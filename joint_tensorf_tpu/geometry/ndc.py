"""NDC reparameterization for forward-facing (LLFF-style) scenes.

Matches the reference convention (camera.py:303-340): cameras face +z
(unlike standard NeRF NDC), ray origins are shifted to the near plane first,
and the projective scale comes from the intrinsics (f/c per axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def convert_ndc(center, ray, intr, near: float = 1.0,
                center_shift: bool = True, detach_center_shift: bool = False):
    """center, ray: [B,N,3]; intr: [B,3,3]. Returns NDC (center, ray)."""
    if center_shift:
        shift = (near - center[..., 2:]) / ray[..., 2:] * ray
        if detach_center_shift:
            shift = jax.lax.stop_gradient(shift)
        center = center + shift

    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]

    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]  # [B,1]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]

    cxoz, cyoz = cx / cz, cy / cz
    rxoz, ryoz = rx / rz, ry / rz

    cnx = scale_x * cxoz
    cny = scale_y * cyoz
    cnz = 1 - 2 * near / cz

    rnx = scale_x * (rxoz - cxoz)
    rny = scale_y * (ryoz - cyoz)
    rnz = 2 * near / cz

    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def grad_rescale(source, target):
    """Forward = source; backward gradients rescaled to |target| magnitude.

    Used to make NDC-space depth samples carry Euclidean-scale gradients
    (reference util.py:235-239, tensorBase.py:561).
    """
    weight = jnp.abs(target) / jnp.clip(jnp.abs(source), min=0.1)
    scaled = source * weight
    return scaled + jax.lax.stop_gradient(source - scaled)
