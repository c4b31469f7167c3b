"""Camera pose ([R|t], shape [...,3,4]) algebra (reference camera.py:11-57)."""
from __future__ import annotations

import jax.numpy as jnp


def make(R=None, t=None):
    """Build a [...,3,4] pose from R [...,3,3] and/or t [...,3]."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R)
        t = jnp.asarray(t)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert(pose):
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = (-R_inv @ t)[..., 0]
    return make(R=R_inv, t=t_inv)


def compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make(R=R_new, t=t_new)


def compose(pose_list):
    """compose([p1, p2, ..., pN])(x) = pN(...(p2(p1(x))))."""
    out = pose_list[0]
    for p in pose_list[1:]:
        out = compose_pair(out, p)
    return out


def to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2world(X, pose):
    pose_inv = invert(pose)
    return to_hom(X) @ jnp.swapaxes(pose_inv, -1, -2)


def angle_to_rotation_matrix(a, axis: str):
    """Rotation about a named axis (reference camera.py:220-229)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), O], axis=-1),
            jnp.stack([jnp.sin(a), jnp.cos(a), O], axis=-1),
            jnp.stack([O, O, I], axis=-1),
        ],
        axis=-2,
    )
    return jnp.roll(M, (roll, roll), axis=(-2, -1))
