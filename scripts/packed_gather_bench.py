#!/usr/bin/env python
"""Corner-packed plane sampling vs 4-corner gathers: fwd + VJP on TPU.

Hypothesis from step_breakdown.py: row-op overhead dominates (4 corner
gathers + 4 corner scatters per plane).  Packing the 2x2 neighborhood
channel-wise ([H, W, 4R]) turns them into ONE gather / ONE scatter of
4x-wider rows — the same trick that made the alpha-mask lookup 12x
faster (models/alpha_mask.py pack_neighborhoods).
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.sampling import sample_plane, _pix, _floor_frac


def pack_plane(plane):
    """[H, W, R] -> [H, W, 4R]: (self, x+1, y+1, x+1&y+1), edge-clamped."""
    H, W, R = plane.shape
    px = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    py = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    pxy = jnp.concatenate([py[:, 1:], py[:, -1:]], axis=1)
    return jnp.concatenate([plane, px, py, pxy], axis=-1)


def sample_plane_packed(plane, u, v):
    H, W, R = plane.shape
    packed = pack_plane(plane).reshape(H * W, 4 * R)
    x = _pix(u, W)
    y = _pix(v, H)
    x0, fx = _floor_frac(x, W)
    y0, fy = _floor_frac(y, H)
    rows = jnp.take(packed, y0 * W + x0, axis=0)            # [N, 4R]
    w00 = ((1 - fy) * (1 - fx))[:, None]
    w01 = ((1 - fy) * fx)[:, None]
    w10 = (fy * (1 - fx))[:, None]
    w11 = (fy * fx)[:, None]
    return (rows[:, :R] * w00 + rows[:, R:2 * R] * w01
            + rows[:, 2 * R:3 * R] * w10 + rows[:, 3 * R:] * w11)


def timeit(fn, *args, iters=8, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    H, W, R, N = 300, 300, 64, 2_000_000
    key = jax.random.PRNGKey(0)
    plane = jax.random.normal(key, (H, W, R), jnp.float32)
    u = jax.random.uniform(key, (N,), minval=-1, maxval=1)
    v = jax.random.uniform(key, (N,), minval=-1, maxval=1)
    g = jax.random.normal(key, (N, R), jnp.float32)

    # correctness
    a = sample_plane(plane, u, v)
    b = sample_plane_packed(plane, u, v)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"fwd max err {err:.2e}", flush=True)

    from joint_tensorf_tpu.ops.sampling import sample_plane_hybrid
    c = sample_plane_hybrid(plane, u, v)
    print(f"hybrid fwd max err {float(jnp.max(jnp.abs(a - c))):.2e}", flush=True)
    gh = jax.grad(lambda p: jnp.sum(sample_plane_hybrid(p, u[:1000], v[:1000])
                                    * g[:1000]))(plane)
    gn = jax.grad(lambda p: jnp.sum(sample_plane(p, u[:1000], v[:1000])
                                    * g[:1000]))(plane)
    print(f"hybrid d_plane max err {float(jnp.max(jnp.abs(gh - gn))):.2e}",
          flush=True)

    for name, fn in [("4-corner", sample_plane),
                     ("packed", sample_plane_packed),
                     ("hybrid", sample_plane_hybrid)]:
        f = jax.jit(fn)
        print(f"{name:9s} fwd        : {timeit(f, plane, u, v):7.1f} ms",
              flush=True)

        def loss(p, uu, vv, gg, fn=fn):
            return jnp.sum(fn(p, uu, vv) * gg)

        gf = jax.jit(jax.grad(loss, argnums=0))
        print(f"{name:9s} grad field : {timeit(gf, plane, u, v, g):7.1f} ms",
              flush=True)
        gb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        print(f"{name:9s} grad all   : {timeit(gb, plane, u, v, g):7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
