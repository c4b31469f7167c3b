#!/usr/bin/env python
"""Ablation timing of the dense train step's backward composition.

Times jitted forward/grad variants of the real render path to locate
where the ~1s dense step goes: factor-grid grads (scatter), coordinate
grads (pose path), shading MLP, compositor, remat recompute.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.render.renderer import RenderConfig, render_rays
from joint_tensorf_tpu.train.step import init_train_state
from joint_tensorf_tpu.ops.sampling import sample_plane, sample_line


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
    n_rays, n_samples = 2000, 1000
    res = (300, 300, 300)
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb, 4)
    field = state.params.field

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    centers = jnp.asarray(rng.normal(size=(n_rays, 3)) * 0.1 + [0, 0, -4.0],
                          jnp.float32)
    d = rng.normal(size=(n_rays, 3)) * np.array([0.3, 0.3, 0.02]) + [0, 0, 1]
    dirs = jnp.asarray(d, jnp.float32)
    near_far = jnp.array([2.0, 6.0])
    N = n_rays * n_samples
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)), jnp.float32)

    # ---- fused features: fwd, grad wrt field, grad wrt coords, both
    def feats(field, pts):
        s, a = vm_lib.compute_fused_features(field, vm_cfg, pts)
        return jnp.sum(s) + jnp.sum(a)

    t = timeit(jax.jit(feats), field, pts)
    print(f"fused feats fwd           : {t:7.1f} ms", flush=True)
    g_field = jax.jit(jax.grad(feats, argnums=0))
    print(f"grad wrt FIELD only       : {timeit(g_field, field, pts):7.1f} ms",
          flush=True)
    g_pts = jax.jit(jax.grad(feats, argnums=1))
    print(f"grad wrt COORDS only      : {timeit(g_pts, field, pts):7.1f} ms",
          flush=True)
    g_both = jax.jit(jax.grad(feats, argnums=(0, 1)))
    print(f"grad wrt BOTH             : {timeit(g_both, field, pts):7.1f} ms",
          flush=True)

    # ---- plane-only and line-only scatter costs at step scale
    u = jax.random.uniform(key, (N,), minval=-1, maxval=1)
    v = jax.random.uniform(key, (N,), minval=-1, maxval=1)
    g64 = jax.random.normal(key, (N, 64), jnp.float32)
    plane = jax.random.normal(key, (300, 300, 64), jnp.float32)
    line = jax.random.normal(key, (300, 64), jnp.float32)

    def pl_loss(p, uu, vv, gg):
        return jnp.sum(sample_plane(p, uu, vv) * gg)

    def ln_loss(l, ww, gg):
        return jnp.sum(sample_line(l, ww) * gg)

    print(f"1 plane grad (field)      : "
          f"{timeit(jax.jit(jax.grad(pl_loss)), plane, u, v, g64):7.1f} ms",
          flush=True)
    print(f"1 plane grad (coords)     : "
          f"{timeit(jax.jit(jax.grad(pl_loss, argnums=(1, 2))), plane, u, v, g64):7.1f} ms",
          flush=True)
    print(f"1 line  grad (field)      : "
          f"{timeit(jax.jit(jax.grad(ln_loss)), line, u, g64):7.1f} ms",
          flush=True)

    # ---- full render fwd + full render grad (dense, no mask)
    rcfg = RenderConfig(n_samples=n_samples, is_train=True,
                        stop_coord_grad=False)

    def render_loss(field, centers, dirs):
        rgb, _, _ = render_rays(field, vm_cfg, rcfg, head, centers, dirs,
                                key, near_far)
        return jnp.mean(rgb)

    print(f"render fwd                : "
          f"{timeit(jax.jit(render_loss), field, centers, dirs):7.1f} ms",
          flush=True)
    print(f"render grad (field+pose)  : "
          f"{timeit(jax.jit(jax.grad(render_loss, argnums=(0, 1, 2))), field, centers, dirs):7.1f} ms",
          flush=True)
    rcfg_nr = dataclasses.replace(rcfg, remat_features=False,
                                  remat_shading=False)

    def render_loss_nr(field, centers, dirs):
        rgb, _, _ = render_rays(field, vm_cfg, rcfg_nr, head, centers, dirs,
                                key, near_far)
        return jnp.mean(rgb)

    try:
        print(f"render grad (no remat)    : "
              f"{timeit(jax.jit(jax.grad(render_loss_nr, argnums=(0, 1, 2))), field, centers, dirs):7.1f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"render grad (no remat)    : OOM/{type(e).__name__}",
              flush=True)


if __name__ == "__main__":
    main()
