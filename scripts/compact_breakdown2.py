#!/usr/bin/env python
"""Ablation timing of the NEW compacted step (app_k two-stage appearance).

Locates the remaining costs in the 70%-of-schedule regime at the bench
configuration (2048 rays x 1000 -> K=256, app_k=64):
  - presample (ray sampling + alpha probe + top-K) at mask_stride 2 and 4
  - density-only grad (factored path on K samples)
  - full grad with app_k=64
  - full grad, mask_stride=4
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
from scipy import ndimage

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.models import alpha_mask as am_lib
from joint_tensorf_tpu.render.renderer import (RenderConfig, render_rays,
                                               sample_ray)
from joint_tensorf_tpu.train.step import init_train_state


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    n_rays, S, K = 2048, 1000, 256
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

    occ = rng.random((160, 160, 160)) < 0.001
    occ = ndimage.binary_dilation(occ, iterations=8).astype(np.float32)
    grid = jnp.asarray(occ)
    mask = AlphaMask(grid=grid, aabb=field.aabb,
                     packed=pack_neighborhoods(grid))

    def presample(stride):
        @jax.jit
        def fn(field_aabb, centers, dirs):
            units = (field_aabb[1] - field_aabb[0]) / (jnp.asarray(res) - 1)
            step = jnp.mean(units) * vm_cfg.step_ratio
            pts, z_vals, in_bbox = sample_ray(field_aabb, step, S, centers,
                                              dirs, key, near_far[0],
                                              near_far[1], True)
            probe = pts[:, ::stride].reshape(-1, 3)
            a = am_lib.sample_alpha(mask, probe).reshape(n_rays, S // stride)
            alphas = jnp.repeat(a, stride, axis=1)
            valid = in_bbox & (alphas > 0)
            _, topi = jax.lax.top_k(valid.astype(jnp.float32), K)
            topi = jnp.sort(topi, axis=-1)
            return jnp.take_along_axis(pts, topi[..., None], axis=1)
        return fn

    for stride in (2, 4):
        print(f"presample stride={stride}      : "
              f"{timeit(presample(stride), field.aabb, centers, dirs):7.1f} ms",
              flush=True)

    def loss_of(rcfg):
        def render_loss(field, centers, dirs):
            rgb, _, _ = render_rays(field, vm_cfg, rcfg, head, centers, dirs,
                                    key, near_far, alpha_mask=mask)
            return jnp.mean(rgb)
        return render_loss

    base = RenderConfig(n_samples=S, is_train=True, use_alpha_mask=True,
                        compact_k=K, stop_coord_grad=False,
                        remat_shading=False, remat_features=False)

    variants = {
        "fwd app_k=64             ": (dataclasses.replace(base, app_k=64),
                                      "fwd"),
        "grad app_k=64            ": (dataclasses.replace(base, app_k=64),
                                      "grad"),
        "grad app_k=64 stride4    ": (dataclasses.replace(base, app_k=64,
                                                          mask_stride=4),
                                      "grad"),
        "grad dense-app (old path)": (base, "grad"),
    }
    for name, (rcfg, kind) in variants.items():
        f = loss_of(rcfg)
        fn = jax.jit(f) if kind == "fwd" else jax.jit(
            jax.grad(f, argnums=(0, 1, 2)))
        print(f"{name}: {timeit(fn, field, centers, dirs):7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
