#!/usr/bin/env python
"""Ablation timing of the COMPACTED train step (the 70%-of-schedule regime).

Times, at the bench's compacted configuration (2048 rays x 1000 -> K=256):
ray sampling + alpha lookup + top-K alone; compacted render fwd; compacted
render grad; grad without the pose path — to locate the remaining fixed
costs around the K-sample core.
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
        jax.block_until_ready(out)
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

    occ = rng.random((200, 200, 200)) < 0.02
    occ = ndimage.binary_dilation(occ, iterations=6).astype(np.float32)
    grid = jnp.asarray(occ)
    mask = AlphaMask(grid=grid, aabb=field.aabb,
                     packed=pack_neighborhoods(grid))

    # ---- sampling + mask + top-K alone
    @jax.jit
    def presample(field_aabb, centers, dirs):
        units = (field_aabb[1] - field_aabb[0]) / (jnp.asarray(res) - 1)
        step = jnp.mean(units) * vm_cfg.step_ratio
        pts, z_vals, in_bbox = sample_ray(field_aabb, step, S, centers, dirs,
                                          key, near_far[0], near_far[1], True)
        alphas = am_lib.sample_alpha(mask, pts.reshape(-1, 3)).reshape(n_rays, S)
        valid = in_bbox & (alphas > 0)
        _, topi = jax.lax.top_k(valid.astype(jnp.float32), K)
        topi = jnp.sort(topi, axis=-1)
        return jnp.take_along_axis(pts, topi[..., None], axis=1)

    print(f"sample+mask+topk          : "
          f"{timeit(presample, field.aabb, centers, dirs):7.1f} ms", flush=True)

    rcfg = RenderConfig(n_samples=S, is_train=True, use_alpha_mask=True,
                        compact_k=K, stop_coord_grad=False,
                        remat_shading=False, remat_features=False)

    def render_loss(field, centers, dirs):
        rgb, _, _ = render_rays(field, vm_cfg, rcfg, head, centers, dirs,
                                key, near_far, alpha_mask=mask)
        return jnp.mean(rgb)

    print(f"compact render fwd        : "
          f"{timeit(jax.jit(render_loss), field, centers, dirs):7.1f} ms",
          flush=True)
    print(f"compact render grad all   : "
          f"{timeit(jax.jit(jax.grad(render_loss, argnums=(0, 1, 2))), field, centers, dirs):7.1f} ms",
          flush=True)
    print(f"compact render grad field : "
          f"{timeit(jax.jit(jax.grad(render_loss, argnums=0)), field, centers, dirs):7.1f} ms",
          flush=True)

    rcfg_p = dataclasses.replace(rcfg, use_pallas_composite=True)

    def render_loss_p(field, centers, dirs):
        rgb, _, _ = render_rays(field, vm_cfg, rcfg_p, head, centers, dirs,
                                key, near_far, alpha_mask=mask)
        return jnp.mean(rgb)

    print(f"compact grad all (pallas) : "
          f"{timeit(jax.jit(jax.grad(render_loss_p, argnums=(0, 1, 2))), field, centers, dirs):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
