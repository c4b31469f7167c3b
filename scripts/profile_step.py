#!/usr/bin/env python
"""Component-level timing of the train step on the current backend.

Times: full train step, render forward, density-feature eval alone,
appearance+MLP alone, blur-active step — to direct kernel optimization.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.render.renderer import BlurSpec, RenderConfig, render_rays
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)
from joint_tensorf_tpu.data.synthetic import sphere_poses


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    n_views, H, W = 100, 400, 400
    res = (300, 300, 300)
    n_samples = 1000
    rays_per_view = 20
    n_rays = rays_per_view * n_views

    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb, n_views)
    field = state.params.field

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    centers = jnp.asarray(rng.normal(size=(n_rays, 3)) * 0.1 + [0, 0, -4.0],
                          jnp.float32)
    d = rng.normal(size=(n_rays, 3)) * np.array([0.3, 0.3, 0.02]) + [0, 0, 1]
    dirs = jnp.asarray(d, jnp.float32)
    near_far = jnp.array([2.0, 6.0])

    rcfg = RenderConfig(n_samples=n_samples, is_train=True)

    # ---- density feature alone
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (n_rays * n_samples, 3)),
                      jnp.float32)

    @jax.jit
    def density_only(field, pts):
        return vm_lib.compute_density_feature(field, vm_cfg, pts)

    @jax.jit
    def app_only(field, pts):
        feats = vm_lib.compute_app_feature(field, vm_cfg, pts)
        vd = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        return head.apply(field.shading, pts, vd, feats)

    @jax.jit
    def fwd(field, centers, dirs, key):
        return render_rays(field, vm_cfg, rcfg, head, centers, dirs, key,
                           near_far)

    blur = BlurSpec(mode="uniform-gaussian", kernel_size=64)

    @jax.jit
    def fwd_blur(field, centers, dirs, key):
        return render_rays(field, vm_cfg, rcfg, head, centers, dirs, key,
                           near_far, blur=blur, c2f_density=jnp.float32(0.15),
                           c2f_color=jnp.float32(0.15))

    print(f"density_only ({n_rays*n_samples} pts): "
          f"{timeit(density_only, field, pts):8.2f} ms")
    print(f"app+mlp_only:  {timeit(app_only, field, pts):8.2f} ms")
    print(f"render_fwd:    {timeit(fwd, field, centers, dirs, key):8.2f} ms")
    print(f"render_fwd+blur:{timeit(fwd_blur, field, centers, dirs, key):7.2f} ms")

    # ---- full train step
    cfg = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
                     n_samples=n_samples, pose_opt=True, use_pose_noise=True)
    step = make_train_step(cfg, vm_cfg, head)
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 1.1 * W
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    ray_idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view])
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.0),
        c2f_color=jnp.float32(0.0), near_far=near_far,
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

    def full(st):
        return step(st, pose_base, intr, intr_inv, images, edges, view_sel,
                    ray_idx, key, s, None)

    print(f"train_step:    {timeit(full, state, iters=20):8.2f} ms "
          f"({n_rays} rays x {n_samples} samples)")

    cfg_b = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
                       n_samples=n_samples, pose_opt=True,
                       use_pose_noise=True, blur=blur)
    step_b = make_train_step(cfg_b, vm_cfg, head)
    sb = StepScalars(**{**s.__dict__, "c2f_density": jnp.float32(0.15),
                        "c2f_color": jnp.float32(0.15)})

    def full_b(st):
        return step_b(st, pose_base, intr, intr_inv, images, edges, view_sel,
                      ray_idx, key, sb, None)

    print(f"train_step+blur:{timeit(full_b, state, iters=20):7.2f} ms")


if __name__ == "__main__":
    main()
