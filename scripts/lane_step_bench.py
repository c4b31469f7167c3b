#!/usr/bin/env python
"""A/B the full train step: packed8 vs lane densify, per bench phase."""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)


def main():
    n_views, H, W = 100, 400, 400
    n_rays_total = 2048
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    rays_per_view = max(1, n_rays_total // n_views)
    n_rays = rays_per_view * n_views

    rng = np.random.default_rng(0)
    from joint_tensorf_tpu.data.synthetic import sphere_poses
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911) * (W / 800)
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.0),
        c2f_color=jnp.float32(0.0), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

    occ = (rng.random((160, 160, 160)) < 0.001).astype(np.float32)
    try:
        from scipy import ndimage
        occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(np.float32)
    except Exception:
        pass
    occ_grid = jnp.asarray(occ)

    def measure(name, res, n_samples, **cfg_kw):
        state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb,
                                 n_views)
        mask = None
        if cfg_kw.get("use_alpha_mask"):
            mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                             packed=pack_neighborhoods(occ_grid))
        cfg = StepConfig(H=H, W=W, n_views=n_views,
                         rays_per_view=rays_per_view, n_samples=n_samples,
                         pose_opt=True, use_pose_noise=True, **cfg_kw)
        step = make_train_step(cfg, vm_cfg, head)
        st = state

        def it(st, i):
            idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                              .astype(np.int64))
            return step(st, pose_base, intr, intr_inv, images, edges,
                        view_sel, idx, jax.random.PRNGKey(i), s, mask)

        for i in range(3):
            st, m = it(st, i)
            float(m["loss"])
        reps = []
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                st, m = it(st, 100 + r * 8 + i)
            float(m["loss"])
            reps.append((time.perf_counter() - t0) / 8)
        reps.sort()
        print(f"{name:32s}: {reps[1]*1000:8.1f} ms  "
              f"[{reps[0]*1000:.1f}, {reps[-1]*1000:.1f}]", flush=True)

    # early phase: 128^3, S=443
    measure("early packed8", (128,) * 3, 443, densify_density=True,
            densify_impl="packed8", app_k=64)
    measure("early lane", (128,) * 3, 443, densify_density=True,
            densify_impl="lane", app_k=64)
    # dense phase: 300^3, S=1000
    measure("dense packed8", (300,) * 3, 1000, densify_density=True,
            densify_impl="packed8", app_k=64)
    measure("dense lane", (300,) * 3, 1000, densify_density=True,
            densify_impl="lane", app_k=64)
    # compacted phase: factored (current) vs lane-densify vs fused
    measure("compact factored", (300,) * 3, 1000, use_alpha_mask=True,
            compact_k=256, densify_density=False, app_k=64)
    measure("compact lane-densify", (300,) * 3, 1000, use_alpha_mask=True,
            compact_k=256, densify_density=True, densify_impl="lane",
            app_k=64)
    # fused density+appearance factored gather over all K samples, dense
    # shading gated by weight>thres (the pre-app_k fused path): appearance
    # rides the same row ops as density
    measure("compact fused no-appk", (300,) * 3, 1000, use_alpha_mask=True,
            compact_k=256, densify_density=False, app_k=None)
    measure("compact fused k128", (300,) * 3, 1000, use_alpha_mask=True,
            compact_k=128, densify_density=False, app_k=None)


if __name__ == "__main__":
    main()
