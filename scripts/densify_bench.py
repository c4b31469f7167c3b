#!/usr/bin/env python
"""Dense-grid density + two-stage appearance vs the fused factored step.

Times the full jitted train step at bench.py's three phases (early 128^3,
dense 300^3, compacted K=256) for:
  A. baseline: fused factored features (current default)
  B. densify_density only
  C. densify_density + app_k (two-stage appearance)
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
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)
from joint_tensorf_tpu.data.synthetic import sphere_poses


def main():
    app_k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_views, H, W = 100, 400, 400
    n_rays_total = 2048
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    rays_per_view = max(1, n_rays_total // n_views)

    rng = np.random.default_rng(0)
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

    def measure(step_fn, state, mask, iters=12):
        def run(st, i):
            idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                              .astype(np.int64))
            return step_fn(st, pose_base, intr, intr_inv, images, edges,
                           view_sel, idx, jax.random.PRNGKey(i), s, mask)
        st = state
        for i in range(3):
            st, m = run(st, i)
            float(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = run(st, 100 + i)
            float(m["loss"])
        t_sync = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = run(st, 200 + i)
        float(m["loss"])
        t_pipe = (time.perf_counter() - t0) / iters
        return min(t_sync, t_pipe) * 1000

    phases = {
        "early(128^3,S=443)": dict(res=(128, 128, 128), n_samples=443,
                                   mask=False),
        "dense(300^3,S=1000)": dict(res=(300, 300, 300), n_samples=1000,
                                    mask=False),
        "compact(300^3,K=256)": dict(res=(300, 300, 300), n_samples=1000,
                                     mask=True),
    }
    variants = {
        "A:baseline": {},
        "B:densify": {"densify_density": True},
        f"C:densify+app_k={app_k}": {"densify_density": True, "app_k": app_k},
    }
    for pname, ph in phases.items():
        state = init_train_state(jax.random.PRNGKey(0), vm_cfg, ph["res"],
                                 aabb, n_views)
        mask = None
        extra = {}
        if ph["mask"]:
            occ_grid = jnp.asarray(occ)
            mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                             packed=pack_neighborhoods(occ_grid))
            extra = {"use_alpha_mask": True, "compact_k": 256}
        for vname, vkw in variants.items():
            cfg = StepConfig(H=H, W=W, n_views=n_views,
                             rays_per_view=rays_per_view,
                             n_samples=ph["n_samples"], pose_opt=True,
                             use_pose_noise=True, **extra, **vkw)
            step = make_train_step(cfg, vm_cfg, head)
            ms = measure(step, state, mask)
            print(f"{pname:24s} {vname:24s} {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
