#!/usr/bin/env python
"""Compacted-phase ablations: where do the 153 ms go?

Variants of the full compacted train step (2048 rays, S=1000 -> K=256):
  full              the production config (factored density, app_k=64)
  no_pose           pose_opt=False (kills coordinate/pose grads + pose adam)
  no_mask           alpha mask off (no probe; compaction score = in_bbox)
  stride4           mask probe every 4th sample
  app32 / app128    app_k sensitivity (slope -> appearance cost)
  k192 / k320       compact_k sensitivity (slope -> density cost)
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
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)


def main():
    n_views, H, W = 100, 400, 400
    rays_per_view = 20
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]

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
    from scipy import ndimage
    occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(np.float32)
    occ_grid = jnp.asarray(occ)
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, (300,) * 3,
                             aabb, n_views)
    mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                     packed=pack_neighborhoods(occ_grid))

    def measure(name, use_mask=True, **cfg_kw):
        kw = dict(pose_opt=True, use_pose_noise=True, use_alpha_mask=use_mask,
                  compact_k=256, densify_density=False, app_k=64,
                  n_samples=1000)
        kw.update(cfg_kw)
        cfg = StepConfig(H=H, W=W, n_views=n_views,
                         rays_per_view=rays_per_view, **kw)
        step = make_train_step(cfg, vm_cfg, head)
        st = state
        m_arg = mask if use_mask else None

        def it(st, i):
            idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                              .astype(np.int64))
            return step(st, pose_base, intr, intr_inv, images, edges,
                        view_sel, idx, jax.random.PRNGKey(i), s, m_arg)

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
        print(f"{name:24s}: {reps[1]*1000:8.1f} ms", flush=True)

    measure("full")
    measure("no_pose", pose_opt=False)
    measure("no_mask", use_mask=False)
    measure("stride4", mask_stride=4)
    measure("app32", app_k=32)
    measure("app128", app_k=128)
    measure("k192", compact_k=192)
    measure("k320", compact_k=320)


if __name__ == "__main__":
    main()
