#!/usr/bin/env python
"""Compacted-phase variants: app_k with/without densify, K2 sweep."""
import sys, time
sys.path.insert(0, ".")
from joint_tensorf_tpu.utils import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)
from joint_tensorf_tpu.data.synthetic import sphere_poses

def main():
    n_views, H, W = 100, 400, 400
    vm_cfg = vm_lib.VMConfig(); head = vm_cfg.shading_head()
    aabb = [-1.5,-1.5,-1.5,1.5,1.5,1.5]
    rays_per_view = 20
    rng = np.random.default_rng(0)
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 0.5*800/np.tan(0.5*0.6911)*(W/800)
    intr = jnp.asarray(np.broadcast_to(np.array([[focal,0,W/2],[0,focal,H/2],[0,0,1]],dtype=np.float32),(n_views,3,3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views,H*W,3)),jnp.float32)
    edges = jnp.zeros((n_views,H*W),jnp.float32)
    view_sel = jnp.arange(n_views)
    s = StepScalars(lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.0),
        c2f_color=jnp.float32(0.0), near_far=jnp.array([2.0,6.0]),
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))
    occ = (rng.random((160,160,160))<0.001).astype(np.float32)
    from scipy import ndimage
    occ = ndimage.binary_dilation(occ>0, iterations=8).astype(np.float32)
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, (300,300,300), aabb, n_views)
    occ_grid = jnp.asarray(occ)
    mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                     packed=pack_neighborhoods(occ_grid))
    def measure(step_fn, iters=12):
        def run(st,i):
            idx = jnp.asarray(rng.permutation(H*W)[:rays_per_view].astype(np.int64))
            return step_fn(st, pose_base, intr, intr_inv, images, edges,
                           view_sel, idx, jax.random.PRNGKey(i), s, mask)
        st = state
        for i in range(3):
            st, m = run(st,i); float(m["loss"])
        t0=time.perf_counter()
        for i in range(iters): st,m = run(st,100+i)
        float(m["loss"])
        return (time.perf_counter()-t0)/iters*1000
    variants = {
        "D:app_k=64 only": {"app_k":64},
        "E:app_k=32 only": {"app_k":32},
        "F:densify+app_k=32": {"densify_density":True,"app_k":32},
        "G:app_k=96 only": {"app_k":96},
    }
    for vname, vkw in variants.items():
        cfg = StepConfig(H=H,W=W,n_views=n_views,rays_per_view=rays_per_view,
                         n_samples=1000, pose_opt=True, use_pose_noise=True,
                         use_alpha_mask=True, compact_k=256, **vkw)
        step = make_train_step(cfg, vm_cfg, head)
        print(f"compact {vname:22s} {measure(step):8.1f} ms", flush=True)

if __name__ == "__main__":
    main()
