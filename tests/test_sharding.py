"""Multi-chip sharding tests on the virtual CPU device mesh.

The reference has no intra-job parallelism at all (SURVEY.md §2 parallelism
note, options.py:126); this framework adds a {rays, comp} mesh with
data-parallel rays and component-parallel factor grids (SURVEY.md §5.8).
These tests validate that the sharded train step compiles and executes on
an 8-virtual-device mesh, that the joint pose gradient survives the psum
reduction, and that one sharded step matches the unsharded step numerically.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _tiny_setup
from joint_tensorf_tpu.data.synthetic import sphere_poses
from joint_tensorf_tpu.parallel.mesh import make_mesh
from joint_tensorf_tpu.parallel.sharding import shard_train_step
from joint_tensorf_tpu.render.renderer import BlurSpec
from joint_tensorf_tpu.train.step import StepScalars, make_train_step


def _inputs(cfg):
    n_views, H, W = cfg.n_views, cfg.H, cfg.W
    rng = np.random.default_rng(0)
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 1.2 * W
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    ray_idx = jnp.asarray(rng.permutation(H * W)[:128].astype(np.int64))
    scalars = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.15),
        c2f_color=jnp.float32(0.15), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(8e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(1.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))
    return (pose_base, intr, intr_inv, images, edges, view_sel, ray_idx,
            jax.random.PRNGKey(0), scalars, None)


def test_sharded_step_matches_unsharded():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(shape=(4, 2), axes=("rays", "comp"),
                     devices=devices[:8])

    vm_cfg, head, state, cfg = _tiny_setup()
    cfg = dataclasses.replace(
        cfg, blur=BlurSpec(mode="uniform-gaussian", kernel_size=16))
    args = _inputs(cfg)

    ref_step = make_train_step(cfg, vm_cfg, head)           # single device
    ref_state, ref_metrics = ref_step(state, *args)

    raw_step = make_train_step(cfg, vm_cfg, head, jit=False)
    sharded = shard_train_step(raw_step, mesh, state, shard_components=True)
    with mesh:
        sh_state, sh_metrics = sharded(state, *args)

    assert np.isfinite(float(sh_metrics["loss"]))
    # psum/reduction order differs from the single-device sum -> tolerance
    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-4, atol=1e-6)

    # joint gradient flow reached the (replicated) pose table identically
    ref_se3 = np.asarray(ref_state.params.se3_refine)
    sh_se3 = np.asarray(sh_state.params.se3_refine)
    assert np.abs(sh_se3).max() > 0, "pose parameters did not update"
    np.testing.assert_allclose(sh_se3, ref_se3, rtol=1e-3, atol=1e-6)

    # component-sharded factor grids updated consistently with the
    # replicated reference
    for p_ref, p_sh in zip(ref_state.params.field.density_planes,
                           sh_state.params.field.density_planes):
        np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                                   rtol=1e-3, atol=1e-6)
