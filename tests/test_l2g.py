"""L2G-BAT engine tests (reference l2g_bat.py — dead code there, working
here; see train/l2g.py docstring)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.geometry import lie, poses as pose_ops
from joint_tensorf_tpu.geometry.align import rigid_points_registration
from joint_tensorf_tpu.train import l2g
from joint_tensorf_tpu.train.step import StepConfig, default_scalars


def test_rigid_registration_recovers_pose():
    """Kabsch recovers a known SE(3) exactly from noiseless points."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 50, 3)), jnp.float32)
    se3 = jnp.asarray(rng.normal(size=(4, 6)) * 0.3, jnp.float32)
    pose = lie.se3_to_SE3(se3)                       # [4,3,4]
    R_true, t_true = pose[..., :3], pose[..., 3]
    y = jnp.einsum("bij,bnj->bni", R_true, x) + t_true[:, None]
    R, t = rigid_points_registration(x, y)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)
    # special orthogonal
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_rigid_registration_differentiable():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)

    def f(y):
        R, t = rigid_points_registration(x, y)
        return jnp.sum(R) + jnp.sum(t)

    g = jax.grad(f)(y)
    assert np.isfinite(np.asarray(g)).all()


def test_warp_mlp_zero_init_is_identity():
    """Zeroed last layer -> zero se(3) -> local pose == base pose."""
    cfg = l2g.L2GConfig(embedding_dim=8, layers_warp=(16, 6))
    key = jax.random.PRNGKey(0)
    mlp = l2g.init_warp_mlp(key, cfg)
    W, b = mlp[-1]
    mlp[-1] = (jnp.zeros_like(W), jnp.zeros_like(b))
    uvf = jax.random.normal(key, (5, 7, 2 + 8))
    out = l2g.warp_mlp_apply(cfg, mlp, uvf)
    assert out.shape == (5, 7, 6)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_warp_mlp_skip_connections():
    cfg = l2g.L2GConfig(embedding_dim=4, layers_warp=(8, 8, 6),
                        skip_warp=(1,))
    mlp = l2g.init_warp_mlp(jax.random.PRNGKey(0), cfg)
    # layer 1 takes 8 + (2+4) inputs
    assert mlp[1][0].shape[0] == 8 + 6
    out = l2g.warp_mlp_apply(cfg, mlp, jnp.ones((3, 2 + 4)))
    assert out.shape == (3, 6)


def test_error_map_sampling_shapes_and_bias():
    """High-error cells are sampled more often; indices are in range."""
    key = jax.random.PRNGKey(0)
    ems, H, W, n_rays = 8, 32, 32, 16
    em = jnp.ones((3, ems * ems)).at[0, 5].set(1000.0)
    hits = 0
    for i in range(20):
        ray_idx, coarse = l2g.sample_error_map_rays(
            em, jax.random.fold_in(key, i), H, W, ems, n_rays)
        assert ray_idx.shape == (3, n_rays)
        assert coarse.shape == (3, n_rays)
        assert (ray_idx >= 0).all() and (ray_idx < H * W).all()
        # without replacement within a view
        assert len(set(np.asarray(coarse[0]).tolist())) == n_rays
        hits += int(5 in np.asarray(coarse[0]))
    assert hits == 20  # weight 1000x -> cell 5 always drawn for view 0


def _tiny_setup():
    from joint_tensorf_tpu.models import vm as vm_lib

    vm_cfg = vm_lib.VMConfig(density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4),
                             app_dim=8, hidden=16)
    head = vm_cfg.shading_head()
    l2g_cfg = l2g.L2GConfig(embedding_dim=4, layers_warp=(8, 6),
                            error_map_size=4)
    n_views, H, W = 3, 8, 8
    cfg = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=6,
                     n_samples=16, pose_opt=True)
    key = jax.random.PRNGKey(0)
    pose_init = jnp.broadcast_to(jnp.eye(3, 4), (n_views, 3, 4))
    state = l2g.init_l2g_state(key, vm_cfg, l2g_cfg, (16, 16, 16),
                               [-1.5] * 3 + [1.5] * 3, n_views, pose_init)
    return vm_cfg, head, l2g_cfg, cfg, state, n_views, H, W


def test_l2g_train_step_runs_and_updates():
    vm_cfg, head, l2g_cfg, cfg, state, n_views, H, W = _tiny_setup()
    step = l2g.make_l2g_train_step(cfg, l2g_cfg, vm_cfg, head, jit=True)
    key = jax.random.PRNGKey(1)
    pose_base = jnp.broadcast_to(jnp.eye(3, 4), (n_views, 3, 4))
    intr = jnp.broadcast_to(
        jnp.asarray([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]]), (n_views, 3, 3))
    intr_inv = jnp.linalg.inv(intr)
    images = jax.random.uniform(key, (n_views, H * W, 3))
    edges = jnp.zeros((n_views, H * W))
    view_sel = jnp.arange(n_views)
    ray_idx = jnp.arange(cfg.rays_per_view)
    s = dataclasses.replace(default_scalars(n_views),
                            lr_index=jnp.float32(1e-2),
                            lr_basis=jnp.float32(1e-3),
                            lr_pose=jnp.float32(1e-3),
                            near_far=jnp.array([2.0, 6.0]))
    new_state, metrics = step(state, pose_base, intr, intr_inv, images,
                              edges, view_sel, ray_idx, key, s, None)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["global_alignment"]))
    # error map was EMA-updated somewhere
    assert not np.allclose(np.asarray(new_state.error_map),
                           np.asarray(state.error_map))
    # warp params moved (the embedding's grad is exactly zero on step one —
    # the zero-initialized last layer blocks it — but the last layer's own
    # grad is the se(3) chain and must be nonzero)
    assert not np.allclose(np.asarray(new_state.params.warp_mlp[-1][0]),
                           np.asarray(state.params.warp_mlp[-1][0]))
    # optimised poses were registered and are finite
    assert np.isfinite(np.asarray(new_state.optimised_poses)).all()


def test_l2g_identity_warp_registers_base_pose():
    """With zero warps the global registration must recover the base pose."""
    vm_cfg, head, l2g_cfg, cfg, state, n_views, H, W = _tiny_setup()
    se3 = jnp.asarray(np.random.default_rng(2).normal(size=(n_views, 6)) * 0.2,
                      jnp.float32)
    pose_base = lie.se3_to_SE3(se3)
    step = l2g.make_l2g_train_step(cfg, l2g_cfg, vm_cfg, head, jit=False)
    intr = jnp.broadcast_to(
        jnp.asarray([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]]), (n_views, 3, 3))
    key = jax.random.PRNGKey(3)
    new_state, _ = step(state, pose_base, intr, jnp.linalg.inv(intr),
                        jnp.zeros((n_views, H * W, 3)),
                        jnp.zeros((n_views, H * W)), jnp.arange(n_views),
                        jnp.arange(cfg.rays_per_view), key,
                        default_scalars(n_views), None)
    np.testing.assert_allclose(np.asarray(new_state.optimised_poses),
                               np.asarray(pose_base), atol=1e-4)


def test_l2g_depth_range():
    poses = pose_ops.make(t=jnp.asarray([[0, 0, -2.0], [0, 0, 2.0]]))
    near, far = l2g.l2g_depth_range(poses, (2.0, 6.0))
    # diameter 4: near = 2/8*4 = 1, far = 6/8*4 = 3
    np.testing.assert_allclose(near, 1.0, atol=1e-5)
    np.testing.assert_allclose(far, 3.0, atol=1e-5)


def test_l2g_trainer_smoke():
    """L2GTrainer end-to-end on the tiny synthetic scene, crossing an
    upsample and an alpha-mask build (the full BAT phase machinery under
    the l2g step)."""
    import os

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train.l2g_trainer import L2GTrainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = set_options(
        os.path.join(repo, "configs", "l2g_bat_blender_VM.yaml"),
        ["--data.dataset=synthetic", "--data.image_size=[32,32]",
         "--data.n_views=4", "--max_iter=12",
         "--train_schedule.n_voxel_init=32768",
         "--train_schedule.n_voxel_final=110592",
         "--train_schedule.upsample_iters=[6]",
         "--train_schedule.update_alphamask_iters=[10]",
         "--train_schedule.n_rays_init=128",
         "--train_schedule.n_rays_rest=128",
         "--nerf.sample_intvs=48", "--c2f_kernel_size=8",
         "--blur_2d_c2f_kernel_size=15", "--error_map_size=8",
         "--+data.scene_bbox=[-1.5,-1.5,-1.5,1.5,1.5,1.5]",
         "--+data.val_sub=2"])
    scene = load_dataset(opt, "train")
    tr = L2GTrainer(opt, scene)
    hist = tr.run(max_iter=12, log_every=4)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # phase transitions happened under the l2g step
    assert tr.alpha_mask is not None
    # the registered pose table is live and finite
    pose, pose_gt = tr.get_all_training_poses()
    assert np.isfinite(np.asarray(pose)).all()
    assert not np.allclose(np.asarray(pose), np.asarray(tr.pose_base))
