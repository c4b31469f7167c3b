"""Test-time photometric pose optimization.

Reference bat.py:265-292: for each test view, a fresh se(3) parameter
absorbs the remaining pose error via test_iter Adam steps on the photometric
loss, with an exponential lr schedule and (LLFF) a test-kernel blur
schedule driven by test_time_progress.  The scene stays frozen — only the
6-dof pose parameter gets gradients, so one jitted step re-runs per view at
trivial cost.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry import lie, poses as pose_ops
from ..geometry.rays import get_center_and_ray
from ..geometry.ndc import convert_ndc
from ..models import vm as vm_lib
from ..render.renderer import BlurSpec, render_rays
from ..train.losses import mse
from ..train.optim import adam_init, adam_update


def make_test_time_optimizer(
    vm_cfg: vm_lib.VMConfig,
    rcfg,                      # RenderConfig (is_train=True for stratified)
    head,
    H: int,
    W: int,
    n_rays: int,
    test_iter: int,
    lr_init: float,
    lr_end: float,
    blur: Optional[BlurSpec] = None,
    test_kernel_schedule=None,
    ndc: bool = False,
    ndc_near_plane: float = 1.0,
):
    """Returns optimize(field, alpha_mask, pose [3,4], image [HW,3], intr,
    intr_inv, near_far, rng) -> refined pose [3,4]."""
    gamma = (lr_end / lr_init) ** (1.0 / test_iter)

    def loss_fn(se3_test, field, alpha_mask, pose, image, intr, intr_inv,
                near_far, rng, c2f, lr):
        refine = lie.se3_to_SE3(se3_test)
        composed = pose_ops.compose([refine, pose[None]])
        ray_idx = jax.random.permutation(
            jax.random.fold_in(rng, 0), H * W)[:n_rays]
        centers, dirs = get_center_and_ray(H, W, composed, intr_inv[None],
                                           ray_idx=ray_idx)
        if ndc:
            centers, dirs = convert_ndc(centers, dirs, intr[None],
                                        near=ndc_near_plane)
        rgb, _, _ = render_rays(
            field, vm_cfg, rcfg, head, centers.reshape(-1, 3),
            dirs.reshape(-1, 3), rng, near_far, alpha_mask=alpha_mask,
            blur=blur, c2f_density=c2f, c2f_color=c2f)
        target = jnp.take(image, ray_idx, axis=0)
        return mse(rgb, target)

    @jax.jit
    def step(se3_test, opt_state, field, alpha_mask, pose, image, intr,
             intr_inv, near_far, rng, c2f, lr):
        loss, g = jax.value_and_grad(loss_fn)(
            se3_test, field, alpha_mask, pose, image, intr, intr_inv,
            near_far, rng, c2f, lr)
        new_se3, opt_state = adam_update(g, opt_state, se3_test, lr, b2=0.999)
        return new_se3, opt_state, loss

    def optimize(field, alpha_mask, pose, image, intr, intr_inv, near_far,
                 rng):
        from ..sched.schedules import interp_schedule

        se3_test = jnp.zeros((1, 6))
        opt_state = adam_init(se3_test)
        losses = []
        for it in range(test_iter):
            progress = it / test_iter
            c2f = 0.0
            if test_kernel_schedule is not None:
                c2f = interp_schedule(progress, test_kernel_schedule)
            lr = lr_init * (gamma**it)
            rng, k = jax.random.split(rng)
            se3_test, opt_state, loss = step(
                se3_test, opt_state, field, alpha_mask, pose, image, intr,
                intr_inv, near_far, k, jnp.float32(c2f), jnp.float32(lr))
            losses.append(loss)
        refine = lie.se3_to_SE3(se3_test)
        return pose_ops.compose([refine, pose[None]])[0], float(losses[-1])

    return optimize


def make_barf_test_time_optimizer(
    mlp_cfg,                 # models.nerf_mlp.NerfMLPConfig
    opt,                     # Options (nerf.* render settings)
    H: int,
    W: int,
    n_rays: int,
    test_iter: int,
    lr: float,
    ndc: bool = False,
):
    """MLP-NeRF test-time photometric pose optimization (barf.py:162-197).

    A fresh se(3) parameter absorbs the residual pose error of one test
    view via ``test_iter`` Adam steps at fixed lr (barf.py:167 uses a
    single constant lr group) on the photometric MSE of ``n_rays``
    randomly drawn rays per step, with the frozen MLP (mode="test-optim",
    nerf.py:655-657 samples rand_rays in that mode too).

    Returns optimize(params [BarfParams], pose [3,4], image [HW,3], intr,
    intr_inv, near_far, rng) -> (refined pose [3,4], final loss).
    """
    from ..models import nerf_mlp

    n_samples = int(opt.nerf.sample_intvs)
    stratified = bool(opt.nerf.get("sample_stratified", True))
    setbg = bool(opt.nerf.get("setbg_opaque", False))
    bgcolor = float(opt.data.get("bgcolor", 1) or 1)
    depth_param = opt.nerf.depth.get("param", "metric")
    fine_sampling = bool(opt.nerf.get("fine_sampling", False))
    n_fine = int(opt.nerf.get("sample_intvs_fine") or 0)

    def loss_fn(se3_test, params, pose, image, intr, intr_inv, near_far,
                rng):
        refine = lie.se3_to_SE3(se3_test)
        composed = pose_ops.compose([refine, pose[None]])
        r0, r1, r2 = jax.random.split(rng, 3)
        ray_idx = jax.random.permutation(r0, H * W)[:n_rays]
        centers, dirs = get_center_and_ray(H, W, composed, intr_inv[None],
                                           ray_idx=ray_idx)
        if ndc:
            centers, dirs = convert_ndc(centers, dirs, intr[None])
        c = centers.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        depth = nerf_mlp.sample_depth(r1, c.shape[0], n_samples, near_far,
                                      stratified, depth_param)
        pts = c[:, None, :] + d[:, None, :] * depth[..., None]
        ray_unit = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ray_unit_s = jnp.broadcast_to(ray_unit[:, None, :], pts.shape)
        rgb_s, dens_s = nerf_mlp.apply_nerf_mlp(
            params.mlp, mlp_cfg, pts, ray_unit_s, progress=1.0)
        rgb, _, _, prob = nerf_mlp.composite(
            mlp_cfg, d, rgb_s, dens_s, depth, setbg, bgcolor)
        if fine_sampling:
            prob = jax.lax.stop_gradient(prob)
            depth_fine = nerf_mlp.sample_depth_from_pdf(
                None, prob, near_far, n_fine)
            depth_b = jnp.broadcast_to(depth, prob.shape)
            depth_all = jnp.sort(
                jnp.concatenate([depth_b, depth_fine], axis=-1), axis=-1)
            pts_f = c[:, None, :] + d[:, None, :] * depth_all[..., None]
            ray_unit_f = jnp.broadcast_to(ray_unit[:, None, :], pts_f.shape)
            rgb_fs, dens_fs = nerf_mlp.apply_nerf_mlp(
                params.mlp_fine, mlp_cfg, pts_f, ray_unit_f, progress=1.0)
            rgb, _, _, _ = nerf_mlp.composite(
                mlp_cfg, d, rgb_fs, dens_fs, depth_all, setbg, bgcolor)
        target = jnp.take(image, ray_idx, axis=0)
        return mse(rgb, target)

    @jax.jit
    def steps(params, pose, image, intr, intr_inv, near_far, rng):
        se3_test = jnp.zeros((1, 6))
        opt_state = adam_init(se3_test)

        def body(carry, k):
            se3_test, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(
                se3_test, params, pose, image, intr, intr_inv, near_far, k)
            new_se3, opt_state = adam_update(g, opt_state, se3_test,
                                             jnp.float32(lr), b2=0.999)
            return (new_se3, opt_state), loss

        (se3_test, _), losses = jax.lax.scan(
            body, (se3_test, opt_state), jax.random.split(rng, test_iter))
        refine = lie.se3_to_SE3(se3_test)
        return pose_ops.compose([refine, pose[None]])[0], losses[-1]

    def optimize(params, pose, image, intr, intr_inv, near_far, rng):
        refined, loss = steps(params, pose, image, intr, intr_inv,
                              jnp.asarray(near_far, jnp.float32), rng)
        return refined, float(loss)

    return optimize
