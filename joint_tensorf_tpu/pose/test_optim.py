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
