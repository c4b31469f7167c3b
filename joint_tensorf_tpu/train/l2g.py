"""L2G-BAT: local-to-global joint pose + TensoRF training step.

The reference's experimental ``l2g_bat`` engine (l2g_bat.py) predicts a
*per-ray* local se(3) warp from (camera-plane pixel coordinates, per-view
embedding) with a small MLP, renders through those per-ray poses, and
re-fits one global SE(3) per view each step by rigid registration of the
warped ray points — plus an error-map importance ray sampler.  In the
reference the module is dead code (a literal syntax error at
l2g_bat.py:200 makes it unimportable); this is a working TPU-native
implementation of the same capability:

* ``localWarp`` MLP (l2g_bat.py:236-256) -> ``warp_mlp_apply`` (pure pytree
  MLP with skip connections);
* per-ray pose composition local_refine @ base (l2g_bat.py:102-112)
  -> ``local_pose_and_rays`` (batched over [B, R] poses, one einsum);
* global alignment via roma.rigid_points_registration (l2g_bat.py:196-202)
  -> ``geometry.align.rigid_points_registration`` (batched Kabsch on
  device) feeding both the per-view optimised-pose table and the
  global-alignment MSE loss;
* error-map importance sampling (1/3 importance + 2/3 uniform, EMA update
  with the per-ray render error, l2g_bat.py:146-158, :185-187)
  -> Gumbel top-k without replacement inside the jitted step.

The reference ships no YAML for this model; ``configs/l2g_bat_blender_VM.yaml``
supplies defaults (embedding_dim, layers_warp, skip_warp, error_map_size).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..geometry import lie, poses as pose_ops
from ..geometry.align import rigid_points_registration
from ..geometry.ndc import convert_ndc
from ..geometry.rays import camera_grid_3d, pixel_grid
from ..models import vm as vm_lib
from ..render.renderer import render_rays
from . import losses
from .optim import AdamState, adam_init, adam_update, field_lr_tree, masked_update
from .step import StepConfig, StepScalars


@dataclasses.dataclass(frozen=True)
class L2GConfig:
    """Static L2G architecture config (jit cache key)."""
    embedding_dim: int = 32
    layers_warp: tuple = (64, 64, 6)
    skip_warp: tuple = ()
    error_map_size: int = 0           # 0 = plain random sampling
    global_alignment_weight: float = 1.0
    error_map_ema: float = 0.9        # NEW-sample weight: map = 0.1*old + 0.9*new (l2g_bat.py:186)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class L2GParams:
    field: vm_lib.VMState
    warp_embedding: Any               # [n_views, E]
    warp_mlp: Any                     # list of (W, b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class L2GState:
    params: L2GParams
    scene_opt: AdamState
    pose_opt: AdamState               # over (warp_embedding, warp_mlp)
    pose_grad_accum: Any
    optimised_poses: Any              # [n_views, 3, 4] world->cam (registered)
    error_map: Any                    # [n_views, S*S] or [n_views, 0]


def init_warp_mlp(key, cfg: L2GConfig):
    """localWarp MLP params (l2g_bat.py:241-249): input 2 + E, output 6."""
    in_dim = 2 + cfg.embedding_dim
    layers = []
    k_in = in_dim
    for li, k_out in enumerate(cfg.layers_warp):
        if li in cfg.skip_warp:
            k_in += in_dim
        key, sub = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(k_in)
        W = jax.random.uniform(sub, (k_in, k_out), minval=-scale, maxval=scale)
        key, sub = jax.random.split(key)
        b = jax.random.uniform(sub, (k_out,), minval=-scale, maxval=scale)
        layers.append((W, b))
        k_in = k_out
    return layers


def warp_mlp_apply(cfg: L2GConfig, layers, uvf):
    """uvf: [..., 2+E] -> per-ray se(3) [..., 6] (l2g_bat.py:251-256)."""
    feat = uvf
    n = len(layers)
    for li, (W, b) in enumerate(layers):
        if li in cfg.skip_warp:
            feat = jnp.concatenate([feat, uvf], axis=-1)
        feat = feat @ W + b
        if li != n - 1:
            feat = jax.nn.relu(feat)
    return feat


def init_l2g_state(key, vm_cfg: vm_lib.VMConfig, l2g_cfg: L2GConfig,
                   resolution, aabb, n_views: int, pose_init,
                   init_scale=0.1, init_bias=0.0) -> L2GState:
    """pose_init: [n_views,3,4] — GT(+noise) for blender, identity otherwise
    (l2g_bat.py:33-40)."""
    kf, ke, km = jax.random.split(key, 3)
    field = vm_lib.init_vm(kf, vm_cfg, resolution, aabb,
                           init_scale=init_scale, init_bias=init_bias)
    emb = jax.random.normal(ke, (n_views, l2g_cfg.embedding_dim)) * 1e-4
    mlp = init_warp_mlp(km, l2g_cfg)
    # zero the last layer so training starts at the base poses
    W, b = mlp[-1]
    mlp[-1] = (jnp.zeros_like(W), jnp.zeros_like(b))
    params = L2GParams(field=field, warp_embedding=emb, warp_mlp=mlp)
    ems = l2g_cfg.error_map_size
    return L2GState(
        params=params,
        scene_opt=adam_init(field),
        pose_opt=adam_init((emb, mlp)),
        pose_grad_accum=jax.tree_util.tree_map(jnp.zeros_like, (emb, mlp)),
        optimised_poses=jnp.asarray(pose_init),
        error_map=jnp.ones((n_views, ems * ems)),
    )


def sample_error_map_rays(error_map, key, H: int, W: int, ems: int,
                          n_rays: int):
    """Importance ray sampling from the per-view error map.

    1/3 importance + 2/3 uniform weighting (l2g_bat.py:146: w = e + 2*mean(e)),
    without replacement via Gumbel top-k; coarse cells are jittered to full
    resolution (l2g_bat.py:148-151).  Returns (ray_idx [B,R], coarse_idx
    [B,R]).
    """
    B = error_map.shape[0]
    w = error_map + 2.0 * error_map.mean(axis=-1, keepdims=True)
    kg, kj = jax.random.split(key)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(kg, w.shape, minval=1e-10, maxval=1.0)))
    _, coarse = jax.lax.top_k(jnp.log(w) + gumbel, n_rays)      # [B, R]
    cx = coarse // ems
    cy = coarse % ems
    sx, sy = H / ems, W / ems
    u = jax.random.uniform(kj, (2, B, n_rays))
    ix = jnp.clip(((cx + u[0]) * sx).astype(jnp.int32), 0, H - 1)
    iy = jnp.clip(((cy + u[1]) * sy).astype(jnp.int32), 0, W - 1)
    return ix * W + iy, coarse


def local_pose_and_rays(l2g_cfg: L2GConfig, params: L2GParams, base_pose,
                        view_sel, intr_inv, ray_idx, H: int, W: int):
    """Per-ray local poses and the rays through them (l2g_bat.py:207-229).

    base_pose: [B,3,4]; ray_idx: [B,R] (per-view) or [R] (shared).
    Returns (centers [B,R,3], dirs [B,R,3], cam_grid [B,R,3],
    grid_world [B,R,3], local_se3 [B,R,6]).
    """
    B = base_pose.shape[0]
    if ray_idx.ndim == 1:
        cam_grid = camera_grid_3d(H, W, intr_inv, ray_idx=ray_idx)  # [B,R,3]
    else:
        grid = pixel_grid(H, W, dtype=intr_inv.dtype)               # [HW,2]
        g = jnp.take(grid, ray_idx.reshape(-1), axis=0).reshape(
            B, ray_idx.shape[1], 2)
        g_h = jnp.concatenate([g, jnp.ones_like(g[..., :1])], axis=-1)
        cam_grid = jax.lax.stop_gradient(
            jnp.einsum("brj,bij->bri", g_h, intr_inv))
    R_ = cam_grid.shape[1]
    emb = params.warp_embedding[view_sel][:, None, :]               # [B,1,E]
    uvf = jnp.concatenate(
        [cam_grid[..., :2], jnp.broadcast_to(emb, (B, R_, emb.shape[-1]))],
        axis=-1)
    local_se3 = warp_mlp_apply(l2g_cfg, params.warp_mlp, uvf)       # [B,R,6]
    local_refine = lie.se3_to_SE3(local_se3)                        # [B,R,3,4]
    local = pose_ops.compose_pair(local_refine, base_pose[:, None])
    # cam2world on per-ray poses
    grid_world = pose_ops.cam2world(cam_grid[..., None, :], local)[..., 0, :]
    centers = pose_ops.cam2world(
        jnp.zeros_like(cam_grid[..., None, :]), local)[..., 0, :]
    dirs = grid_world - centers
    return centers, dirs, cam_grid, grid_world, local_se3


def make_l2g_train_step(cfg: StepConfig, l2g_cfg: L2GConfig,
                        vm_cfg: vm_lib.VMConfig, head, jit: bool = True,
                        ray_sharding=None):
    """Jitted L2G training step; same call contract as step.make_train_step
    (state, pose_base, intr, intr_inv, images, edge_masks, view_sel,
    ray_idx, rng, scalars, alpha_mask) -> (state, metrics).

    When error_map_size > 0 the passed ray_idx is ignored and per-view
    indices are drawn from the error map inside the step.
    """
    rcfg = cfg.render_config(is_train=True)
    ems = l2g_cfg.error_map_size

    def _pin_rays(x):
        # see make_train_step's ray_sharding note (anti-replication pin)
        if ray_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, ray_sharding)

    def loss_fn(params: L2GParams, pose_base, intr, intr_inv, images,
                edge_masks, view_sel, ray_idx, rng, s: StepScalars,
                alpha_mask):
        ii = intr_inv[view_sel]
        centers, dirs, cam_grid, grid_world, _ = local_pose_and_rays(
            l2g_cfg, params, pose_base[view_sel], view_sel, ii, ray_idx,
            cfg.H, cfg.W)
        cam_centers = jnp.zeros_like(cam_grid)
        world_centers = centers
        if cfg.ndc:
            centers, dirs = convert_ndc(centers, dirs, intr[view_sel],
                                        near=cfg.ndc_near_plane)
        B, R_ = centers.shape[:2]
        rgb, depth, opacity = render_rays(
            params.field, vm_cfg, rcfg, head,
            _pin_rays(centers.reshape(-1, 3)),
            _pin_rays(dirs.reshape(-1, 3)), rng,
            s.near_far, alpha_mask=alpha_mask, blur=cfg.blur,
            c2f_density=s.c2f_density, c2f_color=s.c2f_color,
            view_pe_progress=s.view_pe_progress,
            fea_pe_progress=s.fea_pe_progress)
        rgb = rgb.reshape(B, R_, 3)
        if ray_idx.ndim == 1:
            target = jnp.take(images[view_sel], ray_idx, axis=1)
            mask = jnp.take(edge_masks[view_sel], ray_idx, axis=1)
        else:
            target = jnp.take_along_axis(images[view_sel],
                                         ray_idx[..., None], axis=1)
            mask = jnp.take_along_axis(edge_masks[view_sel], ray_idx, axis=1)

        render_loss = losses.edge_weighted_render_loss(
            rgb, target, mask, s.edge_factor, s.non_edge_factor, s.use_edge)
        plain_mse = losses.mse(rgb, target)
        per_ray_err = jnp.mean((rgb - target) ** 2, axis=-1)        # [B,R]

        # ---- global alignment (l2g_bat.py:196-202)
        source = jnp.concatenate([cam_grid, cam_centers], axis=1)   # [B,2R,3]
        target_pts = jnp.concatenate([grid_world, world_centers], axis=1)
        R_g, t_g = rigid_points_registration(target_pts, source)
        svd_poses = pose_ops.make(R=R_g, t=t_g)                     # [B,3,4]
        ga_loss = losses.mse(target_pts,
                             pose_ops.cam2world(source, svd_poses))

        loss = render_loss
        loss = loss + l2g_cfg.global_alignment_weight * ga_loss
        loss = loss + s.l1_weight * vm_lib.density_L1(params.field)
        loss = loss + s.tv_density_weight * vm_lib.tv_loss_density(params.field)
        loss = loss + s.tv_color_weight * vm_lib.tv_loss_app(params.field)
        metrics = {"loss": loss, "mse": plain_mse,
                   "psnr": losses.psnr_from_mse(plain_mse),
                   "global_alignment": ga_loss}
        aux = (metrics, jax.lax.stop_gradient(svd_poses),
               jax.lax.stop_gradient(per_ray_err))
        return loss, aux

    def step(state: L2GState, pose_base, intr, intr_inv, images, edge_masks,
             view_sel, ray_idx, rng, s: StepScalars, alpha_mask):
        coarse_idx = None
        if ems > 0:
            rng, ks = jax.random.split(rng)
            ray_idx, coarse_idx = sample_error_map_rays(
                state.error_map[view_sel], ks, cfg.H, cfg.W, ems,
                cfg.rays_per_view)
        (loss, (metrics, svd_poses, per_ray_err)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, pose_base, intr, intr_inv, images, edge_masks,
                view_sel, ray_idx, rng, s, alpha_mask))

        lr_tree = field_lr_tree(state.params.field, s.lr_index, s.lr_basis)
        new_field, scene_opt = adam_update(
            grads.field, state.scene_opt, state.params.field, lr_tree,
            b2=cfg.scene_b2)

        # warp (embedding, mlp) ride the pose optimizer (l2g_bat.py:58-60)
        pose_params = (state.params.warp_embedding, state.params.warp_mlp)
        pose_grads = (grads.warp_embedding, grads.warp_mlp)
        accum = jax.tree_util.tree_map(jnp.add, state.pose_grad_accum,
                                       pose_grads)
        new_pose, pose_opt = adam_update(
            accum, state.pose_opt, pose_params, s.lr_pose, b2=cfg.pose_b2)
        new_pose, pose_opt = masked_update(
            s.pose_do_step > 0, new_pose, pose_opt, pose_params,
            state.pose_opt)
        accum = jax.tree_util.tree_map(
            lambda a: jnp.where(s.pose_do_step > 0, jnp.zeros_like(a), a),
            accum)

        optimised = state.optimised_poses.at[view_sel].set(svd_poses)
        error_map = state.error_map
        if ems > 0:
            old = jnp.take_along_axis(state.error_map[view_sel], coarse_idx,
                                      axis=1)
            ema = ((1.0 - l2g_cfg.error_map_ema) * old
                   + l2g_cfg.error_map_ema * per_ray_err)
            updated = jax.vmap(lambda m, i, v: m.at[i].set(v))(
                state.error_map[view_sel], coarse_idx, ema)
            error_map = state.error_map.at[view_sel].set(updated)

        new_state = L2GState(
            params=L2GParams(field=new_field, warp_embedding=new_pose[0],
                             warp_mlp=new_pose[1]),
            scene_opt=scene_opt, pose_opt=pose_opt, pose_grad_accum=accum,
            optimised_poses=optimised, error_map=error_map)
        return new_state, metrics

    return jax.jit(step) if jit else step


def l2g_depth_range(optimised_poses, depth_range):
    """Rescale the scene depth range by the current camera diameter
    (l2g_bat.py:135-142).  Host-side; returns (near, far)."""
    import numpy as np

    pos = np.asarray(pose_ops.invert(jnp.asarray(optimised_poses)))[..., 3]
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1).max()
    dmin, dmax = depth_range
    return (dmin / (dmax + dmin) * d, dmax / (dmax + dmin) * d)
