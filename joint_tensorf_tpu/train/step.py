"""Jitted train / eval step builders.

One fused ``value_and_grad`` over (factor grids, basis, shading MLP, se(3)
pose table) reproduces the reference's joint gradient flow (SURVEY.md §3.5):
pose gradients reach the se3 table through ray generation -> sample
positions -> bilinear coordinate derivatives.  Scene and pose Adam updates
happen inside the same jit; the pose update is where-gated to implement
pose-gradient accumulation (bat.py:103-106).

Everything that changes smoothly per iteration (lrs, c2f sigmas, loss
weights, near/far, PE progress, edge toggle) is a traced scalar in
``StepScalars`` — recompiles happen only at phase boundaries where array
shapes genuinely change.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..geometry import lie, poses as pose_ops
from ..geometry.rays import get_center_and_ray
from ..geometry.ndc import convert_ndc
from ..models import vm as vm_lib
from ..models.alpha_mask import AlphaMask
from ..render.renderer import BlurSpec, RenderConfig, render_rays
from . import losses
from .optim import AdamState, adam_init, adam_update, field_lr_tree, masked_update


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Params:
    field: vm_lib.VMState
    se3_refine: Any          # [n_views, 6] (zeros when pose opt is unused)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    scene_opt: AdamState
    pose_opt: AdamState
    pose_grad_accum: Any     # [n_views, 6]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StepScalars:
    """Traced per-iteration scalars (host-computed, deterministic)."""
    lr_index: Any
    lr_basis: Any
    lr_pose: Any
    c2f_density: Any
    c2f_color: Any
    near_far: Any            # [2]
    l1_weight: Any
    tv_density_weight: Any
    tv_color_weight: Any
    use_edge: Any            # 0/1
    edge_factor: Any
    non_edge_factor: Any
    view_pe_progress: Any
    fea_pe_progress: Any
    pose_do_step: Any        # 0/1 — apply accumulated pose gradient this iter
    tv_depth_weight: Any


def default_scalars(n_views: int) -> StepScalars:
    z = jnp.zeros(())
    return StepScalars(
        lr_index=z, lr_basis=z, lr_pose=z, c2f_density=z, c2f_color=z,
        near_far=jnp.array([2.0, 6.0]), l1_weight=z, tv_density_weight=z,
        tv_color_weight=z, use_edge=z, edge_factor=z + 1, non_edge_factor=z + 1,
        view_pe_progress=z + 1, fea_pe_progress=z + 1, pose_do_step=z + 1,
        tv_depth_weight=z,
    )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static step configuration (jit cache key)."""
    H: int
    W: int
    n_views: int
    rays_per_view: int
    n_samples: int
    pose_opt: bool = False             # learnable se3 refinement
    use_pose_noise: bool = False
    blur: Optional[BlurSpec] = None
    ndc: bool = False
    white_bg: bool = True
    stratified: bool = True
    detach_viewdirs: bool = True
    detach_xyz: bool = True
    use_alpha_mask: bool = False
    mlp_predict_density: bool = False
    ndc_near_plane: float = 1.0
    ndc_simulate_euclid_sample: bool = False
    ndc_simulate_euclid_depth: bool = False
    grid_hw: Optional[tuple[int, int]] = None   # all_view_rand_grid TV-depth
    pose_b2: float = 0.999
    scene_b2: float = 0.99
    # gauge anchor: freeze view 0's se3 refinement (the 3D analogue of the
    # planar pipeline's warp_param[0]=0 pin, planar.py:87-88).  Forward-
    # facing captures have near-flat gauge directions that joint
    # optimization slides along (docs/CONVERGENCE.md NDC diagnosis);
    # anchoring one view removes the SE(3) part of that family.
    pin_first_pose: bool = False
    compact_k: Optional[int] = None             # alpha-mask sample compaction
    densify_density: bool = False               # dense-grid density expansion
    densify_impl: str = "packed8"               # "packed8" | "lane" layout
    densify_dtype: str = "float32"              # grid-row gather dtype
    app_k: Optional[int] = None                 # two-stage appearance top-K2
    mask_stride: int = 4                        # alpha-probe stride (renderer)
    mask_with_blur: bool = False                # dilated-mask culling under blur

    def render_config(self, is_train: bool) -> RenderConfig:
        return RenderConfig(
            n_samples=self.n_samples, white_bg=self.white_bg,
            is_train=is_train, stratified=self.stratified, ndc=self.ndc,
            ndc_near_plane=self.ndc_near_plane,
            ndc_simulate_euclid_sample=self.ndc_simulate_euclid_sample,
            ndc_simulate_euclid_depth=self.ndc_simulate_euclid_depth,
            detach_viewdirs=self.detach_viewdirs, detach_xyz=self.detach_xyz,
            stop_coord_grad=not self.pose_opt,
            use_alpha_mask=self.use_alpha_mask,
            mlp_predict_density=self.mlp_predict_density,
            compact_k=self.compact_k,
            densify_density=self.densify_density,
            densify_impl=self.densify_impl,
            densify_dtype=self.densify_dtype,
            app_k=self.app_k,
            mask_stride=self.mask_stride,
            mask_with_blur=self.mask_with_blur,
            # compaction already bounds backward residuals; skip the
            # recompute overhead there.  Feature remat is obsolete with the
            # fused-product custom VJP (tiny residuals) — keep it off.
            remat_shading=self.compact_k is None,
            remat_features=False,
        )


def compose_train_pose(params: Params, pose_base, view_sel, pose_opt: bool):
    """pose = GT∘noise∘refine applied to selected views (bat.py:341-353).

    pose_base is the precomputed GT∘noise (constant during training).
    """
    base = pose_base[view_sel]
    if not pose_opt:
        return base
    refine = lie.se3_to_SE3(params.se3_refine[view_sel])
    return pose_ops.compose([refine, base])


def make_train_step(cfg: StepConfig, vm_cfg: vm_lib.VMConfig, head,
                    jit: bool = True, ray_sharding=None, vg_transform=None):
    """Build the jitted training step.

    step(state, pose_base [V,3,4], intr [V,3,3], intr_inv, images [V,HW,3],
         edge_masks [V,HW], view_sel [Vs], ray_idx [R], rng, scalars,
         alpha_mask) -> (state, metrics)

    ``ray_sharding`` (a NamedSharding over the mesh's rays axis, passed by
    sharded callers): pins the flattened per-ray tensors P("rays") INSIDE
    the step.  With only in/out shardings, GSPMD is free to all-gather the
    tiny ray inputs and replicate the whole render+VJP — which it measurably
    does at dry-run shapes (scripts/psum_volume.py round 5: zero field-grad
    all-reduce bytes, two ray all-gathers), silently discarding the
    data-parallel design.  The constraint forces the partitioner to keep
    ray-proportional work sharded and to psum the replicated-param
    gradients, at every shape (SURVEY §5.8 layout).

    ``vg_transform`` (sharded callers): wraps the value_and_grad callable —
    parallel.sharding.rays_shardmap_vg wraps it in a shard_map over the
    mesh's rays axis with an explicit grad psum, because even WITH the
    constraint above GSPMD may replicate the gather/scatter-heavy backward
    (measured: scripts/psum_volume.py).  Stratified jitter is drawn
    OUTSIDE the wrapped region (identical bits to the unsharded in-render
    draw — verified element-count-invariant) so sharded == unsharded holds.
    """
    rcfg = cfg.render_config(is_train=True)
    if vg_transform is not None:
        # inside shard_map the mesh axes are manual — the constraint is
        # both illegal and redundant there (placement is explicit)
        ray_sharding = None

    def _pin_rays(x):
        if ray_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, ray_sharding)

    def loss_fn(params: Params, pose_base, intr, intr_inv, images, edge_masks,
                view_sel, ray_idx, jitter, rng, s: StepScalars, alpha_mask):
        pose = compose_train_pose(params, pose_base, view_sel, cfg.pose_opt)
        centers, dirs = get_center_and_ray(cfg.H, cfg.W, pose,
                                           intr_inv[view_sel], ray_idx=ray_idx)
        if cfg.ndc:
            centers, dirs = convert_ndc(centers, dirs, intr[view_sel],
                                        near=cfg.ndc_near_plane)
        B = centers.shape[0]
        R = centers.shape[1]
        rgb, depth, opacity = render_rays(
            params.field, vm_cfg, rcfg, head,
            _pin_rays(centers.reshape(-1, 3)), _pin_rays(dirs.reshape(-1, 3)),
            rng,
            s.near_far, alpha_mask=alpha_mask, blur=cfg.blur,
            c2f_density=s.c2f_density, c2f_color=s.c2f_color,
            view_pe_progress=s.view_pe_progress,
            fea_pe_progress=s.fea_pe_progress,
            ray_jitter=(None if jitter is None
                        else jitter.reshape(-1, jitter.shape[-1])),
        )
        rgb = rgb.reshape(B, R, 3)
        # take the (small) ray subset FIRST: images[view_sel] as the outer
        # index materializes a full [V, H*W, 3] gather copy per step
        # (~190 MB; round-3 profile copy.1903) even when view_sel is the
        # identity.  ray_idx-first makes the big gather [V, R, 3].
        target = jnp.take(images, ray_idx, axis=1)[view_sel]       # [B,R,3]
        mask = jnp.take(edge_masks, ray_idx, axis=1)[view_sel]     # [B,R]

        render_loss = losses.edge_weighted_render_loss(
            rgb, target, mask, s.edge_factor, s.non_edge_factor, s.use_edge)
        plain_mse = losses.mse(rgb, target)

        loss = render_loss
        loss = loss + s.l1_weight * vm_lib.density_L1(params.field)
        loss = loss + s.tv_density_weight * vm_lib.tv_loss_density(params.field)
        loss = loss + s.tv_color_weight * vm_lib.tv_loss_app(params.field)
        if cfg.grid_hw is not None:
            gh, gw = cfg.grid_hw
            d = depth.reshape(B, R)
            if vg_transform is not None:
                # under the rays shard_map each device holds a contiguous
                # slice of the per-view ray grid; the TV stencil needs the
                # whole grid (neighbor differences cross shard edges).
                # depth is tiny (B x gh*gw), so gather it and compute the
                # term replicated.  No grad compensation is needed: the
                # all_gather transpose is psum_scatter, which already SUMS
                # the identical cotangents from all D devices before
                # slicing, exactly cancelling the outer pmean's 1/D
                # (verified numerically in the round-5 review — a D*x -
                # (D-1)*stop_grad(x) "fix" here makes the grad D x too
                # large).
                d = jax.lax.all_gather(d, "rays", axis=1, tiled=True)
            loss = loss + s.tv_depth_weight * losses.depth_tv_loss(
                d, gh, gw)
        metrics = {"loss": loss, "mse": plain_mse,
                   "psnr": losses.psnr_from_mse(plain_mse)}
        return loss, metrics

    def step(state: TrainState, pose_base, intr, intr_inv, images, edge_masks,
             view_sel, ray_idx, rng, s: StepScalars, alpha_mask):
        vg = jax.value_and_grad(loss_fn, has_aux=True)
        jitter = None
        if vg_transform is not None:
            # pre-draw the stratified jitter with the renderer's exact key
            # split/draw sequence (bit-identical to the unsharded in-render
            # draw), so the shard_map region needs no sharded RNG
            vs = view_sel.shape[0]
            r = ray_idx.shape[-1]
            rng_samp, _ = jax.random.split(rng)
            jshape = (vs, r, cfg.n_samples) if cfg.ndc else (vs, r, 1)
            if cfg.stratified:
                jitter = jax.random.uniform(rng_samp, jshape)
            else:
                jitter = jnp.zeros(jshape)
            vg = vg_transform(vg)
        (loss, metrics), grads = vg(
            state.params, pose_base, intr, intr_inv, images, edge_masks,
            view_sel, ray_idx, jitter, rng, s, alpha_mask)

        # ---- scene update (every step)
        lr_tree = field_lr_tree(state.params.field, s.lr_index, s.lr_basis)
        new_field, scene_opt = adam_update(
            grads.field, state.scene_opt, state.params.field, lr_tree,
            b2=cfg.scene_b2)

        # ---- pose update (accumulated; where-gated cadence)
        if cfg.pose_opt:
            g_se3 = grads.se3_refine
            if cfg.pin_first_pose:
                g_se3 = g_se3.at[0].set(0.0)
            accum = state.pose_grad_accum + g_se3
            new_se3, pose_opt = adam_update(
                accum, state.pose_opt, state.params.se3_refine, s.lr_pose,
                b2=cfg.pose_b2)
            new_se3, pose_opt = masked_update(
                s.pose_do_step > 0, new_se3, pose_opt,
                state.params.se3_refine, state.pose_opt)
            accum = jnp.where(s.pose_do_step > 0, jnp.zeros_like(accum), accum)
        else:
            new_se3, pose_opt, accum = (state.params.se3_refine,
                                        state.pose_opt, state.pose_grad_accum)

        new_state = TrainState(
            params=Params(field=new_field, se3_refine=new_se3),
            scene_opt=scene_opt, pose_opt=pose_opt, pose_grad_accum=accum)
        return new_state, metrics

    return jax.jit(step) if jit else step


def init_train_state(key, vm_cfg: vm_lib.VMConfig, resolution, aabb,
                     n_views: int, init_scale=0.1, init_bias=0.0) -> TrainState:
    field = vm_lib.init_vm(key, vm_cfg, resolution, aabb,
                           init_scale=init_scale, init_bias=init_bias)
    se3 = jnp.zeros((n_views, 6))
    params = Params(field=field, se3_refine=se3)
    return TrainState(
        params=params,
        scene_opt=adam_init(field),
        pose_opt=adam_init(se3),
        pose_grad_accum=jnp.zeros_like(se3),
    )


def rebuild_opt_state(state: TrainState) -> TrainState:
    """Fresh optimizer moments after a shape transition (the reference
    rebuilds torch Adam at upsample, tensorf.py:428-429)."""
    return TrainState(
        params=state.params,
        scene_opt=adam_init(state.params.field),
        pose_opt=state.pose_opt,
        pose_grad_accum=state.pose_grad_accum,
    )


# ----------------------------------------------------------------- rendering
def make_render_fn(cfg: StepConfig, vm_cfg: vm_lib.VMConfig, head,
                   chunk: int = 4096, blur: Optional[BlurSpec] = None,
                   mesh=None, field=None, shard_components: bool = False):
    """Chunked full-image renderer (the reference's render_by_slices,
    nerf.py:728-740).  Returns render(field, pose [B,3,4], intr, intr_inv,
    scalars, alpha_mask, rng) -> (rgb [B,HW,3], depth, opacity).

    With ``mesh`` (and a template ``field`` for its sharding pytree), each
    chunk's rays are sharded over the mesh's rays axis — the eval-path
    analogue of shard_train_step."""
    rcfg = dataclasses.replace(cfg.render_config(is_train=False))

    def render_chunk(field, centers, dirs, s: StepScalars, alpha_mask, rng):
        return render_rays(
            field, vm_cfg, rcfg, head, centers, dirs, rng, s.near_far,
            alpha_mask=alpha_mask, blur=blur,
            c2f_density=s.c2f_density, c2f_color=s.c2f_color,
            view_pe_progress=s.view_pe_progress,
            fea_pe_progress=s.fea_pe_progress)

    if mesh is not None:
        from ..parallel.sharding import shard_render_chunk
        render_chunk = shard_render_chunk(render_chunk, mesh, field,
                                          shard_components)
    else:
        render_chunk = jax.jit(render_chunk)

    def render(field, pose, intr, intr_inv, s, alpha_mask, rng):
        import numpy as np

        B = pose.shape[0]
        centers, dirs = get_center_and_ray(cfg.H, cfg.W, pose, intr_inv)
        if cfg.ndc:
            centers, dirs = convert_ndc(centers, dirs, intr,
                                        near=cfg.ndc_near_plane)
        centers = centers.reshape(-1, 3)
        dirs = dirs.reshape(-1, 3)
        n = centers.shape[0]
        pad = (-n) % chunk
        centers = jnp.pad(centers, ((0, pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
        outs = []
        for i in range(0, n + pad, chunk):
            outs.append(render_chunk(field, centers[i:i + chunk],
                                     dirs[i:i + chunk], s, alpha_mask, rng))
        rgb = jnp.concatenate([o[0] for o in outs])[:n].reshape(B, -1, 3)
        depth = jnp.concatenate([o[1] for o in outs])[:n].reshape(B, -1)
        opacity = jnp.concatenate([o[2] for o in outs])[:n].reshape(B, -1)
        return rgb, depth, opacity

    return render
