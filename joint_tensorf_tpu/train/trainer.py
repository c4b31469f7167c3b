"""Host-side training orchestrator.

Drives the jitted step through the coarse-to-fine *phases* of a run
(SURVEY.md §7 design move 1): array shapes are static inside a phase and
transitions (voxel upsample, bbox shrink, ray-count switches, alpha-mask
(re)build) rebuild the step function — at most a handful of recompiles per
run.  All schedule randomness (2D/3D blur scale draws, ray permutations,
grid offsets) comes from one seeded numpy generator, so multi-host replicas
of this loop are bitwise identical (SURVEY.md §5.8).

Capability map to the reference engines:
  Model.train / train_iteration   (base.py:82-173, bat.py:96-116) -> Trainer.run
  NeRF.update_schedule            (tensorf.py:399-447)            -> Trainer._update_schedule
  Model.process_GT_images / get_edge_mask (nerf.py:57-149)        -> Trainer._refresh_blur_cache
  pose noise / se3 table          (bat.py:30-47)                  -> Trainer.__init__
"""
from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data.base import SceneData
from ..geometry import lie, poses as pose_ops
from ..models import vm as vm_lib
from ..models.alpha_mask import AlphaMask, update_alpha_mask
from ..ops import blur as blur_ops
from ..ops import kernels as kernel_ops
from ..ops import sobel
from ..render.renderer import BlurSpec
from ..sched import schedules
from . import losses
from .step import (Params, StepConfig, StepScalars, TrainState,
                   init_train_state, make_render_fn, make_train_step,
                   rebuild_opt_state)


def build_vm_config(opt: Options) -> vm_lib.VMConfig:
    arch = opt.arch
    return vm_lib.VMConfig(
        density_n_comp=tuple(int(c) for c in arch.tensorf.density_components),
        app_n_comp=tuple(int(c) for c in arch.tensorf.color_components),
        app_dim=3 if arch.shading == "RGB" else int(arch.shading.app_dim),
        shading_mode=arch.shading.model,
        view_pe=int(arch.shading.view_pe),
        pos_pe=int(arch.shading.pose_pe),
        fea_pe=int(arch.shading.fea_pe),
        hidden=int(arch.shading.mlp_hidden_dim),
        fea2dense=arch.feature_to_density_activation,
        density_shift=float(arch.density_shift),
        distance_scale=float(arch.distance_scale),
        raymarch_weight_thres=float(arch.tensorf.rayMarch_weight_thres),
        step_ratio=float(opt.nerf.step_ratio),
        decomposition="CP" if "CP" in arch.tensorf.model else "VM",
        abs_components=bool(arch.get("abs_components", False)),
        component_wise_feature2density=bool(
            arch.get("component_wise_feature2density", False)),
        plane_feature2density=bool(arch.get("plane_feature2density", False)),
        convolve_plane_only=bool(arch.get("convolve_plane_only", False)),
        convolve_positive_only=bool(arch.get("convolve_positive_only", False)),
        ignore_negative_split=bool(arch.get("ignore_negative_split", False)),
        factor_dtype=str(opt.tpu.get("factor_dtype") or "float32"),
    )


class Trainer:
    """Joint pose + tensorial-field training engine."""

    def __init__(self, opt: Options, train_data: SceneData,
                 val_data: Optional[SceneData] = None):
        self.opt = opt
        self.data = train_data
        self.val_data = val_data
        self.it = 0
        self.max_iter = int(opt.max_iter)
        self.rng_np = np.random.default_rng(int(opt.get("seed", 0)))
        self.key = jax.random.PRNGKey(int(opt.get("seed", 0)))

        # l2g_bat shares the full BAT schedule/pose machinery (l2g_bat.py
        # subclasses bat.Model); its per-ray warp params replace se3_refine
        self.is_bat = opt.model in ("bat", "l2g_bat")
        self.vm_cfg = build_vm_config(opt)
        self.head = self.vm_cfg.shading_head()

        # ---------------- scene geometry / voxel schedule
        ts = opt.train_schedule
        self.bbox = np.asarray(opt.data.scene_bbox, dtype=np.float32).reshape(2, 3)
        self.upsample_iters = list(ts.upsample_iters)
        self.update_alphamask_iters = list(ts.update_alphamask_iters)
        self.n_voxel_list = schedules.voxel_schedule(
            int(ts.n_voxel_init), int(ts.n_voxel_final), len(self.upsample_iters))
        self.n_voxels = int(ts.n_voxel_init)
        self.resolution_scale = list(ts.get("resolution_scale_init", [1.0] * 3))
        self.resolution = schedules.find_resolution(self.bbox, self.n_voxels,
                                                    self.resolution_scale)
        self.n_samples = schedules.find_n_samples(
            self.resolution, float(opt.nerf.step_ratio),
            int(opt.nerf.sample_intvs))
        self.alphamask_resolution = list(self.resolution)

        # ---------------- learning rates / decay
        o = opt.optim
        self.lr_index0 = float(o.lr_index)
        self.lr_basis0 = float(o.lr_basis)
        self.lr_index = self.lr_index0
        self.lr_basis = self.lr_basis0
        decay_iters = int(o.get("lr_decay_iters", -1))
        self.lr_decay_duration = self.max_iter if decay_iters < 0 else decay_iters
        self.lr_decay_target = float(o.get("lr_decay_target_ratio", 0.1))
        self.decay_factor = schedules.lr_decay_factor(
            self.lr_decay_target, self.lr_decay_duration)
        self.lr_upsample_reset = bool(o.get("lr_upsample_reset", True))

        # TV weights decay alongside lr (tensorf.py:441-447)
        lw = opt.loss_weight
        self.tv_density_weight = float(lw.get("TV_density", 0.0) or 0.0)
        self.tv_color_weight = float(lw.get("TV_color", 0.0) or 0.0)

        # ---------------- pose optimization state
        n_views = train_data.n_views
        self.n_views = n_views
        gt_poses = jnp.asarray(train_data.poses)
        self.gt_poses = gt_poses
        if self.is_bat and opt.camera.get("noise"):
            noise_key, self.key = jax.random.split(self.key)
            se3_noise = (jax.random.normal(noise_key, (n_views, 6))
                         * float(opt.camera.noise))
            pose_noise = lie.se3_to_SE3(se3_noise)
            self.pose_noise = pose_noise
            # base = GT∘noise; learned refine composes on top (bat.py:341-353)
            self.pose_base = pose_ops.compose([pose_noise, gt_poses])
        else:
            self.pose_noise = None
            self.pose_base = gt_poses
        if self.is_bat and opt.get("start_with_GT_pose") and \
                opt.data.dataset in ("llff", "t2"):
            init_se3 = lie.SE3_to_se3(gt_poses)
        else:
            init_se3 = None

        # pose lr schedule
        self.lr_pose0 = float(o.get("lr_pose", 0.0) or 0.0)
        sched_pose = o.get("sched_pose")
        self.pose_sched_type = sched_pose.type if sched_pose else None
        if self.pose_sched_type == "ExponentialLR" and self.lr_pose0 > 0:
            self.pose_gamma = (float(o.lr_pose_end) / self.lr_pose0) ** (
                1.0 / self.max_iter)
        elif self.pose_sched_type == "ExponentialLR":
            self.pose_sched_type = None      # lr_pose=0: poses frozen
        self.pose_lambda_schedule = (
            list(sched_pose.lr_pose_schedule)
            if sched_pose and sched_pose.get("lr_pose_schedule") else None)
        self.warmup_pose = o.get("warmup_pose")

        # ---------------- device-side dataset
        V, H, W = n_views, train_data.H, train_data.W
        self.H, self.W = H, W
        imgs = train_data.images.reshape(V, 3, H * W).transpose(0, 2, 1)
        self.images_sharp = jnp.asarray(np.ascontiguousarray(imgs))  # [V,HW,3]
        self.images_chw = jnp.asarray(train_data.images)              # [V,3,H,W]
        self.intr = jnp.asarray(train_data.intr)
        self.intr_inv = jnp.asarray(train_data.intr_inv)
        self.near_far = list(train_data.near_far)

        # ---------------- blur / edge-mask caches (filled lazily)
        self.blur_2d = bool(opt.get("blur_2d", False))
        self.scale_pool_2d = list(opt.get("c2f_alternate_2D_scale_pool",
                                          [0.0, 1.0]))
        self.blurred_images = {0.0: self.images_sharp}
        self.edge_masks = {0.0: jnp.zeros((V, H * W), jnp.float32)}
        self.current_images = self.images_sharp
        self.current_edges = self.edge_masks[0.0]

        # ---------------- alpha mask
        self.alpha_mask: Optional[AlphaMask] = None
        self.alphamask_thresh = float(ts.get("alpha_mask_threshold", 1e-4))
        self.compact_k: Optional[int] = None
        # training-time appearance cap, auto-raised from the measured gate
        # counts at alpha-mask updates (VERDICT round-2 #6: the static
        # tpu.app_k clipped ~25% of rays at converged fields).  None means
        # "use the configured tpu.app_k unchanged".
        self.app_k_dyn: Optional[int] = None

        # plane-gradient scatter implementation (ops/sampling.py module
        # switch): "xla" scatter-add or the "segsum" Pallas kernel
        from ..ops.sampling import set_plane_scatter_impl
        set_plane_scatter_impl(str(opt.tpu.get("plane_scatter", "xla")))

        # ---------------- field + optimizer
        init_key, self.key = jax.random.split(self.key)
        self.state = init_train_state(
            init_key, self.vm_cfg, self.resolution, self.bbox, n_views,
            init_scale=float(opt.arch.tensorf.get("volume_init_scale", 0.1)),
            init_bias=float(opt.arch.tensorf.get("volume_init_bias", 0.0)))
        if init_se3 is not None:
            self.state.params.se3_refine = jnp.asarray(init_se3)

        # ---------------- device mesh (multi-chip training, SURVEY §5.8)
        # opt.tpu.mesh_shape e.g. [8] or [4, 2] with mesh_axes [rays, comp]:
        # ray batches shard over "rays" (data parallel; pose/factor grads
        # psum-reduce), factor components over "comp" (tensor parallel).
        self.mesh = None
        self.shard_components = False
        mesh_shape = opt.tpu.get("mesh_shape")
        if mesh_shape:
            from ..parallel.mesh import make_mesh

            axes = tuple(opt.tpu.get("mesh_axes") or ["rays"])
            shape = tuple(int(x) for x in mesh_shape)
            axes = axes[:len(shape)]
            self.mesh = make_mesh(shape, axes)
            self.shard_components = dict(zip(axes, shape)).get("comp", 1) > 1

        self._step_fn = None
        self._step_cfg = None
        self.metrics_history: list[dict] = []
        self._shard_state()
        # bbox-gated compaction budget for blur-active / pre-mask phases
        # (round 4): out-of-bbox sample slots are dead weight the mask
        # cannot cull while blur disables it (batBase.py:77), but the
        # IN-BBOX gate is exact under blur — compact to the measured
        # worst-case in-bbox count instead.
        self.compact_k_bbox: Optional[int] = None
        # dilated-mask compaction budget for blur-active phases (round 4,
        # VERDICT round-3 #2): built lazily by _refresh_blur_mask once the
        # resolution is final and blur is still active
        self.alpha_mask_blur: Optional[AlphaMask] = None
        self.compact_k_blur: Optional[int] = None
        self._blur_mask_built_at: Optional[int] = None
        self._refresh_bbox_k()

    def _refresh_bbox_k(self):
        # any phase transition (upsample/shrink/alphamask rebuild) changes
        # shapes and the field — the blur mask must be rebuilt from scratch
        self.alpha_mask_blur = None
        self.compact_k_blur = None
        self._blur_mask_built_at = None
        if not bool(self.opt.tpu.get("bbox_compact", True)):
            self.compact_k_bbox = None
            return
        try:
            # pad 1.0: the in-bbox count is pure camera/bbox geometry
            # (pose refinements move rays by fractions of a sample), and
            # the round-up-to-128 leaves up to 127 slots of headroom; the
            # mask probe's 1.25 pad would push K past S at the Blender
            # geometry (measured max 880/1000 in-bbox, mean 541)
            self.compact_k_bbox = self._probe_compact_k(bbox_only=True,
                                                        pad=1.0)
        except Exception as e:  # perf feature: never block training
            print(f"[bbox_compact] probe failed ({type(e).__name__}: {e}); "
                  f"disabled for this phase")
            self.compact_k_bbox = None

    def _blur_sigma_max(self, lookahead_iters: int) -> float:
        """Upper bound on the density-blur world sigma over the next
        ``lookahead_iters`` iterations (the window until the next blur-mask
        refresh).  The random scale pool only attenuates the schedule value
        (pools are <= 1 by protocol, but max(pool) is used, not assumed).
        The schedule is piecewise-linear over evenly spaced knots, so its
        exact max over [p0, p1] is attained at an endpoint or at a knot
        inside the interval — evaluate exactly those points (ADVICE
        round-4: uniform sampling could miss an interior peak, undersizing
        the dilation radius)."""
        opt = self.opt
        p0 = self.progress
        p1 = min(1.0, (self.it + lookahead_iters) / self.max_iter)
        sched = list(opt.c2f_schedule_density)
        knots = np.linspace(0.0, 1.0, len(sched))
        pts = [p0, p1] + [float(k) for k in knots if p0 < k < p1]
        d = max(float(schedules.interp_schedule(p, sched)) for p in pts)
        if opt.get("c2f_random_density_blur"):
            pool = (self.scale_pool_2d if opt.get("sync_2d_3d_scales")
                    else list(opt.c2f_random_density_scale_pool))
            d *= max(float(s) for s in pool)
        return d

    def _blur_dilate_radius(self, lookahead_iters: int,
                            mask_res=None) -> int:
        """Mask-cell dilation radius covering the blur kernel's support.

        The kernel is built in factor-grid index units with
        grid_scale = mean(res / aabb_size) (renderer.py blur-mats block,
        batBase.py:13-25 semantics).  When the mask is built at a capped
        (coarser) resolution, sigma and the kernel half-width are converted
        into MASK cells; rounding up keeps the dilation conservative.
        Gaussian support is truncated at 5*sigma (tail mass < 1e-6, far
        below the alpha threshold this gate shares with the reference's
        own culling) and at the kernel's static half-width.
        """
        opt = self.opt
        smax = self._blur_sigma_max(lookahead_iters)
        res = np.asarray(self.resolution, np.float64)
        aabb = np.asarray(self.state.params.field.aabb, np.float64)
        size = aabb[1] - aabb[0]
        grid_scale = float(np.mean(res / size))
        mres = np.asarray(self.resolution if mask_res is None else mask_res,
                          np.float64)
        mask_scale = float(np.mean(mres / size))
        sig_mask = smax * mask_scale
        if str(opt.get("c2f_mode", "uniform-gaussian")) == "uniform-average":
            r = int(np.ceil(sig_mask)) + 1
        else:
            r = int(np.ceil(5.0 * sig_mask)) + 1
        halfw_mask = int(np.ceil((int(opt.c2f_kernel_size) // 2)
                                 * mask_scale / grid_scale))
        return max(1, min(halfw_mask, r))

    def _refresh_blur_mask(self):
        """Dilated-mask culling for BLUR-ACTIVE phases (VERDICT round-3 #2).

        The reference disables alpha-mask culling while the factor blur is
        active (batBase.py:76-82) because the sharp mask is wrong for the
        blurred field.  But the paper's own separability identity makes a
        conservative mask cheap: blurring the factors IS an exact 3D
        convolution of the density field with a normalized positive
        separable kernel, so blurred_alpha(x) <= max over the kernel
        support of sharp_alpha — a sharp mask max-pool-dilated by the
        support radius can only over-include (models/alpha_mask.dilate_mask).
        Same approximation class as the reference's own culling threshold.

        Built lazily once the resolution is final (at growing resolutions
        the dilation radius covers most of the coarse grid) and refreshed
        every ``tpu.blur_mask_refresh`` iterations so new density appearing
        near the support boundary is re-covered and the shrinking sigma
        tightens the radius.  Flag: ``tpu.blur_mask_compact``.
        """
        opt = self.opt
        if not bool(opt.tpu.get("blur_mask_compact", True)):
            return
        if opt.camera.get("ndc", False):
            return
        res = self.resolution
        cap = int(opt.tpu.get("mask_cap_voxels", 256 ** 3))
        capped = res[0] * res[1] * res[2] >= cap
        if capped and not bool(opt.tpu.get("mask_res_cap", True)):
            return  # same guard as the scheduled mask build
        if self.upsample_iters and self.it < self.upsample_iters[-1]:
            return
        refresh = int(opt.tpu.get("blur_mask_refresh", 1000))
        if self._blur_mask_built_at is not None and \
                self.it - self._blur_mask_built_at < refresh:
            return
        try:
            from ..models.alpha_mask import capped_mask_res, dilate_mask

            mask_res = capped_mask_res(res, cap) if capped else list(res)
            radius = self._blur_dilate_radius(refresh, mask_res=mask_res)
            field = self.state.params.field
            step = schedules.step_size(np.asarray(field.aabb), res,
                                       float(self.opt.nerf.step_ratio))
            mask, _ = update_alpha_mask(field, self.vm_cfg, mask_res, step,
                                        self.alphamask_thresh)
            mask = dilate_mask(mask, radius)
            k = self._probe_compact_k(mask=mask)
            self._blur_mask_built_at = self.it
            if k != self.compact_k_blur:
                self._step_cfg = None  # K changed: rebuild the blur step
            if k is None:
                # dilated mask leaves (almost) every sample alive — fall
                # back to the bbox-gated budget for this window
                self.alpha_mask_blur = None
                self.compact_k_blur = None
                return
            self.alpha_mask_blur = mask
            self.compact_k_blur = k
            print(f"[blur_mask] it {self.it}: dilation r={radius} cells -> "
                  f"compact_k_blur={k} of S={self.n_samples} "
                  f"(bbox budget {self.compact_k_bbox})")
        except Exception as e:  # perf feature: never block training
            print(f"[blur_mask] refresh failed ({type(e).__name__}: {e}); "
                  f"disabled for this window")
            if self.compact_k_blur is not None:
                self._step_cfg = None
            self.alpha_mask_blur = None
            self.compact_k_blur = None
            self._blur_mask_built_at = self.it

    def _shard_state(self):
        """(Re-)place the train state onto the mesh with its shardings —
        called at init and after every phase transition that rebuilds
        state arrays (upsample / shrink / alphamask)."""
        if self.mesh is not None:
            from ..parallel.sharding import shard_state

            self.state = shard_state(self.mesh, self.state,
                                     self.shard_components)

    # ------------------------------------------------------------- schedules
    @property
    def progress(self) -> float:
        return self.it / self.max_iter

    def _n_rays(self) -> int:
        ts = self.opt.train_schedule
        if ts.get("change_n_rays_after_n_iters") is not None:
            if self.it < ts.change_n_rays_after_n_iters:
                return int(ts.n_rays_init)
            return int(ts.n_rays_rest)
        return int(self.opt.nerf.n_rays)

    def _pose_accum(self) -> int:
        ts = self.opt.train_schedule
        if ts.get("change_AccumPoseGrad_after_n_iters") is not None:
            if self.it < ts.change_AccumPoseGrad_after_n_iters:
                return int(ts.n_AccumPoseGrad_init)
            return int(ts.n_AccumPoseGrad_rest)
        return int(self.opt.optim.get("pose_grad_accum_iter", 1))

    def _strategy(self) -> str:
        ts = self.opt.train_schedule
        strat = self.opt.nerf.ray_sampling_strategy
        if ts.get("all_view_sample_after_n_iters") is not None and \
                self.it >= ts.all_view_sample_after_n_iters:
            strat = "all_view_rand_rays"
        if ts.get("single_view_sample_after_n_iters") is not None and \
                self.it >= ts.single_view_sample_after_n_iters:
            strat = "single_view_rand_rays"
        return strat

    def _blur_spec(self, c2f_d: float, c2f_c: float) -> Optional[BlurSpec]:
        opt = self.opt
        if not self.is_bat or opt.get("c2f_mode", "None") in (None, "None"):
            return None
        # kernel-drop epsilon (tensorf.py:208-220)
        if max(c2f_d, c2f_c) < 1e-3:
            return None
        return BlurSpec(mode=opt.c2f_mode, kernel_size=int(opt.c2f_kernel_size))

    def _c2f_params(self):
        """(c2f_density, c2f_color, scale_2d) for this iteration."""
        opt = self.opt
        if not self.is_bat or opt.get("c2f_mode", "None") in (None, "None"):
            return 0.0, 0.0, 0.0
        d = schedules.interp_schedule(self.progress, opt.c2f_schedule_density)
        c = schedules.interp_schedule(self.progress, opt.c2f_schedule_color)
        sc2d = 0.0
        if self.blur_2d and opt.get("c2f_alternate_2D_blur"):
            sc2d = float(self.rng_np.choice(self.scale_pool_2d))
        if opt.get("c2f_random_density_blur"):
            if opt.get("sync_2d_3d_scales"):
                sc = sc2d
            else:
                sc = float(self.rng_np.choice(
                    opt.c2f_random_density_scale_pool))
            d = d * sc
        return float(d), float(c), sc2d

    def _near_far(self):
        opt = self.opt
        if self.is_bat and opt.data.dataset != "blender" and \
                opt.get("tensorf_near_plane_schedule") is not None:
            near = schedules.interp_schedule(
                self.progress, opt.tensorf_near_plane_schedule)
            return [float(near), self.near_far[1]]
        return self.near_far

    def _lr_pose(self) -> float:
        if not self.is_bat:
            return 0.0
        if self.pose_sched_type == "ExponentialLR":
            lr = self.lr_pose0 * (self.pose_gamma ** self.it)
        elif self.pose_lambda_schedule is not None:
            lr = schedules.interp_schedule(self.progress,
                                           self.pose_lambda_schedule)
        else:
            lr = self.lr_pose0
        if self.warmup_pose:
            lr *= min(1.0, self.it / float(self.warmup_pose))
        return float(lr)

    def _l1_weight(self) -> float:
        lw = self.opt.loss_weight.get("L1")
        if lw is None:
            return 0.0
        first_update = self.update_alphamask_iters[0] \
            if self.update_alphamask_iters else self.max_iter
        return float(lw.rest if self.it > first_update else lw.init)

    def _edge_scalars(self):
        opt = self.opt
        use = 0.0
        if opt.get("edge_mask_on_render_loss") and self.blur_2d:
            on = (self.it % 2 == 0) if opt.get("alternate_edge_loss") else True
            if on and self.it < int(opt.get("edge_mask_before_iter", 0)):
                use = 1.0
        return (use, float(opt.get("edge_loss_factor", 1.5)),
                float(opt.get("non_edge_loss_factor", 0.5)))

    # ------------------------------------------------------ 2D blur pipeline
    def _refresh_blur_cache(self):
        """Blur the GT images + edge masks for every scale in the pool
        (nerf.py:57-149).  Runs every 500 iterations."""
        opt = self.opt
        V, H, W = self.n_views, self.H, self.W
        sched_val = schedules.interp_schedule(self.progress,
                                              opt.blur_2d_c2f_schedule)
        ksize = int(opt.blur_2d_c2f_kernel_size)
        self.blurred_images = {}
        self.edge_masks = {}
        thresh = float(opt.get("hard_edge_mask_mean_thresh", 1.25))
        for sc in self.scale_pool_2d:
            width = sched_val * sc * (W + H) / 2
            if width < 0.01:
                imgs_chw = self.images_chw
                imgs_flat = self.images_sharp
            else:
                if opt.get("blur_2d_mode", "uniform-gaussian") == "uniform-gaussian":
                    k = kernel_ops.gaussian_kernel(width, ksize)
                else:
                    k = kernel_ops.average_kernel(width, ksize)
                B_h = blur_ops.blur_matrix(k, H)
                B_w = blur_ops.blur_matrix(k, W)
                imgs_chw = blur_ops.blur_images_hw(self.images_chw, B_h, B_w)
                imgs_flat = imgs_chw.reshape(V, 3, H * W).transpose(0, 2, 1)
            self.blurred_images[sc] = imgs_flat
            if opt.get("soft_edge_mask"):
                self.edge_masks[sc] = sobel.soft_edge_mask(imgs_chw).astype(
                    jnp.float32)
            else:
                self.edge_masks[sc] = sobel.hard_edge_mask(
                    imgs_chw, thresh).astype(jnp.float32)

    # -------------------------------------------------------- ray sampling
    def _sample_rays(self, strategy: str, n_rays: int):
        """Host-side ray-index generation (nerf.py:655-673).

        Returns (view_sel [Vs], ray_idx [R], grid_hw or None).
        """
        V, H, W = self.n_views, self.H, self.W
        if strategy == "single_view_rand_rays":
            view = self.it % V
            idx = self.rng_np.permutation(H * W)[:n_rays]
            return np.array([view]), idx.astype(np.int64), None
        if strategy == "all_view_rand_rays":
            idx = self.rng_np.permutation(H * W)[:max(1, n_rays // V)]
            return np.arange(V), idx.astype(np.int64), None
        assert strategy == "all_view_rand_grid", strategy
        rays_per_view = max(1, n_rays // V)
        step = math.ceil((H * W / rays_per_view) ** 0.5)
        off_x = int(self.rng_np.integers(step))
        off_y = int(self.rng_np.integers(step))
        # static grid size: wrap positions modulo the image extent so the
        # sample count per view never depends on the offset draw (the
        # reference's arange(offset, W, step) has offset-dependent length,
        # nerf.py:659-670 — dynamic shapes don't jit)
        nx = math.ceil(W / step)
        ny = math.ceil(H / step)
        xs = (off_x + step * np.arange(nx)) % W
        ys = (off_y + step * np.arange(ny)) % H
        gx, gy = np.meshgrid(xs, ys)
        idx = (gx + gy * W).reshape(-1)
        return np.arange(V), idx.astype(np.int64), (ny, nx)

    def _samples_per_chip(self, rays_per_view: int) -> int:
        """Density-evaluation samples each chip processes per step.

        The densify decision variable of the analytic scaling model
        (BENCH_NOTES "Round-3 scaling model"): the O(XYZ) dense-grid build
        is parameter-work that replicates on every chip, while the
        per-sample gather work divides by the mesh's rays axis — so on a
        pod the break-even moves with rays-per-chip, not phase alone.
        """
        n_ray_chips = 1
        if self.mesh is not None:
            n_ray_chips = dict(self.mesh.shape).get("rays", 1)
        return (rays_per_view * self.n_views * self.n_samples) \
            // max(1, n_ray_chips)

    # ---------------------------------------------------------- step builder
    def _ensure_step(self, strategy: str, n_rays: int, blur_active: bool,
                     grid_hw):
        # blur-active culling: use the dilated mask + its measured budget
        # when available (_refresh_blur_mask), else the exact in-bbox gate
        mask_with_blur = blur_active and self.compact_k_blur is not None
        # two-stage appearance cap: once MASK compaction is active the
        # auto-raised cap (~192 of K=256 on the 20k protocol) approaches
        # the compacted sample count, so the two-stage machinery saves
        # ~nothing while paying separate C=192 gathers/scatters + top_k +
        # selection rows; dense appearance over the compacted K rides the
        # FUSED C=256 rows instead and is exact (zero clipping — the
        # reference's true weight>thres semantics).  tpu.app_k_dense_only
        # drops the cap for mask-compacted phases (kept for dense/early
        # phases, where S=1000 makes dense appearance genuinely expensive).
        mask_compacted = (not blur_active) and self.compact_k is not None
        app_k_val = (self.app_k_dyn if self.app_k_dyn is not None
                     else (int(self.opt.tpu.app_k)
                           if self.opt.tpu.get("app_k") else None))
        if mask_compacted and bool(self.opt.tpu.get("app_k_dense_only",
                                                    False)):
            app_k_val = None
        cfg = StepConfig(
            H=self.H, W=self.W, n_views=self.n_views,
            rays_per_view=n_rays, n_samples=self.n_samples,
            pose_opt=self.is_bat, use_pose_noise=self.pose_noise is not None,
            blur=BlurSpec(mode=self.opt.c2f_mode,
                          kernel_size=int(self.opt.c2f_kernel_size))
            if blur_active else None,
            ndc=bool(self.opt.camera.get("ndc", False)),
            white_bg=bool(self.opt.nerf.get("setbg_opaque", True)),
            stratified=bool(self.opt.nerf.get("sample_stratified", True)),
            detach_viewdirs=bool(self.opt.arch.shading.get("detach_viewdirs", True)),
            detach_xyz=bool(self.opt.arch.shading.get("detach_xyz", True)),
            use_alpha_mask=(self.alpha_mask is not None) or mask_with_blur,
            mask_with_blur=mask_with_blur,
            mlp_predict_density=bool(
                self.opt.arch.shading.get("predict_density", False)),
            ndc_near_plane=float(self.opt.arch.get("ndc_near_plane", 1.0)),
            ndc_simulate_euclid_sample=bool(
                self.opt.get("ndc_simulate_euclid_sample", False)),
            ndc_simulate_euclid_depth=bool(
                self.opt.get("ndc_simulate_euclid_depth", False)),
            grid_hw=grid_hw,
            # mask-gated compaction only without blur (the reference
            # disables mask culling while blur is active, batBase.py:77);
            # blur-active and pre-mask phases compact on the exact IN-BBOX
            # gate instead (compact_k_bbox, round 4)
            compact_k=(self.compact_k_blur if mask_with_blur
                       else (self.compact_k_bbox
                             if (blur_active or self.compact_k is None)
                             else self.compact_k)),
            # dense-grid density pays an O(XYZ) per-step build: a clear win
            # for dense/blurred phases, a loss once compaction shrinks the
            # sample count (measured, scripts/densify_bench.py) — so gate it
            # off when compaction is active.  On pods the build REPLICATES
            # per chip while sample work divides by the rays axis, so the
            # gate also keys on SAMPLES PER CHIP (BENCH_NOTES "Round-3
            # scaling model" consequence 2): densify only when the per-chip
            # sample count amortizes the replicated O(XYZ) build.
            densify_density=(bool(self.opt.tpu.get("densify_density", True))
                             and (blur_active or self.compact_k is None)
                             and self._samples_per_chip(n_rays) >= int(
                                 self.opt.tpu.get(
                                     "densify_min_samples_per_chip", 100000))),
            densify_impl=str(self.opt.tpu.get("densify_impl", "packed8")),
            densify_dtype=str(self.opt.tpu.get("densify_dtype", "float32")),
            app_k=app_k_val,
            mask_stride=int(self.opt.tpu.get("mask_stride", 4)),
            pin_first_pose=bool(
                self.opt.train_schedule.get("pin_first_pose", False)),
        )
        if cfg != self._step_cfg:
            self._step_cfg = cfg
            self._step_fn = self._make_step(cfg)
        return self._step_fn

    def _make_step(self, cfg: StepConfig):
        """Step builder: jit directly on one device, or jit with explicit
        in/out shardings over the mesh (the SPMD partitioner then slices
        the render+VJP over rays / components and inserts the psums)."""
        if self.mesh is None:
            return self._make_raw_step(cfg, jit=True)
        from ..parallel.sharding import shard_train_step

        n_rays_axis = dict(self.mesh.shape).get("rays", 1)
        assert cfg.rays_per_view % n_rays_axis == 0, (
            f"rays per view ({cfg.rays_per_view}) must be divisible by the "
            f"mesh rays axis ({n_rays_axis}) — adjust nerf.n_rays / "
            f"train_schedule.n_rays_*")
        raw = self._make_raw_step(cfg, jit=False)
        return shard_train_step(raw, self.mesh, self.state,
                                self.shard_components)

    def _make_raw_step(self, cfg: StepConfig, jit: bool):
        """Raw step constructor — overridden by L2GTrainer."""
        return make_train_step(cfg, self.vm_cfg, self.head, jit=jit,
                               ray_sharding=self._ray_sharding(),
                               vg_transform=self._vg_transform())

    def _ray_sharding(self):
        """NamedSharding pinning per-ray tensors inside the step (None on a
        single device) — see make_train_step's ray_sharding note."""
        if self.mesh is None or "rays" not in self.mesh.axis_names:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("rays"))

    def _vg_transform(self):
        """shard_map grad transform for the rays-only layout (the
        comp-sharded layout keeps GSPMD propagation; rays_shardmap_vg)."""
        if self.mesh is None or self.shard_components or \
                "rays" not in self.mesh.axis_names:
            return None
        from ..parallel.sharding import rays_shardmap_vg

        return rays_shardmap_vg(self.mesh)

    def _rebuild_opt_state(self, state):
        """Fresh optimizer moments after a shape transition — overridden by
        L2GTrainer (its state pytree has extra leaves)."""
        return rebuild_opt_state(state)

    # ------------------------------------------------------------- main loop
    def train_iteration(self):
        opt = self.opt
        it = self.it

        # 2D supervision blur cache refresh (nerf.py:172-175).  Keyed on
        # the 500-window START rather than `it % 500 == 0` so a trainer
        # resumed mid-window rebuilds the cache immediately (a checkpoint
        # can land on any iteration; the stale-cache KeyError only hid
        # because freq.ckpt values were multiples of 500)
        if self.blur_2d and getattr(self, "_blur_cache_at", None) != \
                (it // 500) * 500:
            self._refresh_blur_cache()
            self._blur_cache_at = (it // 500) * 500

        # pose resets (nerf.py:194-202, tensorf.py:406-411)
        ts = opt.train_schedule
        reset_iters = set()
        if ts.get("reset_pose_on_iter") is not None:
            reset_iters.add(int(ts.reset_pose_on_iter))
        for i in ts.get("reset_pose_on_iters", []) or []:
            reset_iters.add(int(i))
        if ts.get("reset_pose_on_first_upsample") and self.upsample_iters \
                and it == self.upsample_iters[0]:
            reset_iters.add(it)
        if it in reset_iters and hasattr(self.state.params, "se3_refine"):
            self.state.params.se3_refine = jnp.zeros_like(
                self.state.params.se3_refine)

        c2f_d, c2f_c, sc2d = self._c2f_params()
        blur_spec = self._blur_spec(c2f_d, c2f_c)
        if blur_spec is not None:
            self._refresh_blur_mask()

        # pick the blurred GT + edge masks for this iteration's 2D scale
        if self.blur_2d:
            self.current_images = self.blurred_images[sc2d]
            edge_scale = float(opt.get("edge_mask_use_scale", sc2d))
            self.current_edges = self.edge_masks.get(edge_scale,
                                                     self.edge_masks[sc2d])
        use_edge, ef, nef = self._edge_scalars()

        strategy = self._strategy()
        n_rays = self._n_rays()
        view_sel, ray_idx, grid_hw = self._sample_rays(strategy, n_rays)

        accum = self._pose_accum()
        pose_do_step = 1.0 if (it % accum) == 0 else 0.0

        near_far = self._near_far()
        vp = fp = 1.0
        if opt.get("c2f_view_pe_schedule") is not None:
            vp = schedules.interp_schedule(self.progress,
                                           opt.c2f_view_pe_schedule)
        if opt.get("c2f_fea_pe_schedule") is not None:
            fp = schedules.interp_schedule(self.progress,
                                           opt.c2f_fea_pe_schedule)

        scalars = StepScalars(
            lr_index=jnp.float32(self.lr_index),
            lr_basis=jnp.float32(self.lr_basis),
            lr_pose=jnp.float32(self._lr_pose()),
            c2f_density=jnp.float32(c2f_d), c2f_color=jnp.float32(c2f_c),
            near_far=jnp.asarray(near_far, jnp.float32),
            l1_weight=jnp.float32(self._l1_weight()),
            tv_density_weight=jnp.float32(self.tv_density_weight),
            tv_color_weight=jnp.float32(self.tv_color_weight),
            use_edge=jnp.float32(use_edge), edge_factor=jnp.float32(ef),
            non_edge_factor=jnp.float32(nef),
            view_pe_progress=jnp.float32(vp), fea_pe_progress=jnp.float32(fp),
            pose_do_step=jnp.float32(pose_do_step),
            tv_depth_weight=jnp.float32(self._tv_depth_weight(grid_hw)),
        )

        step = self._ensure_step(strategy, len(ray_idx), blur_spec is not None,
                                 grid_hw)
        step_mask = self.alpha_mask
        if blur_spec is not None and self.compact_k_blur is not None:
            step_mask = self.alpha_mask_blur
        self.key, step_key = jax.random.split(self.key)
        self.state, metrics = step(
            self.state, self.pose_base, self.intr, self.intr_inv,
            self.current_images, self.current_edges,
            jnp.asarray(view_sel), jnp.asarray(ray_idx), step_key, scalars,
            step_mask)
        return metrics

    def _tv_depth_weight(self, grid_hw) -> float:
        lw = self.opt.loss_weight
        if grid_hw is None or lw.get("TV_depth") is None:
            return 0.0
        until = lw.get("TV_depth_until_iters")
        if until is not None and self.it > int(until):
            return 0.0
        return float(lw.TV_depth)

    def _update_schedule(self):
        """Post-iteration schedule updates (tensorf.py:399-447)."""
        it = self.it
        if it in self.upsample_iters:
            if it == self.upsample_iters[0]:
                self.resolution_scale = [1.0, 1.0, 1.0]
            self.n_voxels = self.n_voxel_list.pop(0)
            self.resolution = schedules.find_resolution(
                np.asarray(self.state.params.field.aabb), self.n_voxels,
                self.resolution_scale)
            new_field = vm_lib.upsample(self.state.params.field,
                                        self.resolution)
            reset = self.opt.train_schedule.get("reset_on_last_upsample")
            if reset and it == self.upsample_iters[-1] and \
                    (reset.density or reset.appearance or reset.basis):
                rk, self.key = jax.random.split(self.key)
                new_field = vm_lib.init_vm(
                    rk, self.vm_cfg, self.resolution, new_field.aabb,
                    init_scale=float(
                        self.opt.arch.tensorf.get("volume_init_scale", 0.1)),
                    init_density=reset.density, init_app=reset.appearance,
                    init_basis=reset.basis, prev=new_field)
            self.state = dataclasses.replace(
                self.state, params=dataclasses.replace(
                    self.state.params, field=new_field))
            self.state = self._rebuild_opt_state(self.state)
            self._shard_state()
            self.n_samples = schedules.find_n_samples(
                self.resolution, float(self.opt.nerf.step_ratio),
                int(self.opt.nerf.sample_intvs))
            self._refresh_bbox_k()
            # lr reset (tensorf.py:463-478)
            scale = 1.0 if self.lr_upsample_reset else (
                self.lr_decay_target ** (it / self.max_iter))
            self.lr_index = self.lr_index0 * scale
            self.lr_basis = self.lr_basis0 * scale
            self._step_cfg = None  # force step rebuild
        else:
            self.lr_index *= self.decay_factor
            self.lr_basis *= self.decay_factor

        if it in self.update_alphamask_iters:
            self._update_alphamask(it)

        if self.tv_density_weight > 0:
            self.tv_density_weight *= self.decay_factor
        if self.tv_color_weight > 0:
            self.tv_color_weight *= self.decay_factor

    def _update_alphamask(self, it: int):
        """tensorf.py:480-489, with the mask resolution CAPPED instead of
        the update skipped.

        The reference skips the whole update once the grid passes 256^3
        (tensorf.py:482) — at its own Blender headline config
        (update_alphamask_iters [12k, 20k], final res 400^3) it therefore
        never culls, never compacts, never shrinks.  We build the mask at
        ``capped_mask_res`` so culling + compaction + the app_k probe stay
        real at Blender scale (ADVICE round-4 high).  The bbox *shrink*
        stays reference-gated: it only runs where the reference's uncapped
        build would have run, because shrinking at 400^3 would change the
        optimization trajectory relative to the reference protocol (and
        realloc every factor grid).
        """
        res = self.resolution
        cap = int(self.opt.tpu.get("mask_cap_voxels", 256 ** 3))
        capped = res[0] * res[1] * res[2] >= cap
        if capped and not bool(self.opt.tpu.get("mask_res_cap", True)):
            return
        from ..models.alpha_mask import capped_mask_res
        self.alphamask_resolution = (capped_mask_res(res, cap) if capped
                                     else list(res))
        field = self.state.params.field
        step = schedules.step_size(np.asarray(field.aabb), res,
                                   float(self.opt.nerf.step_ratio))
        mask, new_aabb = update_alpha_mask(
            field, self.vm_cfg, self.alphamask_resolution, step,
            self.alphamask_thresh)
        self.alpha_mask = mask
        self.compact_k = self._probe_compact_k()
        self.app_k_dyn = self._probe_app_k()
        if (not capped) and it == self.update_alphamask_iters[0] and \
                self.opt.train_schedule.get("shrink_bbox_with_alphamask", True):
            new_field = vm_lib.shrink(field, new_aabb)
            self.resolution = new_field.resolution()
            self.state = dataclasses.replace(
                self.state, params=dataclasses.replace(
                    self.state.params, field=new_field))
            self.state = self._rebuild_opt_state(self.state)
            self._shard_state()
            self.n_samples = schedules.find_n_samples(
                self.resolution, float(self.opt.nerf.step_ratio),
                int(self.opt.nerf.sample_intvs))
            self._refresh_bbox_k()
        self._step_cfg = None

    def _probe_compact_k(self, n_probe_rays: int = 4096, poses=None,
                         intr_inv=None, pad: float = 1.25,
                         bbox_only: bool = False,
                         mask: Optional[AlphaMask] = None) -> Optional[int]:
        """Measure the worst-case number of alive samples per ray under the
        current alpha mask and pick a static compaction budget K.

        TPU analogue of the reference's boolean sample culling
        (tensorBase.py:750-755) with static shapes: rays keep only K sample
        slots.  The probe renders rays from every view of ``poses``
        (training poses by default; eval callers pass the poses they will
        render so the budget covers those rays) and takes the max alive
        count, padded by ``pad`` and rounded to a multiple of 64.

        ``bbox_only`` measures the IN-BBOX gate alone (no mask): the K
        budget for blur-active phases, where mask culling is disabled
        (batBase.py:77) but out-of-bbox samples are still dead weight —
        typically 20-35% of the S sample slots at the Blender geometry.
        """
        if self.opt.camera.get("ndc", False):
            return None
        probe_mask = mask if mask is not None else self.alpha_mask
        if probe_mask is None and not bbox_only:
            return None
        import jax.numpy as jnp

        from ..geometry.rays import get_center_and_ray
        from ..models.alpha_mask import sample_alpha
        from ..render.renderer import sample_ray

        field = self.state.params.field
        aabb = field.aabb
        res = self.resolution
        S = self.n_samples
        probe_rng = self.rng_np
        if poses is None:
            poses, _ = self.get_all_training_poses()
            intr_inv = self.intr_inv
        else:
            # eval-path callers (render_views / validate): a dedicated RNG
            # so mid-training validation never advances the training
            # stream (bisect arms must train identically with or without
            # freq.val enabled)
            probe_rng = np.random.default_rng(0)
        if bbox_only or mask is not None:
            # geometry-only and blur-mask probes: must not advance the
            # training RNG stream either (perf features, not protocol)
            probe_rng = np.random.default_rng(
                int(self.opt.get("seed", 0)) + 12345)
        n_probe_views = poses.shape[0]
        per_view = max(1, n_probe_rays // n_probe_views)
        idx = jnp.asarray(probe_rng.permutation(self.H * self.W)[:per_view])
        pose = poses
        centers, dirs = get_center_and_ray(self.H, self.W, pose,
                                           intr_inv, ray_idx=idx)
        centers = centers.reshape(-1, 3)
        dirs = dirs.reshape(-1, 3)

        # the renderer selects at PROBE-GROUP granularity (`stride`
        # consecutive samples share one alpha probe, renderer.py use_group),
        # so the K budget must cover alive GROUPS x stride, not alive
        # samples — a ray with many isolated alive runs needs more slots
        # than its raw alive count.
        stride = int(self.opt.tpu.get("mask_stride", 4))
        g = stride if (stride > 1 and S % stride == 0) else 1

        @jax.jit
        def alive_max(centers, dirs, aabb, mask_grid, mask_aabb):
            units = (aabb[1] - aabb[0]) / (
                jnp.asarray(res, jnp.float32) - 1)
            step = jnp.mean(units) * self.vm_cfg.step_ratio
            pts, _, in_bbox = sample_ray(
                aabb, step, S, centers, dirs, jax.random.PRNGKey(0),
                self.near_far[0], self.near_far[1], stratified=False)
            if bbox_only:
                n = pts.shape[0]
                if g > 1:
                    ginb = jnp.any(in_bbox.reshape(n, S // g, g), axis=-1)
                    return jnp.max(jnp.sum(ginb, axis=-1)) * g
                return jnp.max(jnp.sum(in_bbox, axis=-1))
            from ..models.alpha_mask import AlphaMask as AM
            mask = AM(grid=mask_grid, aabb=mask_aabb)
            if g > 1:
                # the renderer's EXACT group gate (renderer.py use_group):
                # alpha probed at the FIRST sample of each group
                # (clamp-sampled even when that sample is out of bbox) AND
                # any-in-bbox within the group.  Probing any(in_bbox &
                # alpha>0) instead (the old gate) undercounts groups whose
                # first-sample alpha is alive but whose alive samples are
                # out of bbox — the measured K must be an upper bound of
                # the renderer's selection by construction.
                n = pts.shape[0]
                a = sample_alpha(mask, pts[:, ::g].reshape(-1, 3)
                                 ).reshape(n, S // g)
                ginb = jnp.any(in_bbox.reshape(n, S // g, g), axis=-1)
                galive = (a > 0) & ginb
                return jnp.max(jnp.sum(galive, axis=-1)) * g
            a = sample_alpha(mask, pts.reshape(-1, 3)).reshape(pts.shape[:2])
            alive = in_bbox & (a > 0)
            return jnp.max(jnp.sum(alive, axis=-1))

        mask_grid = (probe_mask.grid if probe_mask is not None
                     else jnp.zeros((1, 1, 1), jnp.float32))
        mask_aabb = (probe_mask.aabb if probe_mask is not None
                     else field.aabb)
        mx = int(alive_max(centers, dirs, aabb, mask_grid, mask_aabb))
        # round UP to a multiple of 128: [n_rays, K] puts K on the lane
        # axis, so K=192 pads to 256 anyway (measured: k192 costs the same
        # step time as k256, scripts/compact_ablate.py) — take the slack
        # as extra exactness headroom instead of padding waste
        k = min(S, max(128, int(-(-int(mx * pad) // 128) * 128)))
        if k >= S:
            return None
        return k

    def _probe_app_k(self, n_probe_rays: int = 4096,
                     quantile: float = 0.98) -> Optional[int]:
        """Measure weight>thres gate counts on training rays and raise the
        training-time appearance cap so it clips almost no rays.

        VERDICT round-2 #6: the static ``tpu.app_k`` (64) clipped ~25% of
        rays at converged fields — those rays silently dropped
        above-threshold color contributions the reference keeps
        (tensorBase.py:773-783).  At every alpha-mask update this probe
        renders density on training rays, counts samples passing the
        weight gate per ray, and returns the ``quantile`` count rounded up
        to a multiple of 64 (clamped to [tpu.app_k, tpu.app_k_max]) —
        clip rate stays under ~1-quantile at the measured field instead of
        whatever the static cap happens to give.  ``tpu.app_k_auto: false``
        disables the raise; returns None to keep the configured cap.
        """
        base = (int(self.opt.tpu.app_k)
                if self.opt.tpu.get("app_k") else None)
        if base is None or not bool(self.opt.tpu.get("app_k_auto", True)):
            return None
        from ..geometry.rays import get_center_and_ray
        from ..models.alpha_mask import sample_alpha
        from ..render.renderer import sample_ray

        field = self.state.params.field
        S = self.n_samples
        poses, _ = self.get_all_training_poses()
        per_view = max(1, n_probe_rays // poses.shape[0])
        idx = jnp.asarray(self.rng_np.permutation(self.H * self.W)[:per_view])
        centers, dirs = get_center_and_ray(self.H, self.W, poses,
                                           self.intr_inv, ray_idx=idx)
        centers = centers.reshape(-1, 3)
        dirs = dirs.reshape(-1, 3)

        @jax.jit
        def gate_counts(field, centers, dirs, near_far):
            units = (field.aabb[1] - field.aabb[0]) / (
                jnp.asarray(self.resolution, jnp.float32) - 1)
            step = jnp.mean(units) * self.vm_cfg.step_ratio
            pts, z_vals, in_bbox = sample_ray(
                field.aabb, step, S, centers, dirs, jax.random.PRNGKey(0),
                near_far[0], near_far[1], stratified=False)
            valid = in_bbox
            if self.alpha_mask is not None:
                a = sample_alpha(self.alpha_mask,
                                 pts.reshape(-1, 3)).reshape(pts.shape[:2])
                valid = valid & (a > 0)
            coords = vm_lib.normalize_coord(pts.reshape(-1, 3), field.aabb)
            feat = vm_lib.compute_density_feature(
                field, self.vm_cfg, coords,
                stop_coord_grad=True).reshape(pts.shape[:2])
            sigma = jnp.where(
                valid, vm_lib.feature2density(self.vm_cfg, feat), 0.0)
            dists = jnp.concatenate(
                [z_vals[:, 1:] - z_vals[:, :-1],
                 jnp.zeros_like(z_vals[:, :1])], -1)
            alpha = 1.0 - jnp.exp(-sigma * dists * self.vm_cfg.distance_scale)
            T_excl = jnp.concatenate(
                [jnp.ones_like(alpha[:, :1]),
                 jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[:, :-1]], -1)
            weight = alpha * T_excl
            return jnp.sum(
                (weight > self.vm_cfg.raymarch_weight_thres) & valid, axis=-1)

        near_far = jnp.asarray(self._near_far(), jnp.float32)
        n_gate = np.asarray(gate_counts(field, centers, dirs, near_far))
        k_q = int(np.quantile(n_gate, quantile))
        clip = float((n_gate > base).mean())
        # This probe only ever RAISES the cap.  The renderer already clamps
        # K2 = min(app_k, S) internally (renderer.py), so when S < base the
        # configured cap is harmlessly over-sized — returning a lowered cap
        # here (the old `min(..., S)`) swapped the step config (a recompile)
        # for zero benefit while printing "raising" (VERDICT round-3 #6,
        # visible in MULTICHIP_r03's "raising to 48" tail).
        k = max(base, int(-(-k_q // 64) * 64))
        k = min(k, int(self.opt.tpu.get("app_k_max", 256)))
        if k > base and clip == 0.0:
            # 64-rounding of the quantile suggested a raise, but no measured
            # ray actually clips at the current cap — skip the recompile
            k = base
        if S <= base:
            print(f"[app_k] n_samples={S} <= app_k={base}; cap already "
                  f"covers every sample (renderer clamps) — keeping {base}")
            k = base
        if k != base:
            print(f"[app_k] gate quantile({quantile})={k_q} clips "
                  f"{clip:.1%} of rays at app_k={base} -> raising to {k}")
        return None if k == base else k

    def run(self, max_iter: Optional[int] = None, log_every: int = 100,
            callback=None):
        """Run the training loop up to max_iter."""
        end = self.max_iter if max_iter is None else max_iter
        t0 = time.time()
        pending: list[tuple[int, dict]] = []   # device-side metric window
        while self.it < end:
            metrics = self.train_iteration()
            self._update_schedule()
            # Latch every iteration's device metrics without a host sync
            # (per-iter syncs would serialize the pipelined dispatch);
            # the whole window transfers in ONE device_get at the next log
            # point, where EVERY key of EVERY pending iteration is
            # finiteness-checked — a mid-window NaN surfaces with its exact
            # iteration instead of burning up to log_every iterations
            # undetected (reference asserts per-iteration, base.py:183-184).
            pending.append((self.it, metrics))
            if self.it % log_every == 0:
                window = jax.device_get([mm for _, mm in pending])
                for (it_i, _), vals in zip(pending, window):
                    for key, val in vals.items():
                        if not math.isfinite(float(val)):
                            raise FloatingPointError(
                                f"non-finite {key}={float(val)} at it {it_i} "
                                f"(detected at log point it {self.it})")
                m = {k: float(v) for k, v in window[-1].items()}
                pending.clear()
                m.update(it=self.it, wall=time.time() - t0,
                         lr_index=self.lr_index, lr_pose=self._lr_pose())
                self.metrics_history.append(m)
                if callback:
                    callback(self, m)
            self.it += 1
        return self.metrics_history

    # ------------------------------------------------------------ evaluation
    def get_all_training_poses(self):
        """(pose, pose_GT) with noise + refinement applied (bat.py:196-209)."""
        pose = self.pose_base
        if self.is_bat:
            refine = lie.se3_to_SE3(self.state.params.se3_refine)
            pose = pose_ops.compose([refine, pose])
        return pose, self.gt_poses

    def render_views(self, pose, intr, intr_inv, chunk: int = 4096):
        # Build an eval-specific config instead of inheriting the last
        # training phase's: the compaction budget is re-probed on the poses
        # actually being rendered (test views see different alive counts
        # than training views) with a wider 1.5x pad, so eval renders keep
        # the "exact when <= K alive" guarantee for these rays.
        eval_k = self._probe_compact_k(poses=jnp.asarray(pose),
                                       intr_inv=jnp.asarray(intr_inv),
                                       pad=1.5)
        cfg = StepConfig(
            H=self.H, W=self.W, n_views=self.n_views, rays_per_view=chunk,
            n_samples=self.n_samples, pose_opt=self.is_bat,
            ndc=bool(self.opt.camera.get("ndc", False)),
            white_bg=bool(self.opt.nerf.get("setbg_opaque", True)),
            ndc_near_plane=float(self.opt.arch.get("ndc_near_plane", 1.0)),
            ndc_simulate_euclid_sample=bool(
                self.opt.get("ndc_simulate_euclid_sample", False)),
            ndc_simulate_euclid_depth=bool(
                self.opt.get("ndc_simulate_euclid_depth", False)),
            mlp_predict_density=bool(
                self.opt.arch.shading.get("predict_density", False)),
            use_alpha_mask=self.alpha_mask is not None,
            compact_k=eval_k,
            densify_density=(bool(self.opt.tpu.get("densify_density", True))
                             and eval_k is None),
            densify_impl=str(self.opt.tpu.get("densify_impl", "packed8")),
            # eval renders are exact by default: the app_k cap clips real
            # contributions on ~25% of rays at converged fields
            # (eval_clip_stats max_gate ~4x the training cap); training
            # keeps the cap for speed, evaluation does not unless
            # tpu.eval_app_k asks for it
            app_k=(int(self.opt.tpu.eval_app_k)
                   if self.opt.tpu.get("eval_app_k") else None),
            mask_stride=int(self.opt.tpu.get("mask_stride", 4)))
        render = make_render_fn(cfg, self.vm_cfg, self.head, chunk=chunk,
                                mesh=self.mesh,
                                field=self.state.params.field,
                                shard_components=self.shard_components)
        s = StepScalars(
            lr_index=jnp.float32(0), lr_basis=jnp.float32(0),
            lr_pose=jnp.float32(0), c2f_density=jnp.float32(0),
            c2f_color=jnp.float32(0),
            near_far=jnp.asarray(self._near_far(), jnp.float32),
            l1_weight=jnp.float32(0), tv_density_weight=jnp.float32(0),
            tv_color_weight=jnp.float32(0), use_edge=jnp.float32(0),
            edge_factor=jnp.float32(1), non_edge_factor=jnp.float32(1),
            view_pe_progress=jnp.float32(1), fea_pe_progress=jnp.float32(1),
            pose_do_step=jnp.float32(0), tv_depth_weight=jnp.float32(0))
        # fixed key: eval renders are non-stratified/deterministic, and
        # drawing from self.key here would perturb the TRAINING RNG stream
        # whenever validation runs mid-training (freq.val) — runs with and
        # without mid-train validation must train identically
        rkey = jax.random.PRNGKey(0)
        return render(self.state.params.field, pose, intr, intr_inv, s,
                      self.alpha_mask, rkey)

    def eval_clip_stats(self, pose, intr_inv, n_probe_rays: int = 4096):
        """Clip-rate diagnostics for the static compaction caps.

        Exactness of the static-shape analogues of the reference's dynamic
        boolean gathers (tensorBase.py:750-783) depends on two caps:
        ``compact_k`` (alive samples per ray) and ``app_k`` (samples passing
        the weight threshold).  Returns the fraction of probe rays whose
        true counts exceed each cap — 0.0 means the render was exact for
        those rays; nonzero rates quantify how many rays could drop
        (sub-threshold-weighted) contributions the reference would keep.
        """
        from ..geometry.rays import get_center_and_ray
        from ..models.alpha_mask import sample_alpha
        from ..render.renderer import sample_ray

        field = self.state.params.field
        aabb = field.aabb
        S = self.n_samples
        per_view = max(1, n_probe_rays // max(1, pose.shape[0]))
        idx = jnp.asarray(self.rng_np.permutation(self.H * self.W)[:per_view])
        centers, dirs = get_center_and_ray(self.H, self.W, jnp.asarray(pose),
                                           jnp.asarray(intr_inv), ray_idx=idx)
        centers = centers.reshape(-1, 3)
        dirs = dirs.reshape(-1, 3)
        # report clipping against the TRAINING cap (eval renders are dense
        # by default — render_views app_k); nonzero rates here quantify the
        # training-time approximation, not the eval render
        app_k = (int(self.opt.tpu.app_k)
                 if self.opt.tpu.get("app_k") else None)
        compact_k = self._probe_compact_k(poses=jnp.asarray(pose),
                                          intr_inv=jnp.asarray(intr_inv),
                                          pad=1.5)

        @jax.jit
        def counts(field, centers, dirs, near_far):
            units = (field.aabb[1] - field.aabb[0]) / (
                jnp.asarray(self.resolution, jnp.float32) - 1)
            step = jnp.mean(units) * self.vm_cfg.step_ratio
            pts, z_vals, in_bbox = sample_ray(
                field.aabb, step, S, centers, dirs, jax.random.PRNGKey(0),
                near_far[0], near_far[1], stratified=False)
            valid = in_bbox
            if self.alpha_mask is not None:
                a = sample_alpha(self.alpha_mask,
                                 pts.reshape(-1, 3)).reshape(pts.shape[:2])
                valid = valid & (a > 0)
            coords = vm_lib.normalize_coord(pts.reshape(-1, 3), field.aabb)
            feat = vm_lib.compute_density_feature(
                field, self.vm_cfg, coords,
                stop_coord_grad=True).reshape(pts.shape[:2])
            sigma = jnp.where(valid, vm_lib.feature2density(self.vm_cfg, feat),
                              0.0)
            dists = jnp.concatenate(
                [z_vals[:, 1:] - z_vals[:, :-1],
                 jnp.zeros_like(z_vals[:, :1])], -1)
            alpha = 1.0 - jnp.exp(-sigma * dists * self.vm_cfg.distance_scale)
            T_excl = jnp.concatenate(
                [jnp.ones_like(alpha[:, :1]),
                 jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[:, :-1]], -1)
            weight = alpha * T_excl
            n_alive = jnp.sum(valid, axis=-1)
            n_gate = jnp.sum(
                (weight > self.vm_cfg.raymarch_weight_thres) & valid, axis=-1)
            return n_alive, n_gate

        near_far = jnp.asarray(self._near_far(), jnp.float32)
        n_alive, n_gate = counts(field, centers, dirs, near_far)
        n_alive = np.asarray(n_alive)
        n_gate = np.asarray(n_gate)
        out = {"compact_k": compact_k, "app_k": app_k,
               "max_alive": int(n_alive.max()), "max_gate": int(n_gate.max())}
        out["compact_clip_rate"] = (float((n_alive > compact_k).mean())
                                    if compact_k is not None else 0.0)
        out["app_k_clip_rate"] = (float((n_gate > app_k).mean())
                                  if app_k is not None else 0.0)
        return out

    def validate(self, data: Optional[SceneData] = None, align: bool = True):
        """PSNR over a validation split (optionally sim3-aligned poses)."""
        from ..geometry import align as align_lib

        data = data or self.val_data
        assert data is not None
        pose = jnp.asarray(data.poses)
        if self.is_bat and align:
            tr_pose, tr_gt = self.get_all_training_poses()
            _, sim3 = align_lib.prealign_cameras(tr_pose, tr_gt)
            pose = align_lib.align_test_pose(pose, sim3)
        rgb, depth, opacity = self.render_views(
            pose, jnp.asarray(data.intr), jnp.asarray(data.intr_inv))
        V = data.n_views
        target = jnp.asarray(
            data.images.reshape(V, 3, -1).transpose(0, 2, 1))
        mse_per = jnp.mean((rgb - target) ** 2, axis=(1, 2))
        psnr = float(jnp.mean(-10 * jnp.log10(mse_per)))
        return {"psnr": psnr, "rgb": rgb, "depth": depth}

    def visualize_pose_gradient(self, view: int = 0, n_rays_chunk: int = 256):
        """Per-pixel pose-jacobian heatmaps for one training view
        (nerf.py:444-517).  Returns (rot [3,H,W], trans [3,H,W])."""
        from ..geometry.rays import get_center_and_ray
        from ..render.renderer import RenderConfig, render_rays
        from ..viz.grad_viz import delta_pose, pose_gradient_maps

        pose_all, _ = self.get_all_training_poses()
        pose = pose_all[view:view + 1]
        intr_inv = self.intr_inv[view:view + 1]
        image = self.images_sharp[view]               # [H*W, 3]
        rcfg = RenderConfig(
            n_samples=self.n_samples, is_train=False,
            ndc=bool(self.opt.camera.get("ndc", False)),
            white_bg=bool(self.opt.nerf.get("setbg_opaque", True)),
            stop_coord_grad=False)
        near_far = jnp.asarray(self._near_far(), jnp.float32)
        state = self.state.params.field
        key = jax.random.PRNGKey(0)

        def render_mse(delta, ray_idx):
            dp = delta_pose(delta)[None]
            p = pose_ops.compose_pair(dp, pose)
            centers, dirs = get_center_and_ray(self.H, self.W, p, intr_inv,
                                               ray_idx=ray_idx)
            rgb, _, _ = render_rays(state, self.vm_cfg, rcfg, self.head,
                                    centers.reshape(-1, 3),
                                    dirs.reshape(-1, 3), key, near_far,
                                    alpha_mask=self.alpha_mask)
            return (rgb - image[ray_idx]) ** 2

        return pose_gradient_maps(render_mse, self.H, self.W, n_rays_chunk)

    def pose_error(self):
        """Mean rotation (deg) / translation error after sim3 alignment."""
        from ..geometry import align as align_lib

        pose, pose_GT = self.get_all_training_poses()
        aligned, _ = align_lib.prealign_cameras(pose, pose_GT)
        r_err, t_err = align_lib.evaluate_camera_alignment(aligned, pose_GT)
        return {"rot_deg": float(jnp.rad2deg(jnp.mean(r_err))),
                "trans": float(jnp.mean(t_err))}
