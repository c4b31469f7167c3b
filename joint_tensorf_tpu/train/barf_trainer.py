"""BARF / MLP-NeRF trainer (the reference's nerf & barf engines).

Joint pose + coordinate-MLP NeRF: per-view se(3) refinement over noisy
poses, c2f positional-encoding masking, iteration-based training with the
reference's ray-sampling strategies.  No phase machinery (shapes are fixed
for the whole run) — one jitted step.

Capability map: nerf.Model.train (nerf.py:150-278) + barf.Model
(barf.py:24-245) + nerf.Graph.render (nerf.py:698-726).
"""
from __future__ import annotations

import dataclasses
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data.base import SceneData
from ..geometry import lie, poses as pose_ops
from ..geometry.ndc import convert_ndc
from ..geometry.rays import get_center_and_ray
from ..models import nerf_mlp
from ..sched.schedules import interp_schedule
from . import losses
from .optim import AdamState, adam_init, adam_update


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BarfParams:
    mlp: dict
    se3_refine: jnp.ndarray
    # separate fine network for hierarchical sampling (nerf.py:648, :723-724)
    mlp_fine: Optional[dict] = None


class BarfTrainer:
    def __init__(self, opt: Options, train_data: SceneData,
                 val_data: Optional[SceneData] = None):
        self.opt = opt
        self.data = train_data
        self.val_data = val_data
        self.it = 0
        self.max_iter = int(opt.max_iter)
        self.rng_np = np.random.default_rng(int(opt.get("seed", 0)))
        self.key = jax.random.PRNGKey(int(opt.get("seed", 0)))
        self.is_barf = opt.model == "barf"

        arch = opt.arch
        self.mlp_cfg = nerf_mlp.NerfMLPConfig(
            layers_feat=tuple(int(x) for x in arch.layers_feat[1:]),
            layers_rgb=tuple(int(x) for x in arch.layers_rgb[1:]),
            skip=tuple(arch.get("skip", [])),
            L_3D=int(arch.posenc.L_3D) if arch.get("posenc") else 0,
            L_view=int(arch.posenc.L_view) if arch.get("posenc") else 0,
            posenc=bool(arch.get("posenc")),
            view_dep=bool(opt.nerf.get("view_dep", True)),
            density_activ=arch.get("density_activ", "softplus"),
            tf_init=bool(arch.get("tf_init", True)),
            barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f") else None,
        )

        n_views = train_data.n_views
        self.n_views = n_views
        self.H, self.W = train_data.H, train_data.W
        self.gt_poses = jnp.asarray(train_data.poses)
        if self.is_barf and opt.camera.get("noise"):
            nk, self.key = jax.random.split(self.key)
            se3_noise = jax.random.normal(nk, (n_views, 6)) * float(
                opt.camera.noise)
            self.pose_noise = lie.se3_to_SE3(se3_noise)
            self.pose_base = pose_ops.compose([self.pose_noise, self.gt_poses])
        else:
            self.pose_noise = None
            self.pose_base = self.gt_poses

        V, H, W = n_views, self.H, self.W
        self.images = jnp.asarray(np.ascontiguousarray(
            train_data.images.reshape(V, 3, H * W).transpose(0, 2, 1)))
        self.intr = jnp.asarray(train_data.intr)
        self.intr_inv = jnp.asarray(train_data.intr_inv)
        self.near_far = jnp.asarray(train_data.near_far, jnp.float32)

        self.fine_sampling = bool(opt.nerf.get("fine_sampling", False))
        mk, self.key = jax.random.split(self.key)
        mlp_fine = None
        if self.fine_sampling:
            fk, mk = jax.random.split(mk)
            mlp_fine = nerf_mlp.init_nerf_mlp(fk, self.mlp_cfg)
        self.params = BarfParams(
            mlp=nerf_mlp.init_nerf_mlp(mk, self.mlp_cfg),
            se3_refine=jnp.zeros((n_views, 6)),
            mlp_fine=mlp_fine)
        self.opt_state = adam_init(self.params)

        # lr schedules (ExponentialLR toward lr_end, nerf.py:48-55)
        o = opt.optim
        self.lr0 = float(o.lr)
        self.lr_gamma = ((float(o.lr_end) / self.lr0) ** (1.0 / self.max_iter)
                         if o.get("lr_end") else 1.0)
        self.lr_pose0 = float(o.get("lr_pose", 0.0) or 0.0)
        self.pose_gamma = ((float(o.lr_pose_end) / self.lr_pose0)
                           ** (1.0 / self.max_iter)
                           if o.get("lr_pose_end") and self.lr_pose0 else 1.0)
        self.warmup_pose = o.get("warmup_pose")

        self._step = self._build_step()
        self.metrics_history: list[dict] = []

    # ------------------------------------------------------------------ step
    def _build_step(self):
        opt = self.opt
        cfg = self.mlp_cfg
        H, W = self.H, self.W
        n_samples = int(opt.nerf.sample_intvs)
        stratified = bool(opt.nerf.get("sample_stratified", True))
        ndc = bool(opt.camera.get("ndc", False))
        setbg = bool(opt.nerf.get("setbg_opaque", False))
        bgcolor = float(opt.data.get("bgcolor", 1) or 1)
        density_noise = float(opt.nerf.get("density_noise_reg") or 0.0)
        pose_opt = self.is_barf
        fine_sampling = self.fine_sampling
        n_fine = int(opt.nerf.get("sample_intvs_fine") or 0)
        # log-scale loss weights (base.py:175: 10**w)
        lw = opt.get("loss_weight", {})
        w_render = 10.0 ** float(lw.get("render") or 0.0)
        w_fine = (10.0 ** float(lw.get("render_fine"))
                  if lw.get("render_fine") is not None else 0.0)

        def loss_fn(params: BarfParams, view_sel, ray_idx, rng, progress,
                    pose_base, images):
            base = pose_base[view_sel]
            if pose_opt:
                refine = lie.se3_to_SE3(params.se3_refine[view_sel])
                pose = pose_ops.compose([refine, base])
            else:
                pose = base
            centers, dirs = get_center_and_ray(H, W, pose,
                                               self.intr_inv[view_sel],
                                               ray_idx=ray_idx)
            if ndc:
                centers, dirs = convert_ndc(centers, dirs,
                                            self.intr[view_sel])
            B, R = centers.shape[0], centers.shape[1]
            c = centers.reshape(-1, 3)
            d = dirs.reshape(-1, 3)
            r1, r2 = jax.random.split(rng)
            depth = nerf_mlp.sample_depth(
                r1, c.shape[0], n_samples, self.near_far, stratified,
                opt.nerf.depth.get("param", "metric"))
            pts = c[:, None, :] + d[:, None, :] * depth[..., None]
            ray_unit = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            ray_unit_s = jnp.broadcast_to(ray_unit[:, None, :], pts.shape)
            rgb_s, dens_s = nerf_mlp.apply_nerf_mlp(
                params.mlp, cfg, pts, ray_unit_s, progress=progress,
                density_noise=density_noise, rng=r2)
            rgb, depth_map, opacity, prob = nerf_mlp.composite(
                cfg, d, rgb_s, dens_s, depth, setbg, bgcolor)
            target = jnp.take(images[view_sel], ray_idx, axis=1).reshape(-1, 3)
            m = losses.mse(rgb, target)
            loss = w_render * m
            metrics = {"mse": m, "psnr": losses.psnr_from_mse(m)}
            if fine_sampling:
                # resample by the coarse pdf, union + sort (nerf.py:717-724)
                prob = jax.lax.stop_gradient(prob)
                depth_fine = nerf_mlp.sample_depth_from_pdf(
                    None, prob, self.near_far, n_fine)
                depth_b = jnp.broadcast_to(depth, prob.shape)
                depth_all = jnp.sort(
                    jnp.concatenate([depth_b, depth_fine], axis=-1), axis=-1)
                pts_f = c[:, None, :] + d[:, None, :] * depth_all[..., None]
                ray_unit_f = jnp.broadcast_to(ray_unit[:, None, :], pts_f.shape)
                rgb_fs, dens_fs = nerf_mlp.apply_nerf_mlp(
                    params.mlp_fine, cfg, pts_f, ray_unit_f, progress=progress,
                    density_noise=density_noise, rng=r2)
                rgb_f, _, _, _ = nerf_mlp.composite(
                    cfg, d, rgb_fs, dens_fs, depth_all, setbg, bgcolor)
                m_f = losses.mse(rgb_f, target)
                loss = loss + w_fine * m_f
                # the fine branch defines the headline PSNR (nerf.py:297)
                metrics = {"mse": m_f, "psnr": losses.psnr_from_mse(m_f),
                           "psnr_coarse": losses.psnr_from_mse(m)}
            return loss, metrics

        @jax.jit
        def step(params, opt_state, view_sel, ray_idx, rng, progress, lr,
                 lr_pose, pose_base, images):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, view_sel, ray_idx, rng, progress, pose_base, images)
            lr_tree = BarfParams(
                mlp=jax.tree.map(lambda _: lr, params.mlp),
                se3_refine=lr_pose,
                mlp_fine=jax.tree.map(lambda _: lr, params.mlp_fine))
            new_params, opt_state = adam_update(grads, opt_state, params,
                                                lr_tree, b2=0.999)
            metrics["loss"] = loss
            return new_params, opt_state, metrics

        return step

    # ------------------------------------------------------------------ loop
    @property
    def progress(self):
        return self.it / self.max_iter

    def _sample_rays(self):
        strat = self.opt.nerf.ray_sampling_strategy
        n_rays = int(self.opt.nerf.n_rays)
        V, H, W = self.n_views, self.H, self.W
        if strat == "single_view_rand_rays":
            view = self.it % V
            return np.array([view]), self.rng_np.permutation(H * W)[:n_rays]
        return np.arange(V), self.rng_np.permutation(H * W)[:max(
            1, n_rays // V)]

    def train_iteration(self):
        view_sel, ray_idx = self._sample_rays()
        lr = self.lr0 * (self.lr_gamma ** self.it)
        lr_pose = self.lr_pose0 * (self.pose_gamma ** self.it)
        if self.warmup_pose:
            lr_pose *= min(1.0, self.it / float(self.warmup_pose))
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, jnp.asarray(view_sel),
            jnp.asarray(ray_idx), k, jnp.float32(self.progress),
            jnp.float32(lr), jnp.float32(lr_pose), self.pose_base,
            self.images)
        return metrics

    def run(self, max_iter=None, log_every: int = 100, callback=None):
        end = self.max_iter if max_iter is None else max_iter
        t0 = time.time()
        while self.it < end:
            m = self.train_iteration()
            if self.it % log_every == 0:
                mm = {k: float(v) for k, v in m.items()}
                # NaN/Inf guard (reference base.py:183-184), at log points
                if not math.isfinite(mm.get("loss", 0.0)):
                    raise FloatingPointError(
                        f"non-finite loss {mm['loss']} at it {self.it}")
                mm.update(it=self.it, wall=time.time() - t0)
                self.metrics_history.append(mm)
                if callback:
                    callback(self, mm)
            self.it += 1
        return self.metrics_history

    # ----------------------------------------------------------------- eval
    def get_all_training_poses(self):
        pose = self.pose_base
        if self.is_barf:
            refine = lie.se3_to_SE3(self.params.se3_refine)
            pose = pose_ops.compose([refine, pose])
        return pose, self.gt_poses

    def pose_error(self):
        from ..geometry import align as align_lib

        pose, gt = self.get_all_training_poses()
        aligned, _ = align_lib.prealign_cameras(pose, gt)
        r, t = align_lib.evaluate_camera_alignment(aligned, gt)
        return {"rot_deg": float(jnp.rad2deg(jnp.mean(r))),
                "trans": float(jnp.mean(t))}

    def render_views(self, pose, intr, intr_inv, chunk: int = 2048):
        opt = self.opt
        cfg = self.mlp_cfg
        n_samples = int(opt.nerf.sample_intvs)

        @jax.jit
        def render_chunk(params, c, d, rng):
            depth = nerf_mlp.sample_depth(rng, c.shape[0], n_samples,
                                          self.near_far, False,
                                          opt.nerf.depth.get("param", "metric"))
            pts = c[:, None, :] + d[:, None, :] * depth[..., None]
            ray_unit = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            ray_unit_s = jnp.broadcast_to(ray_unit[:, None, :], pts.shape)
            rgb_s, dens_s = nerf_mlp.apply_nerf_mlp(
                params.mlp, cfg, pts, ray_unit_s, progress=1.0)
            rgb, depth_map, opacity, prob = nerf_mlp.composite(
                cfg, d, rgb_s, dens_s, depth,
                bool(opt.nerf.get("setbg_opaque", False)),
                float(opt.data.get("bgcolor", 1) or 1))
            if self.fine_sampling:
                n_fine = int(opt.nerf.get("sample_intvs_fine") or 0)
                depth_fine = nerf_mlp.sample_depth_from_pdf(
                    None, prob, self.near_far, n_fine)
                depth_b = jnp.broadcast_to(depth, prob.shape)
                depth_all = jnp.sort(
                    jnp.concatenate([depth_b, depth_fine], axis=-1), axis=-1)
                pts_f = c[:, None, :] + d[:, None, :] * depth_all[..., None]
                ray_unit_f = jnp.broadcast_to(ray_unit[:, None, :],
                                              pts_f.shape)
                rgb_fs, dens_fs = nerf_mlp.apply_nerf_mlp(
                    params.mlp_fine, cfg, pts_f, ray_unit_f, progress=1.0)
                rgb, depth_map, opacity, _ = nerf_mlp.composite(
                    cfg, d, rgb_fs, dens_fs, depth_all,
                    bool(opt.nerf.get("setbg_opaque", False)),
                    float(opt.data.get("bgcolor", 1) or 1))
            return rgb, depth_map, opacity

        B = pose.shape[0]
        centers, dirs = get_center_and_ray(self.H, self.W, pose, intr_inv)
        if bool(opt.camera.get("ndc", False)):
            centers, dirs = convert_ndc(centers, dirs, intr)
        c = centers.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        n = c.shape[0]
        pad = (-n) % chunk
        c = jnp.pad(c, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        outs = []
        for i in range(0, n + pad, chunk):
            self.key, k = jax.random.split(self.key)
            outs.append(render_chunk(self.params, c[i:i + chunk],
                                     d[i:i + chunk], k))
        rgb = jnp.concatenate([o[0] for o in outs])[:n].reshape(B, -1, 3)
        depth = jnp.concatenate([o[1] for o in outs])[:n].reshape(B, -1)
        opac = jnp.concatenate([o[2] for o in outs])[:n].reshape(B, -1)
        return rgb, depth, opac

    def validate(self, data: Optional[SceneData] = None, align: bool = True):
        from ..geometry import align as align_lib

        data = data or self.val_data
        pose = jnp.asarray(data.poses)
        if self.is_barf and align:
            tr_pose, tr_gt = self.get_all_training_poses()
            _, sim3 = align_lib.prealign_cameras(tr_pose, tr_gt)
            pose = align_lib.align_test_pose(pose, sim3)
        rgb, depth, opac = self.render_views(
            pose, jnp.asarray(data.intr), jnp.asarray(data.intr_inv))
        target = jnp.asarray(data.images.reshape(data.n_views, 3, -1)
                             .transpose(0, 2, 1))
        mse_per = jnp.mean((rgb - target) ** 2, axis=(1, 2))
        return {"psnr": float(jnp.mean(-10 * jnp.log10(mse_per))),
                "rgb": rgb, "depth": depth}
