"""Planar (2D) alignment trainer — the paper's fast sanity pipeline.

Jointly optimizes a factored neural image and per-patch homography (or
lower-dof) warps against perturbed patches of a single photo, with the
scheduled rank + component-wise blur coarse-to-fine strategy
(reference model/planar.py + model/planar_svd.py; training protocol
planar.py:69-130).  Logs PSNR and warp_error = ||warp_param - warp_pert||,
the ground-truth alignment distance.
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
from ..geometry import warp2d
from ..models import planar as planar_lib
from ..ops.kernels import gaussian_kernel, average_kernel
from ..ops.sampling import sample_image
from ..sched.schedules import interp_schedule
from .losses import mse
from .optim import adam_init, adam_update


def _load_image(opt) -> np.ndarray:
    """[3, H, W] float32 image; synthesizes a test pattern if the configured
    file is missing (no datasets ship with the repo)."""
    H, W = opt.data.image_size
    fname = opt.data.get("image_fname")
    if fname:
        try:
            import imageio.v2 as imageio

            img = imageio.imread(fname).astype(np.float32) / 255.0
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            img = img[..., :3].transpose(2, 0, 1)
            from ..data.base import resize_images

            return resize_images(img[None], (H, W))[0]
        except FileNotFoundError:
            pass
    # procedural fallback: aperiodic multi-scale structure (random smooth
    # blobs) — periodic patterns make the alignment objective ambiguous
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    yn, xn = y / H, x / W
    img = np.full((3, H, W), 0.5, np.float32)
    for _ in range(40):
        cx, cy = rng.uniform(0, 1, 2)
        s = rng.uniform(0.02, 0.25)
        color = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        g = np.exp(-((xn - cx) ** 2 + (yn - cy) ** 2) / (2 * s**2))
        img += color[:, None, None] * g
    return np.clip(img, 0, 1).astype(np.float32)


class PlanarTrainer:
    def __init__(self, opt: Options):
        self.opt = opt
        self.it = 0
        self.max_iter = int(opt.max_iter)
        self.rng_np = np.random.default_rng(int(opt.get("seed", 0)))
        self.key = jax.random.PRNGKey(int(opt.get("seed", 0)))

        self.H, self.W = opt.data.image_size
        self.H_crop, self.W_crop = opt.data.patch_crop
        self.B = int(opt.batch_size)
        self.warp_type = opt.warp.type
        self.dof = int(opt.warp.dof)
        self.fix_first = bool(opt.warp.get("fix_first", True))

        self.image_raw = jnp.asarray(_load_image(opt))

        self.model = opt.model  # planar (mlp) | planar_svd | planar_fft
        key, self.key = jax.random.split(self.key)
        if self.model == "planar_svd":
            res_w, res_h = opt.arch.resolution
            self.max_ranks = int(opt.arch.max_ranks)
            self.params = {
                "image": planar_lib.init_svd_image(key, self.max_ranks,
                                                   res_w, res_h),
                "warp": jnp.zeros((self.B, self.dof)),
            }
        elif self.model == "planar_fft":
            res_w, res_h = opt.arch.resolution
            self.max_ranks = max(res_w // 5, res_h // 5)
            self.params = {
                "image": planar_lib.init_fft_image(res_w, res_h),
                "warp": jnp.zeros((self.B, self.dof)),
            }
        else:  # BARF-style MLP
            layers = [int(x) for x in opt.arch.layers[1:]]
            self.max_ranks = 0
            self.params = {
                "image": planar_lib.init_mlp_image(
                    key, layers, int(opt.arch.posenc.L_2D),
                    skip=tuple(opt.arch.get("skip", [])),
                    barf_c2f=opt.get("barf_c2f")),
                "warp": jnp.zeros((self.B, self.dof)),
            }

        self.opt_state = adam_init(self.params)
        self.warp_pert, self.image_pert = self._generate_perturbations()
        self._step = self._build_step()
        self.metrics_history: list[dict] = []

    # ---------------------------------------------------------------- setup
    def _generate_perturbations(self):
        """Pre-generate warp noise + warped GT patches (planar.py:104-130)."""
        opt = self.opt
        noise_h = float(opt.warp.noise_h)
        noise_t = float(opt.warp.get("noise_t", 0.0))
        trans = [(0, 0)] + [(x, y) for x in (-noise_t, noise_t)
                            for y in (-noise_t, noise_t)]
        perts = np.zeros((self.B, self.dof), np.float32)
        for i in range(self.B):
            while True:
                p = self.rng_np.normal(size=self.dof).astype(np.float32) * noise_h
                if self.dof > 1:
                    p[0] += trans[i % len(trans)][0]
                    p[1] += trans[i % len(trans)][1]
                if warp2d.check_corners_in_range(
                        jnp.asarray(p)[None], self.warp_type, self.H, self.W,
                        self.H_crop, self.W_crop):
                    break
            perts[i] = p
        if self.fix_first:
            perts[0] = 0
        perts = jnp.asarray(perts)

        grid = warp2d.normalized_pixel_grid_crop(self.H, self.W, self.H_crop,
                                                 self.W_crop)
        grid = jnp.broadcast_to(grid, (self.B,) + grid.shape)
        warped = warp2d.warp_grid(grid, perts, self.warp_type)
        s = max(self.H, self.W)
        warped = jnp.stack([warped[..., 0] * s / self.W,
                            warped[..., 1] * s / self.H], axis=-1)
        patches = jax.vmap(lambda c: sample_image(self.image_raw, c))(warped)
        return perts, patches  # [B,dof], [B, Hc*Wc, 3]

    def _image_forward(self, image_params, coords, sigma, cur_rank,
                       progress=1.0):
        opt = self.opt
        if self.model == "planar_svd":
            kernel = None
            ktype = opt.arch.get("kernel_type", "none")
            if ktype in ("gaussian", "average"):
                ksize = int(opt.arch.kernel_size)
                kernel = (gaussian_kernel(sigma, ksize) if ktype == "gaussian"
                          else average_kernel(sigma, ksize))
            return planar_lib.svd_image_forward(
                image_params, coords, kernel=kernel, cur_rank=cur_rank,
                interp_before_product=bool(opt.get("interp_before_product",
                                                   False)),
                mode=opt.arch.get("grid_interp", "bilinear"))
        if self.model == "planar_fft":
            kernel = None
            if opt.arch.get("kernel_type", "none") in ("gaussian", "average"):
                kernel = gaussian_kernel(sigma, int(opt.arch.kernel_size))
            return planar_lib.fft_image_forward(
                image_params, coords, cur_rank=cur_rank, kernel=kernel)
        return planar_lib.mlp_image_forward(
            image_params, coords, int(opt.arch.posenc.L_2D),
            skip=tuple(opt.arch.get("skip", [])),
            barf_c2f=opt.get("barf_c2f"), progress=progress)

    def _build_step(self):
        opt = self.opt
        grid = warp2d.normalized_pixel_grid_crop(self.H, self.W, self.H_crop,
                                                 self.W_crop)
        target = self.image_pert
        lw_render = 10.0 ** float(opt.loss_weight.get("render", 0))
        tv_w = opt.loss_weight.get("total_variance")
        lw_tv = 10.0 ** float(tv_w) if tv_w is not None else 0.0
        lr_image = float(opt.optim.lr)
        lr_warp = float(opt.optim.lr_warp)

        def loss_fn(params, sigma, cur_rank, progress):
            g = jnp.broadcast_to(grid, (self.B,) + grid.shape)
            warped = warp2d.warp_grid(g, params["warp"], self.warp_type)
            rgb = self._image_forward(params["image"], warped, sigma, cur_rank,
                                      progress)
            loss = lw_render * mse(rgb, target)
            render_mse = mse(rgb, target)
            if lw_tv > 0 and self.model == "planar_svd":
                loss = loss + lw_tv * planar_lib.svd_tv_loss(
                    params["image"], self.max_ranks)
            elif lw_tv > 0 and self.model == "planar_fft":
                loss = loss + lw_tv * planar_lib.fft_parseval_loss(
                    params["image"])
            return loss, render_mse

        @jax.jit
        def step(params, opt_state, sigma, cur_rank, progress):
            (loss, render_mse), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, sigma, cur_rank, progress)
            lr_tree = {"image": jax.tree.map(lambda _: jnp.float32(lr_image),
                                             params["image"]),
                       "warp": jnp.float32(lr_warp)}
            new_params, opt_state = adam_update(grads, opt_state, params,
                                                lr_tree, b2=0.999)
            if self.fix_first:
                new_params["warp"] = new_params["warp"].at[0].set(0.0)
            return new_params, opt_state, loss, render_mse

        return step

    # ----------------------------------------------------------------- loop
    @property
    def progress(self):
        return self.it / self.max_iter

    def train_iteration(self):
        opt = self.opt
        sigma = 0.0
        cur_rank = self.max_ranks
        if opt.get("c2f_schedule") is not None:
            if opt.c2f_schedule.get("kernel_t") is not None:
                sigma = interp_schedule(self.progress, opt.c2f_schedule.kernel_t)
            if opt.c2f_schedule.get("rank") is not None:
                cur_rank = int(interp_schedule(self.progress,
                                               opt.c2f_schedule.rank))
        self.params, self.opt_state, loss, render_mse = self._step(
            self.params, self.opt_state, jnp.float32(sigma),
            jnp.int32(cur_rank), jnp.float32(self.progress))
        return {"loss": float(loss), "mse": float(render_mse),
                "psnr": float(-10 * np.log10(max(float(render_mse), 1e-12))),
                "sigma": float(sigma), "rank": cur_rank}

    def warp_error(self) -> float:
        d = np.asarray(self.params["warp"]) - np.asarray(self.warp_pert)
        return float(np.linalg.norm(d, axis=-1).mean())

    def run(self, max_iter: Optional[int] = None, log_every: int = 100,
            callback=None):
        end = self.max_iter if max_iter is None else max_iter
        t0 = time.time()
        while self.it < end:
            m = self.train_iteration()
            if self.it % log_every == 0:
                if not math.isfinite(float(m.get("loss", 0.0))):
                    raise FloatingPointError(
                        f"non-finite loss {float(m['loss'])} at it {self.it}")
                m.update(it=self.it, warp_error=self.warp_error(),
                         wall=time.time() - t0)
                self.metrics_history.append(m)
                if callback:
                    callback(self, m)
            self.it += 1
        return self.metrics_history

    def predict_entire_image(self):
        """[H, W, 3] current neural-image reconstruction (planar.py:146-151)."""
        grid = warp2d.normalized_pixel_grid(self.H, self.W)[None]
        sigma = 0.0
        if self.opt.get("c2f_schedule") is not None and \
                self.opt.c2f_schedule.get("kernel_t") is not None:
            sigma = interp_schedule(self.progress,
                                    self.opt.c2f_schedule.kernel_t)
        rgb = self._image_forward(self.params["image"], grid,
                                  jnp.float32(sigma),
                                  jnp.int32(self.max_ranks))
        return np.asarray(rgb).reshape(self.H, self.W, 3)
