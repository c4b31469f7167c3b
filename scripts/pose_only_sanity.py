#!/usr/bin/env python
"""Pose-only sanity experiment: is the pose-gradient path unbiased?

Separates the pose-optimization machinery from joint-optimization
identifiability (the 6k/20k convergence runs plateau at a few degrees with
ALL views carrying residual error — either the field absorbs a warp, or
pose gradients are biased):

1. trains a TensoRF at GT poses on the procedural synthetic scene
   (or loads --ckpt from a previous run of this script);
2. freezes the field; for each probed view, perturbs the GT pose with
   se(3) noise (sigma 0.15, the BAT Blender level) and recovers it by
   photometric test-time pose optimization with a c2f blur schedule
   (reference bat.py:265-292 machinery, pose/test_optim.py);
3. prints per-view recovered rotation/translation errors vs GT.

Recovery to ~0 means the pose path is sound and the joint plateau is a
field-absorption effect of the scene; a uniform floor here would indicate
a systematic gradient/convention bug.
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


OUT = "output/synthetic/pose_sanity_field"


def train_field():
    cmd = [sys.executable, "train.py",
           "--yaml=configs/tensorf_synthetic_small.yaml",
           "--max_iter=3000",
           "--data.image_size=[128,128]", "--data.n_views=100",
           "--data.val_sub=2",
           "--train_schedule.n_voxel_init=110592",
           "--train_schedule.n_voxel_final=4096000",
           "--train_schedule.upsample_iters=[600,1200,1800]",
           "--train_schedule.update_alphamask_iters=[2000]",
           "--nerf.sample_intvs=384", "--nerf.n_rays=4096",
           "--freq.scalar=250",
           "--group=synthetic", "--name=pose_sanity_field"]
    print("[phase 1] training field at GT poses:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--n-probe-views", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--test-iter", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-end", type=float, default=1e-5)
    ap.add_argument("--blur", action="store_true",
                    help="render with a c2f blur schedule (NOTE: targets "
                         "stay sharp, so this mismatches the supervision — "
                         "the paper blurs BOTH; off by default)")
    args = ap.parse_args()

    if not args.skip_train or not os.path.exists(f"{OUT}/model.ckpt.npz"):
        train_field()

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.geometry import lie, poses as pose_ops
    from joint_tensorf_tpu.pose.test_optim import make_test_time_optimizer
    from joint_tensorf_tpu.render.renderer import BlurSpec, RenderConfig
    from joint_tensorf_tpu.train import checkpoint as ckpt_lib
    from joint_tensorf_tpu.train.trainer import Trainer

    opt = set_options("configs/tensorf_synthetic_small.yaml", [
        "--data.image_size=[128,128]", "--data.n_views=100",
        "--nerf.sample_intvs=384",
        "--train_schedule.n_voxel_init=110592",
        "--train_schedule.n_voxel_final=4096000",
        "--train_schedule.upsample_iters=[600,1200,1800]",
        "--train_schedule.update_alphamask_iters=[2000]",
        "--max_iter=3000"])
    data = load_dataset(opt, "train")
    tr = Trainer(opt, data, data)
    ckpt_lib.restore_checkpoint(f"{OUT}/model.ckpt.npz", tr)
    field = tr.state.params.field
    H, W = tr.H, tr.W

    rcfg = RenderConfig(n_samples=tr.n_samples, is_train=True,
                        white_bg=True, stop_coord_grad=False)
    blur = test_sched = None
    if args.blur:
        blur = BlurSpec(mode="uniform-gaussian",
                        kernel_size=int(opt.get("c2f_kernel_size", 16)))
        test_sched = [0.3, 0.15, 0.05, 0.0, 0.0]
    optimize = make_test_time_optimizer(
        tr.vm_cfg, rcfg, tr.head, H, W, n_rays=1024,
        test_iter=args.test_iter, lr_init=args.lr, lr_end=args.lr_end,
        blur=blur, test_kernel_schedule=test_sched)

    near_far = jnp.asarray(tr._near_far(), jnp.float32)
    gt_poses = jnp.asarray(data.poses)
    intr = jnp.asarray(data.intr)
    intr_inv = jnp.asarray(data.intr_inv)
    images = jnp.asarray(data.images.reshape(data.n_views, 3, -1)
                         .transpose(0, 2, 1))

    rng = np.random.default_rng(0)
    rot_errs, trans_errs = [], []
    for v in range(args.n_probe_views):
        noise = jnp.asarray(rng.normal(size=(1, 6)) * args.noise, jnp.float32)
        noisy = pose_ops.compose([lie.se3_to_SE3(noise), gt_poses[v][None]])[0]
        r0 = float(jnp.rad2deg(lie.rotation_distance(
            noisy[:3, :3][None], gt_poses[v][:3, :3][None]))[0])
        t0 = time.time()
        rec, last_loss = optimize(field, tr.alpha_mask, noisy, images[v],
                                  intr[v], intr_inv[v], near_far,
                                  jax.random.PRNGKey(v))
        r = float(jnp.rad2deg(lie.rotation_distance(
            rec[:3, :3][None], gt_poses[v][:3, :3][None]))[0])
        # camera-center translation error (align.py convention)
        c_rec = -rec[:3, :3].T @ rec[:3, 3]
        c_gt = -gt_poses[v][:3, :3].T @ gt_poses[v][:3, 3]
        t = float(jnp.linalg.norm(c_rec - c_gt))
        rot_errs.append(r)
        trans_errs.append(t)
        print(f"view {v:2d}: init rot {r0:6.2f} deg -> recovered "
              f"rot {r:7.4f} deg  trans {t:.5f}  "
              f"(loss {last_loss:.5f}, {time.time()-t0:.0f}s)", flush=True)

    print(f"mean: rot {np.mean(rot_errs):.4f} deg  "
          f"trans {np.mean(trans_errs):.5f}  "
          f"median rot {np.median(rot_errs):.4f} deg")


if __name__ == "__main__":
    main()
