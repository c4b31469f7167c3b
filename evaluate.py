#!/usr/bin/env python
"""Evaluation CLI (the reference's evaluate path, train_3d.py:88-107 +
bat.Model.evaluate_full / nerf.Model.evaluate_full).

Usage:
    python evaluate.py --yaml=configs/bat_blender_VM.yaml \
        [--ckpt=output/<group>/<name>/model.ckpt.npz] [--k=v ...]

Pipeline: restore checkpoint -> pose-error metrics (sim3-aligned) ->
per-test-view test-time photometric pose optimization -> full renders ->
PSNR/SSIM(/LPIPS if available) -> quant files.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys


def main(argv):
    yaml_path, ckpt_path, rest = None, None, []
    for a in argv:
        if a.startswith("--yaml="):
            yaml_path = a.split("=", 1)[1]
        elif a.startswith("--ckpt="):
            ckpt_path = a.split("=", 1)[1]
        else:
            rest.append(a)
    assert yaml_path, "usage: python evaluate.py --yaml=<cfg> [--ckpt=...]"

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.utils import setup_jax
    setup_jax()
    opt = set_options(yaml_path, rest)

    out_dir = os.path.join(opt.get("output_root", "output"),
                           str(opt.get("group", "default")),
                           str(opt.get("name", "run")))
    ckpt_path = ckpt_path or os.path.join(out_dir, "model.ckpt.npz")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.geometry import align as align_lib
    from joint_tensorf_tpu.metrics import psnr, ssim, lpips_fn
    from joint_tensorf_tpu.pose import make_test_time_optimizer
    from joint_tensorf_tpu.train.checkpoint import (
        restore_checkpoint, restore_simple_checkpoint)
    is_mlp_nerf = opt.model in ("barf", "nerf")
    if is_mlp_nerf:
        from joint_tensorf_tpu.train.barf_trainer import BarfTrainer as Trainer
        restore_fn = restore_simple_checkpoint
    elif opt.model == "l2g_bat":
        from joint_tensorf_tpu.train.l2g_trainer import L2GTrainer as Trainer
        restore_fn = restore_checkpoint
    else:
        from joint_tensorf_tpu.train.trainer import Trainer
        restore_fn = restore_checkpoint

    train_data = load_dataset(opt, "train", subset=opt.data.get("train_sub"))
    try:
        test_data = load_dataset(opt, "test", subset=opt.data.get("test_sub"))
    except FileNotFoundError:
        # test split absent on disk -> fall back to val (LLFF-style datasets
        # name the held-out frames "val"); other loader errors propagate
        test_data = load_dataset(opt, "val", subset=opt.data.get("val_sub"))

    trainer = Trainer(opt, train_data)
    restore_fn(ckpt_path, trainer)
    print(f"[ckpt] restored it={trainer.it}"
          + (f" res={trainer.resolution}" if hasattr(trainer, "resolution")
             else ""))

    pose_optimizing = (getattr(trainer, "is_bat", False)
                       or getattr(trainer, "is_barf", False))
    results = {"iters": trainer.it}
    if pose_optimizing:
        err = trainer.pose_error()
        results.update(err)
        print("--------------------------")
        print("rot:   {:8.3f}".format(err["rot_deg"]))
        print("trans: {:10.5f}".format(err["trans"]))
        print("--------------------------")
        pose, pose_GT = trainer.get_all_training_poses()
        _, sim3 = align_lib.prealign_cameras(pose, pose_GT)
        test_pose = align_lib.align_test_pose(jnp.asarray(test_data.poses),
                                              sim3)
        with open(os.path.join(out_dir, "quant_pose.txt"), "w") as f:
            aligned, _ = align_lib.prealign_cameras(pose, pose_GT)
            r_err, t_err = align_lib.evaluate_camera_alignment(aligned, pose_GT)
            for i, (r, t) in enumerate(zip(np.asarray(r_err),
                                           np.asarray(t_err))):
                f.write(f"{i} {r} {t}\n")
        try:
            from joint_tensorf_tpu.viz.poses_plot import plot_poses_3d
            plot_poses_3d(os.path.join(out_dir, "poses.png"),
                          np.asarray(aligned), np.asarray(pose_GT),
                          title=f"aligned vs GT (it={trainer.it})")
        except Exception as e:
            print(f"[vis] pose plot skipped: {e}")
    else:
        test_pose = jnp.asarray(test_data.poses)

    # ---- test-time photometric pose optimization (barf.py:162 / bat.py:265)
    if is_mlp_nerf and getattr(trainer, "is_barf", False) and \
            opt.optim.get("test_photo", False):
        from joint_tensorf_tpu.pose.test_optim import (
            make_barf_test_time_optimizer)
        optimize = make_barf_test_time_optimizer(
            trainer.mlp_cfg, opt, test_data.H, test_data.W,
            n_rays=int(opt.nerf.n_rays),
            test_iter=int(opt.optim.test_iter),
            lr=float(opt.optim.lr_pose),
            ndc=bool(opt.camera.get("ndc", False)))
        key = jax.random.PRNGKey(int(opt.get("seed", 0)) + 7)
        images_flat = jnp.asarray(
            test_data.images.reshape(test_data.n_views, 3, -1)
            .transpose(0, 2, 1))
        refined = []
        for i in range(test_data.n_views):
            key, k = jax.random.split(key)
            p, loss = optimize(trainer.params, test_pose[i], images_flat[i],
                               jnp.asarray(test_data.intr[i]),
                               jnp.asarray(test_data.intr_inv[i]),
                               trainer.near_far, k)
            refined.append(p)
            print(f"[test-optim] view {i}: final loss {loss:.5f}")
        test_pose = jnp.stack(refined)
    elif (not is_mlp_nerf) and trainer.is_bat and \
            opt.optim.get("test_photo", False):
        from joint_tensorf_tpu.render.renderer import RenderConfig
        rcfg = RenderConfig(
            n_samples=trainer.n_samples, is_train=True,
            white_bg=bool(opt.nerf.get("setbg_opaque", True)),
            ndc=bool(opt.camera.get("ndc", False)),
            use_alpha_mask=trainer.alpha_mask is not None,
            stop_coord_grad=False)
        is_llff = opt.data.dataset == "llff"
        test_sched = (opt.optim.get("test_kernel_schedule")
                      if is_llff else None)
        blur = None
        if test_sched and max(test_sched) > 1e-3:
            from joint_tensorf_tpu.render.renderer import BlurSpec
            blur = BlurSpec(mode="uniform-gaussian",
                            kernel_size=int(opt.c2f_kernel_size))
        optimize = make_test_time_optimizer(
            trainer.vm_cfg, rcfg, trainer.head, test_data.H, test_data.W,
            n_rays=trainer._n_rays(), test_iter=int(opt.optim.test_iter),
            lr_init=float(opt.optim.lr_pose_test),
            lr_end=float(opt.optim.lr_pose_test_end), blur=blur,
            test_kernel_schedule=test_sched,
            ndc=bool(opt.camera.get("ndc", False)))
        key = jax.random.PRNGKey(int(opt.get("seed", 0)) + 7)
        images_flat = jnp.asarray(
            test_data.images.reshape(test_data.n_views, 3, -1)
            .transpose(0, 2, 1))
        near_far = jnp.asarray(trainer._near_far(), jnp.float32)
        refined = []
        for i in range(test_data.n_views):
            key, k = jax.random.split(key)
            p, loss = optimize(trainer.state.params.field, trainer.alpha_mask,
                               test_pose[i], images_flat[i],
                               jnp.asarray(test_data.intr[i]),
                               jnp.asarray(test_data.intr_inv[i]), near_far, k)
            refined.append(p)
            print(f"[test-optim] view {i}: final loss {loss:.5f}")
        test_pose = jnp.stack(refined)

    # ---- full renders + metrics
    if hasattr(trainer, "eval_clip_stats"):
        clip = trainer.eval_clip_stats(test_pose,
                                       jnp.asarray(test_data.intr_inv))
        results["clip_stats"] = clip
        if clip["compact_clip_rate"] > 0 or clip["app_k_clip_rate"] > 0:
            print(f"[eval] WARNING static-cap clipping: {clip}")
        else:
            print(f"[eval] compaction caps exact on probe rays: {clip}")
    rgb, depth, opacity = trainer.render_views(
        test_pose, jnp.asarray(test_data.intr),
        jnp.asarray(test_data.intr_inv))
    V, H, W = test_data.n_views, test_data.H, test_data.W
    target = jnp.asarray(test_data.images.reshape(V, 3, -1).transpose(0, 2, 1))

    lp = lpips_fn()
    per_view = []
    for i in range(V):
        p = float(psnr(rgb[i], target[i]))
        s = float(ssim(rgb[i].reshape(H, W, 3), target[i].reshape(H, W, 3)))
        row = {"view": i, "psnr": p, "ssim": s}
        if lp is not None:
            row["lpips"] = lp(np.asarray(rgb[i].reshape(H, W, 3)),
                              np.asarray(target[i].reshape(H, W, 3)))
        per_view.append(row)
        print(f"[eval] view {i}: PSNR {p:.2f} SSIM {s:.4f}")

    results["psnr"] = float(np.mean([r["psnr"] for r in per_view]))
    results["ssim"] = float(np.mean([r["ssim"] for r in per_view]))
    if lp is not None:
        results["lpips"] = float(np.mean([r["lpips"] for r in per_view]))
    else:
        results["lpips_note"] = ("unavailable: lpips/torch import failed "
                                 "(see stderr)")

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "quant.txt"), "w") as f:
        for r in per_view:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(out_dir, "quant_eval.json"), "w") as f:
        json.dump(results, f, indent=2)
    # push final metrics to the wandb run summary like the reference
    # (bat.py:252-253, nerf.py:564-566)
    from joint_tensorf_tpu.utils.logging import MetricLogger
    logger = MetricLogger(out_dir, opt)
    logger.summary(results)
    logger.close()
    print("[done]", json.dumps(results))

    # ---- novel-view synthesis video (nerf.py:575 / camera.py:380)
    if opt.get("generate_video", True):
        from joint_tensorf_tpu.viz.novel_views import novel_view_around_bbox
        from joint_tensorf_tpu.viz.video import write_video

        n_frames = int(opt.get("video_n_frames", 60))
        novel = novel_view_around_bbox(opt.data.scene_bbox, n=n_frames)
        intr0 = jnp.broadcast_to(jnp.asarray(test_data.intr[0]),
                                 (n_frames, 3, 3))
        intr0_inv = jnp.broadcast_to(jnp.asarray(test_data.intr_inv[0]),
                                     (n_frames, 3, 3))
        rgb_nv, _, _ = trainer.render_views(novel, intr0, intr0_inv)
        frames = [np.asarray(rgb_nv[i].reshape(H, W, 3))
                  for i in range(n_frames)]
        vid_path = write_video(os.path.join(out_dir, "novel_views.mp4"),
                               frames, fps=15)
        print(f"[video] wrote {vid_path}")

    # ---- pose-trajectory video over per-iter snapshots (barf.py:198-245)
    if pose_optimizing and opt.get("generate_pose_video", True):
        from joint_tensorf_tpu.viz.pose_video import generate_pose_video
        try:
            vid = generate_pose_video(out_dir, trainer, restore_fn)
        except Exception as e:
            vid = None
            print(f"[video] pose video failed: {e}")
        if vid:
            print(f"[video] wrote {vid}")
            restore_fn(ckpt_path, trainer)  # back to the final state
        else:
            print("[video] no per-iter snapshots; pose video skipped "
                  "(set freq.ckpt to record them)")

    # ---- save renders
    vis_dir = os.path.join(out_dir, "test_renders")
    os.makedirs(vis_dir, exist_ok=True)
    try:
        import imageio.v2 as imageio
        for i in range(min(V, 8)):
            img = np.asarray(rgb[i].reshape(H, W, 3))
            imageio.imwrite(os.path.join(vis_dir, f"rgb_{i}.png"),
                            (img * 255).astype(np.uint8))
    except Exception as e:
        print(f"[vis] skipped image dump: {e}")


if __name__ == "__main__":
    from joint_tensorf_tpu.utils import run_cli

    run_cli(main, sys.argv[1:])
