"""Engine-level tests: BARF MLP-NeRF, checkpoint roundtrips, planar trainer."""
import os

import numpy as np
import pytest

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def barf_opt():
    return set_options(os.path.join(REPO, "configs", "barf_blender.yaml"), [
        "--max_iter=10", "--data.dataset=synthetic",
        "--data.image_size=[32,32]", "--data.n_views=4",
        "--nerf.sample_intvs=32", "--nerf.n_rays=128", "--camera.noise=0.05",
        "--barf_c2f=[0.1,0.5]",
    ])


def test_barf_trainer_smoke():
    from joint_tensorf_tpu.train.barf_trainer import BarfTrainer

    opt = barf_opt()
    scene = load_dataset(opt, "train")
    tr = BarfTrainer(opt, scene)
    hist = tr.run(max_iter=10, log_every=5)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # pose table moved
    assert np.abs(np.asarray(tr.params.se3_refine)).max() > 0
    err = tr.pose_error()
    assert np.isfinite(err["rot_deg"])
    out = tr.validate(scene, align=True)
    assert np.isfinite(out["psnr"])


def test_simple_checkpoint_roundtrip(tmp_path):
    from joint_tensorf_tpu.train.barf_trainer import BarfTrainer
    from joint_tensorf_tpu.train.checkpoint import (restore_simple_checkpoint,
                                                    save_simple_checkpoint)

    opt = barf_opt()
    scene = load_dataset(opt, "train")
    tr = BarfTrainer(opt, scene)
    tr.run(max_iter=3, log_every=1)
    path = str(tmp_path / "ckpt.npz")
    save_simple_checkpoint(path, tr)

    tr2 = BarfTrainer(opt, scene)
    restore_simple_checkpoint(path, tr2)
    assert tr2.it == tr.it
    np.testing.assert_array_equal(np.asarray(tr2.params.se3_refine),
                                  np.asarray(tr.params.se3_refine))
    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree.leaves(tr.params.mlp)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree.leaves(tr2.params.mlp)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)


def test_barf_test_time_optim_recovers_pose():
    """A perturbed test pose moves back toward the true one under the
    MLP-NeRF test-time photometric optimization (barf.py:162-197)."""
    import jax
    import jax.numpy as jnp

    from joint_tensorf_tpu.geometry import lie, poses as pose_ops
    from joint_tensorf_tpu.pose.test_optim import (
        make_barf_test_time_optimizer)
    from joint_tensorf_tpu.train.barf_trainer import BarfTrainer

    opt = barf_opt()
    scene = load_dataset(opt, "train")
    tr = BarfTrainer(opt, scene)
    tr.run(max_iter=5, log_every=5)

    optimize = make_barf_test_time_optimizer(
        tr.mlp_cfg, opt, scene.H, scene.W, n_rays=128, test_iter=4,
        lr=1e-3)
    true_pose = jnp.asarray(scene.poses[0])
    pert = lie.se3_to_SE3(jnp.full((1, 6), 0.02))
    start = pose_ops.compose([pert, true_pose[None]])[0]
    img = jnp.asarray(scene.images[0].reshape(3, -1).T)
    refined, loss = optimize(tr.params, start, img,
                             jnp.asarray(scene.intr[0]),
                             jnp.asarray(scene.intr_inv[0]),
                             tr.near_far, jax.random.PRNGKey(0))
    assert refined.shape == (3, 4)
    assert np.isfinite(loss)
    # the refinement changed the pose (gradients flow end-to-end)
    assert float(jnp.abs(refined - start).max()) > 0


def test_pose_video_from_snapshots(tmp_path):
    """generate_pose_video builds frames from per-iter snapshots
    (barf.py:198-245) and leaves a playable artifact."""
    from joint_tensorf_tpu.train.barf_trainer import BarfTrainer
    from joint_tensorf_tpu.train.checkpoint import (restore_simple_checkpoint,
                                                    save_simple_checkpoint)
    from joint_tensorf_tpu.viz.pose_video import generate_pose_video

    opt = barf_opt()
    scene = load_dataset(opt, "train")
    tr = BarfTrainer(opt, scene)
    out_dir = str(tmp_path)
    for stop in (2, 4):
        tr.run(max_iter=stop, log_every=2)
        save_simple_checkpoint(
            os.path.join(out_dir, f"model_it{stop}.ckpt.npz"), tr)
    vid = generate_pose_video(out_dir, tr, restore_simple_checkpoint, fps=2)
    assert vid is not None
    assert os.path.exists(vid)
    assert os.path.exists(os.path.join(out_dir, "poses", "2.png"))
    assert os.path.exists(os.path.join(out_dir, "poses", "4.png"))


def test_vm_checkpoint_roundtrip(tmp_path):
    from joint_tensorf_tpu.train.checkpoint import (restore_checkpoint,
                                                    save_checkpoint)
    from joint_tensorf_tpu.train.trainer import Trainer

    opt = set_options(os.path.join(REPO, "configs",
                                   "tensorf_synthetic_small.yaml"), [
        "--max_iter=30", "--data.image_size=[32,32]", "--data.n_views=4",
        "--train_schedule.n_voxel_init=4096",
        "--train_schedule.n_voxel_final=32768",
        "--train_schedule.upsample_iters=[5]",
        "--train_schedule.update_alphamask_iters=[10]",
        "--nerf.sample_intvs=32", "--nerf.n_rays=128",
    ])
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    tr.run(max_iter=12, log_every=5)   # crosses upsample + alphamask/shrink
    path = str(tmp_path / "ckpt.npz")
    from joint_tensorf_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(path, tr)

    tr2 = Trainer(opt, scene)
    restore_checkpoint(path, tr2)
    assert tr2.it == tr.it
    assert tr2.resolution == tr.resolution
    assert (tr2.alpha_mask is None) == (tr.alpha_mask is None)
    a = np.asarray(tr.state.params.field.density_planes[0])
    b = np.asarray(tr2.state.params.field.density_planes[0])
    np.testing.assert_array_equal(a, b)
    # training continues from the restored state without error
    tr2.run(max_iter=14, log_every=1)


def test_async_checkpoint_roundtrip(tmp_path):
    """Async writes (background writer thread) produce byte-equivalent
    checkpoints, are ordered, and drain via wait_for_pending."""
    from joint_tensorf_tpu.train.barf_trainer import BarfTrainer
    from joint_tensorf_tpu.train.checkpoint import (restore_simple_checkpoint,
                                                    save_simple_checkpoint,
                                                    wait_for_pending)

    opt = barf_opt()
    scene = load_dataset(opt, "train")
    tr = BarfTrainer(opt, scene)
    tr.run(max_iter=3, log_every=1)

    path = str(tmp_path / "ckpt.npz")
    snap = str(tmp_path / "ckpt_it3.npz")
    save_simple_checkpoint(path, tr, async_write=True, snapshot_path=snap)
    # queue a second write to the same path: ordering must hold
    save_simple_checkpoint(path, tr, async_write=True)
    wait_for_pending()
    assert os.path.exists(path) and os.path.exists(snap)
    assert not os.path.exists(path + ".tmp.npz")   # atomic rename cleaned up

    tr2 = BarfTrainer(opt, scene)
    restore_simple_checkpoint(path, tr2)
    assert tr2.it == tr.it
    np.testing.assert_array_equal(np.asarray(tr2.params.se3_refine),
                                  np.asarray(tr.params.se3_refine))
