"""End-to-end smoke tests: tiny synthetic scene, a few training iterations
crossing every phase transition (upsample, alpha-mask build + bbox shrink)."""
import os

import numpy as np
import pytest

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset
from joint_tensorf_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_opt(model="bat"):
    cfg = os.path.join(REPO, "configs",
                       "bat_synthetic_small.yaml" if model == "bat"
                       else "tensorf_synthetic_small.yaml")
    overrides = [
        "--max_iter=25",
        "--data.image_size=[48,48]",
        "--data.n_views=6",
        "--train_schedule.n_voxel_init=32768",     # 32^3
        "--train_schedule.n_voxel_final=110592",   # 48^3
        "--train_schedule.upsample_iters=[10]",
        "--train_schedule.update_alphamask_iters=[20]",
        "--nerf.sample_intvs=64",
    ]
    if model == "bat":
        overrides += [
            "--train_schedule.n_rays_init=256",
            "--train_schedule.n_rays_rest=256",
            "--c2f_kernel_size=8",
            "--blur_2d_c2f_kernel_size=15",
        ]
    else:
        overrides += ["--nerf.n_rays=256"]
    return set_options(cfg, overrides)


@pytest.fixture(scope="module")
def scene():
    opt = tiny_opt("tensorf")
    return load_dataset(opt, "train")


def test_tensorf_smoke(scene):
    opt = tiny_opt("tensorf")
    tr = Trainer(opt, scene)
    res0 = list(tr.resolution)
    hist = tr.run(max_iter=25, log_every=5)
    assert len(hist) > 0
    assert all(np.isfinite(h["loss"]) for h in hist)
    # upsample happened at it=10
    assert tr.resolution != res0
    # alpha mask built at it=20
    assert tr.alpha_mask is not None
    # bbox shrink keeps aabb inside the original scene bbox
    aabb = np.asarray(tr.state.params.field.aabb)
    assert (aabb[0] >= -1.5 - 1e-4).all() and (aabb[1] <= 1.5 + 1e-4).all()


def test_bat_smoke(scene):
    opt = tiny_opt("bat")
    tr = Trainer(opt, scene)
    assert tr.pose_noise is not None
    hist = tr.run(max_iter=25, log_every=5)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # pose table got gradients (non-zero after optimization)
    se3 = np.asarray(tr.state.params.se3_refine)
    assert np.abs(se3).max() > 0
    err = tr.pose_error()
    assert np.isfinite(err["rot_deg"]) and np.isfinite(err["trans"])


def test_validation_render(scene):
    opt = tiny_opt("tensorf")
    tr = Trainer(opt, scene)
    tr.run(max_iter=3, log_every=1)
    out = tr.validate(scene, align=False)
    assert np.isfinite(out["psnr"])
    assert out["rgb"].shape == (scene.n_views, 48 * 48, 3)
