"""End-to-end planar 2D alignment tests (the reference's fast feedback loop,
SURVEY.md §4: train_2d.py + planar_bat.yaml validates the core blur-widens-
the-basin hypothesis on a single image in minutes; here shrunk to seconds).
"""
import os

import numpy as np
import pytest

from joint_tensorf_tpu.config import set_options

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def planar_opt(model, extra=()):
    cfg = {"planar_svd": "planar_bat.yaml",
           "planar_fft": "planar_fft.yaml",
           "planar": "planar_barf.yaml"}[model]
    overrides = [
        "--max_iter=40", "--batch_size=3",
        "--data.image_size=[48,64]", "--data.patch_crop=[24,24]",
        "--warp.noise_h=0.05", "--warp.noise_t=0.1",
        "--freq.scalar=10",
    ]
    if model == "planar_svd":
        overrides += ["--arch.resolution=[64,64]", "--arch.max_ranks=12",
                      "--arch.kernel_size=16",
                      "--c2f_schedule.rank=[12]",
                      "--c2f_schedule.kernel_t=[8,4,0,0]"]
    elif model == "planar_fft":
        # shrink the blur kernel with the image: the inherited 256-tap
        # kernel and kernel_t=[128,...] schedule are sized for 400x400
        overrides += ["--arch.resolution=[32,32]", "--arch.kernel_size=8",
                      "--c2f_schedule.kernel_t=[4,2,0,0]"]
    return set_options(os.path.join(REPO, "configs", cfg),
                       list(overrides) + list(extra))


@pytest.mark.parametrize("model", ["planar_svd", "planar_fft"])
def test_planar_trainer_runs_and_learns(model):
    from joint_tensorf_tpu.train.planar_trainer import PlanarTrainer

    tr = PlanarTrainer(planar_opt(model))
    hist = tr.run(log_every=10)
    assert len(hist) >= 3
    losses = [h["loss"] for h in hist]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]            # reconstruction improves
    # first warp stays pinned to zero (planar.py:87-88)
    assert np.allclose(np.asarray(tr.params["warp"])[0], 0.0, atol=1e-7)
    img = tr.predict_entire_image()
    assert img.shape == (48, 64, 3) and np.isfinite(img).all()


def test_planar_svd_warp_error_converges():
    """Joint content+warp optimization must recover the known perturbations
    (the reference's warp_error metric, planar.py:161).  The healthy
    trajectory rises first while the content image forms, peaks, then
    descends into the basin — we assert the descent (final error well under
    the peak and under the starting error)."""
    from joint_tensorf_tpu.train.planar_trainer import PlanarTrainer

    tr = PlanarTrainer(planar_opt(
        "planar_svd",
        extra=["--max_iter=1500", "--warp.noise_h=0.02",
               "--warp.noise_t=0.05",
               "--c2f_schedule.kernel_t=[8,6,4,2,0,0,0,0]"]))
    e0 = tr.warp_error()
    hist = tr.run(log_every=150)
    errs = [h["warp_error"] for h in hist]
    e1 = tr.warp_error()
    assert np.isfinite(e1)
    assert e1 < 0.35 * max(errs)   # descended well off the peak
    assert e1 < e0                 # and past the starting error
