"""Mid-window NaN detection (VERDICT round-2 weakness #7).

The trainer checks metrics only at log points (per-iteration host syncs
would serialize pipelined dispatch on TPU), but it latches EVERY
iteration's device-side metrics in between: a NaN injected at iteration
N+1 must surface at the next log point carrying iteration N+1 — not the
log-point iteration, and not never (the reference asserts per-iteration,
base.py:183-184; the round-2 build only checked the log-point loss).
"""
import os

import numpy as np
import pytest

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _trainer():
    from joint_tensorf_tpu.train.trainer import Trainer

    opt = set_options(os.path.join(REPO, "configs",
                                   "bat_synthetic_small.yaml"), [
        "--max_iter=40", "--data.image_size=[32,32]", "--data.n_views=4",
        "--train_schedule.n_voxel_init=4096",
        "--train_schedule.n_voxel_final=32768",
        "--train_schedule.upsample_iters=[]",
        "--train_schedule.update_alphamask_iters=[]",
        "--nerf.sample_intvs=32",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--c2f_kernel_size=8", "--blur_2d_c2f_kernel_size=15",
        "--seed=0",
    ])
    scene = load_dataset(opt, "train")
    return Trainer(opt, scene)


def test_mid_window_nan_surfaces_with_its_iteration():
    tr = _trainer()
    tr.run(max_iter=10, log_every=10)         # healthy warmup through it=9

    # poison the supervision images (every blur-cache entry — the step reads
    # current_images, reassigned per iteration from the cache): the NEXT
    # iteration's loss is non-finite
    import jax.numpy as jnp
    bad = jnp.asarray(np.full(np.asarray(tr.images_sharp).shape, np.nan,
                              np.float32))
    tr.images_sharp = bad
    tr.blurred_images = {k: bad for k in tr.blurred_images}
    tr.current_images = bad
    poisoned_at = tr.it                        # first iteration that sees NaN

    with pytest.raises(FloatingPointError) as exc:
        tr.run(max_iter=40, log_every=10)      # next log point is it=20
    msg = str(exc.value)
    # the error names the first bad iteration (the mid-window one), not
    # merely the log point where it was detected
    assert f"at it {poisoned_at} " in msg, msg
    assert "detected at log point" in msg


def test_healthy_run_does_not_trip_the_latch():
    tr = _trainer()
    hist = tr.run(max_iter=25, log_every=10)
    assert all(np.isfinite(h["loss"]) for h in hist)
