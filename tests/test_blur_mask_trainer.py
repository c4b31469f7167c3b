"""Trainer-level guarantees of the blur-mask culling perf feature.

1. RNG isolation: the blur-mask refresh (dense alpha eval + dilate +
   compact-K probe) runs on its own RNG stream, so when the probe returns
   None (no culling engaged — at S < 129 the round-up-to-128 floor forces
   this) the training trajectory is BITWISE identical to a run with the
   feature disabled.  A perf feature must never perturb the protocol.
2. The refresh actually runs in that setting (mask built, probe executed).
"""
import os

import numpy as np
import pytest

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset
from joint_tensorf_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def opt_with(extra):
    cfg = os.path.join(REPO, "configs", "bat_synthetic_small.yaml")
    overrides = [
        "--max_iter=40",   # blur anneals at progress 0.3 = it 12
        "--data.image_size=[48,48]",
        "--data.n_views=6",
        "--train_schedule.n_voxel_init=32768",
        "--train_schedule.n_voxel_final=110592",
        "--train_schedule.upsample_iters=[4]",
        "--train_schedule.update_alphamask_iters=[100]",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--c2f_kernel_size=8",
        "--blur_2d_c2f_kernel_size=15",
        "--nerf.sample_intvs=64",          # S < 129: probe must return None
        "--tpu.blur_mask_refresh=3",
    ] + extra
    return set_options(cfg, overrides)


@pytest.fixture(scope="module")
def scene():
    return load_dataset(opt_with([]), "train")


def run_n(opt, scene, n=14):
    tr = Trainer(opt, scene)
    hist = tr.run(max_iter=n, log_every=2)
    return tr, hist


def test_probe_none_leaves_training_bitwise_identical(scene):
    tr_on, hist_on = run_n(opt_with([]), scene)
    tr_off, hist_off = run_n(opt_with(["--tpu.blur_mask_compact!"]), scene)

    # the feature engaged its refresh path in the ON run...
    assert tr_on._blur_mask_built_at is not None, \
        "refresh never ran — the test's activation conditions are stale"
    # ...but the 128-floor forced the probe to decline culling
    assert tr_on.compact_k_blur is None
    assert tr_off._blur_mask_built_at is None

    for h_on, h_off in zip(hist_on, hist_off):
        for k in h_on:
            if k in ("wall",):
                continue
            a, b = h_on[k], h_off[k]
            assert np.asarray(a == b).all(), (
                f"metric {k} diverged: {a} vs {b} — the blur-mask probe "
                f"perturbed the training stream")
