"""Determinism: identical seeds must reproduce identical training runs.

SURVEY.md §5.2 makes bitwise determinism a north-star requirement (the
reference merely seeds RNGs and hopes, options.py:112-118; it even carries a
known non-deterministic NaN-ray retry, nerf.py:701).  Here every randomized
schedule draw comes from one host-side seeded generator and every traced
random op from threaded jax PRNG keys, so two trainers with the same config
must agree bit-for-bit — losses AND parameters.
"""
import os

import numpy as np

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bat_opt(seed=0):
    return set_options(os.path.join(REPO, "configs",
                                    "bat_synthetic_small.yaml"), [
        "--max_iter=15", "--data.image_size=[32,32]", "--data.n_views=4",
        "--train_schedule.n_voxel_init=4096",
        "--train_schedule.n_voxel_final=32768",
        "--train_schedule.upsample_iters=[6]",
        "--train_schedule.update_alphamask_iters=[10]",
        "--nerf.sample_intvs=32",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--c2f_kernel_size=8", "--blur_2d_c2f_kernel_size=15",
        f"--seed={seed}",
    ])


def _run(seed=0):
    from joint_tensorf_tpu.train.trainer import Trainer

    opt = _bat_opt(seed)
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    hist = tr.run(max_iter=15, log_every=1)
    return [h["loss"] for h in hist], tr.state


def test_same_seed_is_bitwise_identical():
    losses1, state1 = _run(seed=0)
    losses2, state2 = _run(seed=0)
    # losses agree exactly at every logged step (crosses an upsample AND an
    # alpha-mask build, so phase transitions are covered too)
    assert losses1 == losses2
    import jax

    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_diverges():
    losses1, _ = _run(seed=0)
    losses3, _ = _run(seed=1)
    assert losses1 != losses3   # seed actually reaches the randomness
