"""Capped-resolution alpha-mask builds (ADVICE round-4 high).

The reference skips the alpha-mask update entirely once the grid passes
256^3 (tensorf.py:482) — at its own Blender headline config that means no
culling, no compaction, no shrink after it 9000.  The TPU build instead
builds the mask at a capped resolution (models/alpha_mask.capped_mask_res)
so the compaction machinery stays engaged at Blender scale; the bbox
shrink remains reference-gated.  These tests drive the capped path at toy
scale via ``tpu.mask_cap_voxels``.
"""
import os

import numpy as np

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset
from joint_tensorf_tpu.models.alpha_mask import capped_mask_res
from joint_tensorf_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capped_mask_res_values():
    # below the cap: unchanged
    assert capped_mask_res([100, 100, 100]) == [100, 100, 100]
    # reference headline scale: 400^3 -> isotropic scale-down under 256^3
    r = capped_mask_res([400, 400, 400])
    assert r[0] == r[1] == r[2]
    assert r[0] * r[1] * r[2] <= 256 ** 3
    assert r[0] >= 250  # (256^3/400^3)^(1/3) * 400 = 256 -> int() floor
    # anisotropic grids keep their aspect
    r = capped_mask_res([800, 400, 200], cap_voxels=8 * 10 ** 6)
    assert r[0] * r[1] * r[2] <= 8 * 10 ** 6
    assert abs(r[0] / r[1] - 2.0) < 0.05 and abs(r[1] / r[2] - 2.0) < 0.05


def _opt(extra):
    cfg = os.path.join(REPO, "configs", "bat_synthetic_small.yaml")
    return set_options(cfg, [
        "--max_iter=40",
        "--data.image_size=[48,48]",
        "--data.n_views=6",
        "--train_schedule.n_voxel_init=32768",       # 32^3
        "--train_schedule.n_voxel_final=110592",     # 48^3
        "--train_schedule.upsample_iters=[4]",
        "--train_schedule.update_alphamask_iters=[8]",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--c2f_kernel_size=8",
        "--blur_2d_c2f_kernel_size=15",
        "--nerf.sample_intvs=64",
    ] + extra)


def test_update_alphamask_capped_builds_mask_and_skips_shrink():
    # cap below the final 48^3 = 110592 volume: the scheduled update at it 8
    # must still build a mask (at a capped res) but must NOT shrink
    opt = _opt(["--tpu.mask_cap_voxels=27000"])   # 30^3
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    aabb_before = np.asarray(tr.state.params.field.aabb).copy()
    tr.run(max_iter=12, log_every=100)
    assert tr.alpha_mask is not None, "capped update must still build a mask"
    mres = tr.alphamask_resolution
    assert mres[0] * mres[1] * mres[2] <= 27000
    assert mres[0] < tr.resolution[0]
    # shrink is reference-gated: skipped on the capped path
    np.testing.assert_array_equal(
        np.asarray(tr.state.params.field.aabb), aabb_before)
    assert list(tr.resolution) == [48, 48, 48]


def test_update_alphamask_cap_disabled_restores_reference_skip():
    opt = _opt(["--tpu.mask_cap_voxels=27000", "--tpu.mask_res_cap!"])
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    tr.run(max_iter=12, log_every=100)
    assert tr.alpha_mask is None, \
        "mask_res_cap off must reproduce the reference's skip"


def test_blur_mask_refresh_builds_at_capped_res():
    # blur active through it 12 (anneals at progress 0.3 of max_iter 40),
    # final res from it 4; cap below the final 48^3 volume: the refresh
    # must build its dilated mask at the capped res (and still probe)
    opt = _opt(["--tpu.mask_cap_voxels=27000", "--tpu.blur_mask_refresh=3",
                "--max_iter=40"])
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    tr.run(max_iter=10, log_every=100)
    assert tr._blur_mask_built_at is not None, \
        "blur-mask refresh never ran under the cap"
    if tr.alpha_mask_blur is not None:
        g = tr.alpha_mask_blur.grid
        assert g.shape[0] * g.shape[1] * g.shape[2] <= 27000


def test_app_k_dense_only_drops_cap_at_mask_compacted_phase():
    """tpu.app_k_dense_only: the appearance cap applies to dense/early
    phases but is dropped (None -> fused exact appearance) once MASK
    compaction is active (trainer._ensure_step)."""
    # S=256 so the compaction probe has room to engage (its K floor is
    # 128; at the default S=64 it always declines and the test is vacuous)
    opt = _opt(["--tpu.app_k_dense_only", "--nerf.sample_intvs=256"])
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    tr.run(max_iter=6, log_every=100)          # pre-mask: cap in force
    assert tr._step_cfg.app_k is not None
    tr.run(max_iter=16, log_every=100)         # alphamask at it 8; the
    # c2f blur anneals to zero at progress 0.3 = it 12 (cap applies only
    # to blur-free mask-compacted steps)
    assert tr.alpha_mask is not None
    assert tr.compact_k is not None, \
        "compaction did not engage; raise S or loosen the scene"
    assert tr._step_cfg.app_k is None, \
        "cap must drop at the mask-compacted phase"
    # control: default keeps the cap everywhere
    opt2 = _opt(["--nerf.sample_intvs=256"])
    tr2 = Trainer(opt2, load_dataset(opt2, "train"))
    tr2.run(max_iter=16, log_every=100)
    assert tr2._step_cfg.app_k is not None
