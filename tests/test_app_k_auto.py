"""app_k auto-raise (VERDICT round-2 #6): the training-time appearance cap
must follow the measured weight-gate counts instead of silently clipping.
"""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.config import set_options
from joint_tensorf_tpu.data import load_dataset
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _opt():
    cfg = os.path.join(REPO, "configs", "bat_synthetic_small.yaml")
    return set_options(cfg, [
        "--max_iter=25",
        "--data.image_size=[48,48]",
        "--data.n_views=6",
        "--train_schedule.n_voxel_init=32768",
        "--train_schedule.n_voxel_final=110592",
        "--train_schedule.upsample_iters=[10]",
        "--train_schedule.update_alphamask_iters=[20]",
        # S must exceed the base cap (64) for a raise to be possible
        "--nerf.sample_intvs=128",
        "--train_schedule.n_rays_init=256",
        "--train_schedule.n_rays_rest=256",
        "--c2f_kernel_size=8",
        "--blur_2d_c2f_kernel_size=15",
    ])


def _trainer_with_mask():
    opt = _opt()
    scene = load_dataset(opt, "train")
    tr = Trainer(opt, scene)
    tr.run(max_iter=21, log_every=10)       # crosses the alphamask build
    assert tr.alpha_mask is not None
    return tr


def _set_uniform_density(tr, value):
    """Constant density feature everywhere (planes carry it, lines = 1)."""
    field = tr.state.params.field
    new = dataclasses.replace(
        field,
        density_planes=[p * 0 + value for p in field.density_planes],
        density_lines=[l * 0 + 1.0 / 3.0 for l in field.density_lines])
    tr.state = dataclasses.replace(
        tr.state, params=dataclasses.replace(tr.state.params, field=new))


def _all_alive_mask(tr):
    grid = jnp.ones_like(tr.alpha_mask.grid)
    tr.alpha_mask = AlphaMask(grid=grid, aabb=tr.alpha_mask.aabb,
                              packed=pack_neighborhoods(grid))


def test_auto_raise_follows_gate_counts():
    tr = _trainer_with_mask()
    base = int(tr.opt.tpu.app_k)
    assert tr.n_samples > base

    # a translucent uniform field: small alpha per sample -> transmittance
    # decays slowly -> far more than `base` samples pass the weight gate.
    # Per-plane 0.35 with lines 1/3 -> total feature 3*16*0.35/3 = 5.6 ->
    # softplus(5.6 - 10) ~= 0.012 sigma -> alpha ~1% per sample.
    _set_uniform_density(tr, 0.35)
    _all_alive_mask(tr)
    tr.app_k_dyn = None                     # re-probe from the base cap
    k = tr._probe_app_k()
    assert k is not None and k > base and k % 64 == 0
    assert k <= int(tr.opt.tpu.get("app_k_max", 256))

    # the raised cap must reach the jitted step config
    tr.app_k_dyn = k
    tr._step_cfg = None
    tr._ensure_step(strategy="per_view", n_rays=8, blur_active=False,
                    grid_hw=None)
    assert tr._step_cfg.app_k == k

    # disabled -> keep the configured cap
    tr.opt.tpu.app_k_auto = False
    assert tr._probe_app_k() is None


def test_auto_raise_no_op_on_sparse_field():
    tr = _trainer_with_mask()
    # nothing passes the gate -> the configured cap already covers it
    _set_uniform_density(tr, -30.0)
    tr.app_k_dyn = None
    assert tr._probe_app_k() is None


def test_probe_never_lowers_below_base_when_samples_few():
    """VERDICT round-3 #6: with S < app_k the old probe returned min(k, S)
    < base while printing "raising to {S}" and triggered a pointless
    recompile (the renderer already clamps K2 = min(app_k, S)); the probe
    must keep the configured cap (return None) in that regime."""
    tr = _trainer_with_mask()
    base = int(tr.opt.tpu.app_k)
    tr.n_samples = base // 2                # S < base, the MULTICHIP_r03 tail
    _set_uniform_density(tr, 0.35)          # dense gate counts (all <= S)
    _all_alive_mask(tr)
    tr.app_k_dyn = None
    assert tr._probe_app_k() is None
