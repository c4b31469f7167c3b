"""Multi-chip sharding tests on the virtual CPU device mesh.

The reference has no intra-job parallelism at all (SURVEY.md §2 parallelism
note, options.py:126); this framework adds a {rays, comp} mesh with
data-parallel rays and component-parallel factor grids (SURVEY.md §5.8).
These tests validate that the sharded train step compiles and executes on
an 8-virtual-device mesh, that the joint pose gradient survives the psum
reduction, and that one sharded step matches the unsharded step numerically.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _tiny_setup
from joint_tensorf_tpu.data.synthetic import sphere_poses
from joint_tensorf_tpu.parallel.mesh import make_mesh
from joint_tensorf_tpu.parallel.sharding import shard_train_step
from joint_tensorf_tpu.render.renderer import BlurSpec
from joint_tensorf_tpu.train.step import StepScalars, make_train_step


def _inputs(cfg):
    n_views, H, W = cfg.n_views, cfg.H, cfg.W
    rng = np.random.default_rng(0)
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 1.2 * W
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    ray_idx = jnp.asarray(rng.permutation(H * W)[:128].astype(np.int64))
    scalars = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.15),
        c2f_color=jnp.float32(0.15), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(8e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(1.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))
    return (pose_base, intr, intr_inv, images, edges, view_sel, ray_idx,
            jax.random.PRNGKey(0), scalars, None)


def test_sharded_step_matches_unsharded():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(shape=(4, 2), axes=("rays", "comp"),
                     devices=devices[:8])

    vm_cfg, head, state, cfg = _tiny_setup()
    cfg = dataclasses.replace(
        cfg, blur=BlurSpec(mode="uniform-gaussian", kernel_size=16))
    args = _inputs(cfg)

    ref_step = make_train_step(cfg, vm_cfg, head)           # single device
    ref_state, ref_metrics = ref_step(state, *args)

    raw_step = make_train_step(cfg, vm_cfg, head, jit=False)
    sharded = shard_train_step(raw_step, mesh, state, shard_components=True)
    with mesh:
        sh_state, sh_metrics = sharded(state, *args)

    assert np.isfinite(float(sh_metrics["loss"]))
    # psum/reduction order differs from the single-device sum -> tolerance
    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-4, atol=1e-6)

    # joint gradient flow reached the (replicated) pose table identically
    ref_se3 = np.asarray(ref_state.params.se3_refine)
    sh_se3 = np.asarray(sh_state.params.se3_refine)
    assert np.abs(sh_se3).max() > 0, "pose parameters did not update"
    np.testing.assert_allclose(sh_se3, ref_se3, rtol=1e-3, atol=1e-6)

    # component-sharded factor grids updated consistently with the
    # replicated reference
    for p_ref, p_sh in zip(ref_state.params.field.density_planes,
                           sh_state.params.field.density_planes):
        np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                                   rtol=1e-3, atol=1e-6)


def _small_bat_opt(extra):
    import os

    from joint_tensorf_tpu.config import set_options

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return set_options(os.path.join(repo, "configs",
                                    "bat_synthetic_small.yaml"), [
        "--max_iter=14", "--data.image_size=[32,32]", "--data.n_views=4",
        "--train_schedule.n_voxel_init=4096",
        "--train_schedule.n_voxel_final=32768",
        "--train_schedule.upsample_iters=[5]",
        "--train_schedule.update_alphamask_iters=[10]",
        "--nerf.sample_intvs=48", "--nerf.n_rays=128",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--c2f_kernel_size=8", "--blur_2d_c2f_kernel_size=15",
    ] + extra)


def test_trainer_sharded_run_matches_unsharded_across_phases():
    """A mesh-integrated Trainer run (tpu.mesh_shape) crossing upsample +
    alphamask phase boundaries tracks the single-device run: identical
    schedules and ray draws, numerics equal up to psum reduction order
    (VERDICT round-1 missing #2)."""
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train.trainer import Trainer

    opt_ref = _small_bat_opt([])
    scene = load_dataset(opt_ref, "train")
    tr_ref = Trainer(opt_ref, scene)
    assert tr_ref.mesh is None
    hist_ref = tr_ref.run(max_iter=14, log_every=2)

    opt_sh = _small_bat_opt(["--tpu.mesh_shape=[4,2]",
                             "--tpu.mesh_axes=[rays,comp]"])
    tr_sh = Trainer(opt_sh, scene)
    assert tr_sh.mesh is not None and tr_sh.shard_components
    hist_sh = tr_sh.run(max_iter=14, log_every=2)

    # both crossed the same phases
    assert tr_sh.resolution == tr_ref.resolution
    assert (tr_sh.alpha_mask is None) == (tr_ref.alpha_mask is None)
    assert tr_sh.compact_k == tr_ref.compact_k

    # per-log-point losses agree to reduction-order tolerance
    for h_ref, h_sh in zip(hist_ref, hist_sh):
        assert h_ref["it"] == h_sh["it"]
        np.testing.assert_allclose(h_sh["loss"], h_ref["loss"],
                                   rtol=5e-2, atol=1e-5)

    # pose tables track each other after 14 joint steps
    se3_ref = np.asarray(tr_ref.state.params.se3_refine)
    se3_sh = np.asarray(tr_sh.state.params.se3_refine)
    assert np.abs(se3_ref).max() > 0
    np.testing.assert_allclose(se3_sh, se3_ref, rtol=0.1, atol=2e-4)

    # the sharded eval render path agrees with the unsharded one on the
    # same field (render_views shards chunks over the rays axis)
    rgb_sh, _, _ = tr_sh.render_views(tr_sh.pose_base[:1], tr_sh.intr[:1],
                                      tr_sh.intr_inv[:1], chunk=256)
    state_backup = tr_ref.state
    tr_ref.state = jax.device_put(tr_sh.state)   # same params, no mesh
    rgb_ref, _, _ = tr_ref.render_views(tr_ref.pose_base[:1],
                                        tr_ref.intr[:1],
                                        tr_ref.intr_inv[:1], chunk=256)
    tr_ref.state = state_backup
    np.testing.assert_allclose(np.asarray(rgb_sh), np.asarray(rgb_ref),
                               rtol=1e-4, atol=1e-5)


def test_l2g_sharded_step_matches_unsharded():
    """The L2G state (extra leaves: warp nets, optimised poses, error map)
    shards via the generic state_sharding (VERDICT round-1 weak #3)."""
    import os

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train.l2g_trainer import L2GTrainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [
        "--data.dataset=synthetic", "--data.image_size=[32,32]",
        "--data.n_views=4", "--max_iter=6",
        "--train_schedule.n_voxel_init=4096",
        "--train_schedule.n_voxel_final=8192",
        "--train_schedule.upsample_iters=[]",
        "--train_schedule.update_alphamask_iters=[]",
        "--train_schedule.n_rays_init=128",
        "--train_schedule.n_rays_rest=128",
        "--nerf.sample_intvs=48", "--c2f_kernel_size=8",
        "--blur_2d_c2f_kernel_size=15", "--error_map_size=8",
        "--+data.scene_bbox=[-1.5,-1.5,-1.5,1.5,1.5,1.5]",
    ]
    opt_ref = set_options(os.path.join(repo, "configs",
                                       "l2g_bat_blender_VM.yaml"), base)
    scene = load_dataset(opt_ref, "train")
    tr_ref = L2GTrainer(opt_ref, scene)
    hist_ref = tr_ref.run(max_iter=4, log_every=1)

    opt_sh = set_options(
        os.path.join(repo, "configs", "l2g_bat_blender_VM.yaml"),
        base + ["--tpu.mesh_shape=[4,2]", "--tpu.mesh_axes=[rays,comp]"])
    tr_sh = L2GTrainer(opt_sh, scene)
    assert tr_sh.mesh is not None
    hist_sh = tr_sh.run(max_iter=4, log_every=1)

    for h_ref, h_sh in zip(hist_ref, hist_sh):
        np.testing.assert_allclose(h_sh["loss"], h_ref["loss"],
                                   rtol=5e-2, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tr_sh.state.optimised_poses),
        np.asarray(tr_ref.state.optimised_poses), rtol=0.05, atol=2e-4)


def test_densify_gate_flips_on_rays_per_chip():
    """BENCH_NOTES scaling-model consequence 2 (VERDICT round-3 #7): the
    dense-grid build replicates per chip, so the densify gate must key on
    SAMPLES PER CHIP — the same config that densifies on one chip falls
    back to the factored path when the rays axis divides its batch below
    the amortization threshold."""
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train.trainer import Trainer

    # threshold chosen between the single-chip count (128*4*~33) and the
    # 4-way-sharded count (/4) so the mesh flips the gate at test scale
    n_rays, n_views = 128, 4
    extra = []
    opt1 = _small_bat_opt(extra)
    scene = load_dataset(opt1, "train")
    tr1 = Trainer(opt1, scene)
    S = tr1.n_samples
    thresh = n_rays * n_views * S // 2       # chip passes, /4 shard fails
    opt1 = _small_bat_opt(
        [f"--tpu.densify_min_samples_per_chip={thresh}"])
    tr1 = Trainer(opt1, scene)
    tr1._ensure_step("per_view", n_rays, blur_active=True, grid_hw=None)
    assert tr1._step_cfg.densify_density, \
        "single chip above threshold must densify"

    opt2 = _small_bat_opt(
        [f"--tpu.densify_min_samples_per_chip={thresh}",
         "--tpu.mesh_shape=[4]", "--tpu.mesh_axes=[rays]"])
    tr2 = Trainer(opt2, scene)
    assert tr2.mesh is not None
    assert tr2._samples_per_chip(n_rays) == n_rays * n_views * S // 4
    tr2._ensure_step("per_view", n_rays, blur_active=True, grid_hw=None)
    assert not tr2._step_cfg.densify_density, \
        "4-way rays sharding drops below threshold -> factored path"


def test_trainer_rays_only_shardmap_matches_unsharded():
    """The rays-only mesh layout routes through the explicit shard_map
    grad transform (parallel.sharding.rays_shardmap_vg) — GSPMD measurably
    replicated this backward when left to propagation alone
    (scripts/psum_volume.py round 5).  Pin that the shard_map run tracks
    the single-device run; jitter is pre-drawn shard-invariantly so the
    trajectories should agree to reduction-order tolerance."""
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train.trainer import Trainer

    opt_ref = _small_bat_opt(["--nerf.n_rays=256",
                              "--train_schedule.n_rays_init=256",
                              "--train_schedule.n_rays_rest=256"])
    scene = load_dataset(opt_ref, "train")
    tr_ref = Trainer(opt_ref, scene)
    hist_ref = tr_ref.run(max_iter=14, log_every=2)

    opt_sh = _small_bat_opt(["--tpu.mesh_shape=[8]",
                             "--tpu.mesh_axes=[rays]",
                             "--nerf.n_rays=256",
                             "--train_schedule.n_rays_init=256",
                             "--train_schedule.n_rays_rest=256"])
    tr_sh = Trainer(opt_sh, scene)
    assert tr_sh.mesh is not None and not tr_sh.shard_components
    assert tr_sh._vg_transform() is not None, \
        "rays-only mesh must use the shard_map grad transform"
    hist_sh = tr_sh.run(max_iter=14, log_every=2)

    assert tr_sh.resolution == tr_ref.resolution
    assert tr_sh.compact_k == tr_ref.compact_k
    for h_ref, h_sh in zip(hist_ref, hist_sh):
        assert h_ref["it"] == h_sh["it"]
        np.testing.assert_allclose(h_sh["loss"], h_ref["loss"],
                                   rtol=5e-2, atol=1e-5)
    se3_ref = np.asarray(tr_ref.state.params.se3_refine)
    se3_sh = np.asarray(tr_sh.state.params.se3_refine)
    assert np.abs(se3_ref).max() > 0
    np.testing.assert_allclose(se3_sh, se3_ref, rtol=0.1, atol=2e-4)


def test_shardmap_depth_tv_grad_matches_unsharded():
    """depth-TV under the rays shard_map: the stencil needs the full
    per-view ray grid (all_gathered inside the step).  The all_gather
    transpose is psum_scatter — it already sums the replicated cotangents
    — so NO grad compensation is applied; this pins the parity the
    round-5 review verified (a D*x-(D-1)*stop_grad rescale made the TV
    grad exactly D times too large)."""
    import dataclasses as dc

    from joint_tensorf_tpu.parallel.sharding import rays_shardmap_vg

    devices = jax.devices()
    mesh = make_mesh(shape=(8, 1), axes=("rays", "comp"),
                     devices=devices[:8])
    vm_cfg, head, state, cfg = _tiny_setup()
    cfg = dc.replace(cfg, grid_hw=(8, 16))      # 128 rays as an 8x16 grid
    args = list(_inputs(cfg))
    # give the TV term real weight so a mis-scaled grad shows in params
    args[8] = dc.replace(args[8], tv_depth_weight=jnp.float32(0.05))
    args = tuple(args)

    ref_step = make_train_step(cfg, vm_cfg, head)
    ref_state, ref_metrics = ref_step(state, *args)

    raw = make_train_step(cfg, vm_cfg, head, jit=False,
                          vg_transform=rays_shardmap_vg(mesh))
    sharded = shard_train_step(raw, mesh, state, shard_components=False)
    with mesh:
        sh_state, sh_metrics = sharded(state, *args)

    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh_state.params.se3_refine),
        np.asarray(ref_state.params.se3_refine), rtol=1e-3, atol=1e-6)
    for p_ref, p_sh in zip(ref_state.params.field.density_planes,
                           sh_state.params.field.density_planes):
        np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                                   rtol=1e-3, atol=1e-6)
