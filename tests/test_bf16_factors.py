"""bfloat16 factor storage (VMConfig.factor_dtype) — the reference's
optional fp16 analogue (tensorf.py:222-227).

Storage is bf16; compute, gradient accumulation, and Adam moments stay
float32 (train/optim.py).  These tests pin: dtype plumbing through init /
upsample / train step, value agreement with the f32 path at bf16 tolerance,
and that training still makes progress.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.train.step import (StepConfig, default_scalars,
                                          init_train_state, make_train_step)


def _cfg(**kw):
    return vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                           app_dim=6, hidden=16, **kw)


def test_init_and_upsample_preserve_dtype():
    cfg = _cfg(factor_dtype="bfloat16")
    state = vm_lib.init_vm(jax.random.PRNGKey(0), cfg, (9, 8, 7),
                           [-1.5] * 3 + [1.5] * 3)
    for p in state.density_planes + state.app_planes:
        assert p.dtype == jnp.bfloat16
    up = vm_lib.upsample(state, (13, 12, 11))
    for p in up.density_planes + up.app_planes + up.density_lines:
        assert p.dtype == jnp.bfloat16
    sh = vm_lib.shrink(up, [[-1.0] * 3, [1.0] * 3])
    assert sh.density_planes[0].dtype == jnp.bfloat16
    assert state.basis.dtype == jnp.float32          # basis stays f32


def test_bf16_density_close_to_f32():
    cfg32 = _cfg()
    state = vm_lib.init_vm(jax.random.PRNGKey(1), cfg32, (11, 10, 9),
                           [-1.5] * 3 + [1.5] * 3)
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-1, 1, (200, 3)), jnp.float32)
    ref = vm_lib.compute_density_feature(state, cfg32, coords)

    state16 = dataclasses.replace(
        state,
        density_planes=[p.astype(jnp.bfloat16) for p in state.density_planes],
        density_lines=[l.astype(jnp.bfloat16) for l in state.density_lines])
    out = vm_lib.compute_density_feature(state16, cfg32, coords)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.03, atol=0.03)
    # dense-grid path promotes to f32 too
    G = vm_lib.compute_density_grid(state16, cfg32)
    assert G.dtype == jnp.float32


def test_bf16_train_step_updates_and_keeps_dtype():
    cfg = _cfg(factor_dtype="bfloat16")
    head = cfg.shading_head()
    n_views, H, W = 3, 12, 12
    state = init_train_state(jax.random.PRNGKey(0), cfg, (9, 9, 9),
                             [-1.5] * 3 + [1.5] * 3, n_views)
    assert state.scene_opt.mu.density_planes[0].dtype == jnp.float32

    scfg = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=24,
                      n_samples=16, pose_opt=True, densify_density=True,
                      app_k=8)
    step = make_train_step(scfg, cfg, head, jit=False)

    rng = np.random.default_rng(0)
    from joint_tensorf_tpu.data.synthetic import sphere_poses
    pose_base = jnp.asarray(sphere_poses(n_views))
    intr = jnp.asarray(np.broadcast_to(
        np.array([[14.0, 0, 6], [0, 14.0, 6], [0, 0, 1]], np.float32),
        (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    s = dataclasses.replace(default_scalars(n_views),
                            lr_index=jnp.float32(2e-2),
                            lr_basis=jnp.float32(1e-3),
                            lr_pose=jnp.float32(1e-3))
    losses = []
    st = state
    for i in range(8):
        idx = jnp.asarray(rng.permutation(H * W)[:24].astype(np.int64))
        st, m = step(st, pose_base, intr, intr_inv, images, edges,
                     jnp.arange(n_views), idx, jax.random.PRNGKey(i), s, None)
        losses.append(float(m["loss"]))
    assert st.params.field.density_planes[0].dtype == jnp.bfloat16
    # parameters moved and the loss went down
    assert losses[-1] < losses[0]
    delta = jnp.abs(st.params.field.density_planes[0].astype(jnp.float32)
                    - state.params.field.density_planes[0].astype(jnp.float32))
    assert float(delta.max()) > 0
