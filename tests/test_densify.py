"""Dense-grid density path (ops/densify.py) vs the factored reference path.

The factorization claim: trilinear interpolation of the dense rank
expansion equals the factored bilinear-plane x linear-line sample at every
point (densify.py module docstring).  These tests pin that equality for
values AND gradients (factor grids + sampling coordinates — the pose path),
across VM/CP, blur, and the per-component activation variants, plus the
renderer-level equivalence and the two-stage appearance exactness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.ops import densify
from joint_tensorf_tpu.render.renderer import RenderConfig, render_rays


def _mk_state(key, cfg, res=(13, 11, 9)):
    return vm_lib.init_vm(key, cfg, res, [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def _coords(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1.1, 1.1, (n, 3)), jnp.float32)


def _dense_sample(state, cfg, coords, blur_mats=None):
    G = vm_lib.compute_density_grid(state, cfg, blur_mats=blur_mats)
    return densify.sample_packed_grid(densify.pack_corners(G), coords)


@pytest.mark.parametrize("variant", [
    {}, {"component_wise_feature2density": True},
    {"plane_feature2density": True}, {"abs_components": True},
    {"decomposition": "CP"},
])
def test_dense_equals_factored(variant):
    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                          app_dim=6, **variant)
    state = _mk_state(jax.random.PRNGKey(0), cfg)
    coords = _coords()
    ref = vm_lib.compute_density_feature(state, cfg, coords)
    out = _dense_sample(state, cfg, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dense_equals_factored_blurred():
    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                          app_dim=6)
    state = _mk_state(jax.random.PRNGKey(1), cfg)
    coords = _coords(seed=1)
    kernel = vm_lib.c2f_kernel("uniform-gaussian", jnp.float32(0.2), 9,
                               jnp.float32(4.0))
    mats = vm_lib.make_blur_mats(kernel, state.resolution())
    ref = vm_lib.compute_density_feature(state, cfg, coords, blur_mats=mats)
    out = _dense_sample(state, cfg, coords, blur_mats=mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dense_gradients_match_factored():
    """Factor-grid AND coordinate gradients agree between the two paths."""
    cfg = vm_lib.VMConfig(density_n_comp=(3, 3, 3), app_n_comp=(3, 3, 3),
                          app_dim=6)
    state = _mk_state(jax.random.PRNGKey(2), cfg)
    coords = _coords(120, seed=2)
    cot = jnp.asarray(np.random.default_rng(3).normal(size=120), jnp.float32)

    def loss_ref(planes, lines, c):
        st = vm_lib.VMState(density_planes=planes, density_lines=lines,
                            app_planes=state.app_planes,
                            app_lines=state.app_lines, basis=state.basis,
                            shading=state.shading, aabb=state.aabb)
        return jnp.sum(vm_lib.compute_density_feature(st, cfg, c) * cot)

    def loss_dense(planes, lines, c):
        st = vm_lib.VMState(density_planes=planes, density_lines=lines,
                            app_planes=state.app_planes,
                            app_lines=state.app_lines, basis=state.basis,
                            shading=state.shading, aabb=state.aabb)
        return jnp.sum(_dense_sample(st, cfg, c) * cot)

    args = (state.density_planes, state.density_lines, coords)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_new = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5)


def _render_pair(rcfg_kwargs_a, rcfg_kwargs_b, seed=0, n_samples=33):
    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                          app_dim=6, hidden=16)
    head = cfg.shading_head()
    state = _mk_state(jax.random.PRNGKey(seed), cfg, res=(17, 15, 13))
    # make the field opaque enough that weights are non-trivial
    state.density_planes = [p * 40.0 for p in state.density_planes]
    rng = np.random.default_rng(seed)
    n = 64
    centers = jnp.asarray(rng.normal(size=(n, 3)) * 0.1 + [0, 0, -4.0],
                          jnp.float32)
    d = rng.normal(size=(n, 3)) * [0.25, 0.25, 0.02] + [0, 0, 1]
    dirs = jnp.asarray(d, jnp.float32)
    near_far = jnp.array([2.0, 6.0])
    key = jax.random.PRNGKey(0)

    outs = []
    for kw in (rcfg_kwargs_a, rcfg_kwargs_b):
        rcfg = RenderConfig(n_samples=n_samples, is_train=False, **kw)
        outs.append(render_rays(state, cfg, rcfg, head, centers, dirs, key,
                                near_far))
    return outs


def test_renderer_densify_matches_baseline():
    (a, b) = _render_pair({}, {"densify_density": True})
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-5)


def test_renderer_app_k_exact_when_large():
    """app_k >= n_samples keeps every gate-passing sample -> exact."""
    (a, b) = _render_pair({}, {"densify_density": True, "app_k": 33})
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-5)


def test_renderer_app_k_small_close():
    """A tight app_k only drops sub-threshold-weight colors."""
    (a, b) = _render_pair({}, {"densify_density": True, "app_k": 8})
    # rgb: small perturbation allowed; depth/acc identical (computed on all)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]),
                               rtol=2e-4, atol=2e-5)
    assert float(jnp.max(jnp.abs(b[0] - a[0]))) < 0.15
