import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.ops import kernels as kernel_ops

CFG = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6),
                      app_dim=9, shading_mode="MLP_Fea", hidden=16)
AABB = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]


def make_state(res=(11, 13, 15), cfg=CFG):
    return vm_lib.init_vm(jax.random.PRNGKey(0), cfg, res, AABB,
                          init_scale=0.5, init_bias=0.1)


def dense_from_factors(state):
    """Reconstruct the dense density volume Σ_i plane_i ⊗ line_i."""
    res = state.resolution()
    vol = np.zeros(res, dtype=np.float64)
    for i in range(3):
        m0, m1 = vm_lib.MAT_MODE[i]
        vec = vm_lib.VEC_MODE[i]
        plane = np.asarray(state.density_planes[i])  # [res[m1], res[m0], R]
        line = np.asarray(state.density_lines[i])    # [res[vec], R]
        # outer product per component, placed on the right axes
        contrib = np.einsum("hwr,dr->hwd", plane, line)  # axes (m1, m0, vec)
        # reorder (m1, m0, vec) -> (0, 1, 2)
        axes_order = np.argsort([m1, m0, vec])
        vol += np.transpose(contrib, axes_order)
    return vol


def test_density_feature_matches_dense_reconstruction():
    state = make_state()
    res = state.resolution()
    # probe exactly at grid nodes: normalized coords of node (a,b,c)
    rng = np.random.default_rng(0)
    nodes = np.stack([rng.integers(0, res[k], 64) for k in range(3)], -1)
    coords = 2 * nodes / (np.asarray(res) - 1) - 1
    got = np.asarray(vm_lib.compute_density_feature(
        state, CFG, jnp.asarray(coords, jnp.float32)))
    vol = dense_from_factors(state)
    want = vol[nodes[:, 0], nodes[:, 1], nodes[:, 2]]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_blur_commutes_with_outer_product():
    """Separable component-wise blur of the factors == exact 3D blur of the
    dense volume (the paper's core algebraic identity)."""
    state = make_state(res=(17, 17, 17))
    kernel = kernel_ops.gaussian_kernel(1.5, 9)
    mats = vm_lib.make_blur_mats(kernel, state.resolution())

    # blurred factors -> dense volume
    blurred = dataclasses.replace(
        state,
        density_planes=[
            jnp.einsum("vw,hwr->hvr", mats[p.shape[1]],
                       jnp.einsum("uh,hwr->uwr", mats[p.shape[0]], p))
            for p in state.density_planes
        ],
        density_lines=[mats[l.shape[0]] @ l for l in state.density_lines],
    )
    vol_factor_blur = dense_from_factors(blurred)

    # dense volume -> 3D separable blur along each axis
    vol = dense_from_factors(state)
    B = np.asarray(mats[17])
    vol_direct = np.einsum("ai,ijk->ajk", B, vol)
    vol_direct = np.einsum("bj,ajk->abk", B, vol_direct)
    vol_direct = np.einsum("ck,abk->abc", B, vol_direct)

    np.testing.assert_allclose(vol_factor_blur, vol_direct, rtol=1e-4,
                               atol=1e-4)


def test_upsample_preserves_node_values():
    state = make_state(res=(9, 9, 9))
    up = vm_lib.upsample(state, (17, 17, 17))
    assert up.resolution() == [17, 17, 17]
    # align-corners: every original node value is preserved exactly
    orig = np.asarray(state.density_planes[0])
    new = np.asarray(up.density_planes[0])
    np.testing.assert_allclose(new[::2, ::2], orig, atol=1e-5)


def test_shrink_crops_grids():
    state = make_state(res=(16, 16, 16))
    new_aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    small = vm_lib.shrink(state, new_aabb)
    res = small.resolution()
    assert all(r < 16 for r in res)
    aabb = np.asarray(small.aabb)
    assert (aabb[0] >= -1.51).all() and (aabb[1] <= 1.51).all()
    # snapped aabb maps exactly to grid nodes of the original grid
    units = 3.0 / 15
    rel = (aabb - (-1.5)) / units
    np.testing.assert_allclose(rel, np.round(rel), atol=1e-4)


def test_app_feature_shape_and_grad():
    state = make_state()
    coords = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (32, 3)),
                         jnp.float32)
    feat = vm_lib.compute_app_feature(state, CFG, coords)
    assert feat.shape == (32, CFG.app_dim)

    # coordinate gradients flow (pose-gradient path)
    g = jax.grad(lambda c: jnp.sum(vm_lib.compute_app_feature(state, CFG, c)))(
        coords)
    assert np.abs(np.asarray(g)).max() > 0


def test_fused_features_match_separate():
    """The fused 64-wide gather path must be bit-identical to the separate
    density/appearance paths, sharp and blurred."""
    state = make_state()
    coords = jnp.asarray(np.random.default_rng(7).uniform(-0.95, 0.95, (64, 3)),
                         jnp.float32)
    s1 = vm_lib.compute_density_feature(state, CFG, coords)
    a1 = vm_lib.compute_app_feature(state, CFG, coords)
    s2, a2 = vm_lib.compute_fused_features(state, CFG, coords)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    k_d = kernel_ops.gaussian_kernel(1.5, 9)
    k_c = kernel_ops.gaussian_kernel(0.8, 9)
    md = vm_lib.make_blur_mats(k_d, state.resolution())
    mc = vm_lib.make_blur_mats(k_c, state.resolution())
    s1 = vm_lib.compute_density_feature(state, CFG, coords, blur_mats=md)
    a1 = vm_lib.compute_app_feature(state, CFG, coords, blur_mats=mc)
    s2, a2 = vm_lib.compute_fused_features(state, CFG, coords, d_mats=md,
                                           c_mats=mc)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_cp_decomposition():
    cfg = dataclasses.replace(CFG, decomposition="CP",
                              density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6))
    state = vm_lib.init_vm(jax.random.PRNGKey(1), cfg, (9, 9, 9), AABB)
    assert state.density_planes == [] or len(state.density_planes) == 3
    coords = jnp.asarray(np.random.default_rng(2).uniform(-0.9, 0.9, (16, 3)),
                         jnp.float32)
    sigma = vm_lib.compute_density_feature(state, cfg, coords)
    assert sigma.shape == (16,)
    app = vm_lib.compute_app_feature(state, cfg, coords)
    assert app.shape == (16, cfg.app_dim)


def test_vector_comp_diffs_matches_reference_semantics():
    """vm.vector_comp_diffs = mean |off-diagonal| of line Gram matrices
    (tensoRF.py:198-210): zero for orthogonal factors, positive otherwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from joint_tensorf_tpu.models import vm as vm_lib

    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8),
                          app_dim=27, shading_mode="MLP_Fea", hidden=32)
    state = vm_lib.init_vm(jax.random.PRNGKey(0), cfg, (16, 16, 16),
                           [-1, -1, -1, 1, 1, 1])
    v = float(vm_lib.vector_comp_diffs(state))
    assert np.isfinite(v) and v > 0

    # orthogonal (one-hot) line factors -> exactly zero
    eye_lines = [jnp.eye(16, 4), jnp.eye(16, 4), jnp.eye(16, 4)]
    import dataclasses
    st0 = dataclasses.replace(state, density_lines=eye_lines,
                              app_lines=[jnp.eye(16, 8)] * 3)
    assert float(vm_lib.vector_comp_diffs(st0)) == 0.0

    # manual check against the reference formula on one factor
    l = np.asarray(state.density_lines[0], np.float64)
    gram = l.T @ l
    R = gram.shape[0]
    off = gram[~np.eye(R, dtype=bool)]
    expected = np.abs(off).mean()
    got = float(vm_lib._vector_diffs([state.density_lines[0]]))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
