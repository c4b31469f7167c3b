"""Blur-active culling via a dilated sharp alpha mask (round 4).

The paper's separability identity: blurring the VM factors component-wise
with a separable kernel IS an exact 3D convolution of the density field
(arXiv 2402.13252 core claim; bateRF.py:41-94).  A normalized positive
kernel cannot push the field above its neighborhood max, so a sharp alpha
mask max-pool-dilated by the kernel support radius is a CONSERVATIVE
occupancy gate for the blurred field — culling with it is the same
approximation class as the reference's own (blur-off) mask culling.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import (dilate_mask, sample_alpha,
                                                 update_alpha_mask)
from joint_tensorf_tpu.render.renderer import (BlurSpec, RenderConfig,
                                               render_rays)

CFG = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6),
                      app_dim=9, shading_mode="MLP_Fea", hidden=16)
AABB = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
RES = (24, 24, 24)


def _trained_ish_field():
    """A field with localized density (so the mask is selective): start
    from random init and suppress everything outside a ball."""
    state = vm_lib.init_vm(jax.random.PRNGKey(0), CFG, RES, AABB,
                           init_scale=0.5, init_bias=0.2)
    # localize: multiply line factors by a window along each axis
    def window(L):
        # L: [D, R] channels-last line factor
        z = jnp.linspace(-1, 1, L.shape[0])[:, None]
        return L * jnp.exp(-12.0 * z ** 2)
    return dataclasses.replace(
        state,
        density_lines=[window(L) for L in state.density_lines])


def _blurred_alpha_grid(state, sigma_grid, ksize, grid, step):
    """Dense alpha of the BLURRED field (kernel in grid units)."""
    kern = vm_lib.c2f_kernel("uniform-gaussian", jnp.float32(sigma_grid),
                             ksize, jnp.float32(1.0))
    mats = vm_lib.make_blur_mats(kern, RES)
    gx, gy, gz = grid
    xs = jnp.linspace(0, 1, gx)
    ys = jnp.linspace(0, 1, gy)
    zs = jnp.linspace(0, 1, gz)
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    samples = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    aabb = jnp.asarray(np.array(AABB, np.float32).reshape(2, 3))
    xyz = aabb[0] * (1 - samples) + aabb[1] * samples
    norm = vm_lib.normalize_coord(xyz, aabb)
    feat = vm_lib.compute_density_feature(state, CFG, norm, blur_mats=mats,
                                          stop_coord_grad=True)
    sigma = vm_lib.feature2density(CFG, feat)
    return (1.0 - jnp.exp(-sigma * step)).reshape(grid), xyz


def test_dilated_mask_is_conservative_for_blurred_field():
    state = _trained_ish_field()
    thresh = 1e-4
    step = 0.05
    mask, _ = update_alpha_mask(state, CFG, RES, step, thresh)
    assert 0.01 < float(mask.grid.mean()) < 0.9, "mask must be selective"

    for sigma_grid in (0.7, 1.5, 3.0):
        r = max(1, min(9 // 2 + 20, int(np.ceil(5.0 * sigma_grid)) + 1))
        dil = dilate_mask(mask, r)
        balpha, xyz = _blurred_alpha_grid(state, sigma_grid, 41, RES, step)
        hot = np.asarray(balpha) > thresh
        mask_at = np.asarray(
            sample_alpha(dil, jnp.asarray(xyz.reshape(-1, 3)))
        ).reshape(RES) > 0
        # every blurred-alpha-above-threshold cell must be inside the
        # dilated mask
        viol = hot & ~mask_at
        assert viol.sum() == 0, (
            f"sigma={sigma_grid}: {viol.sum()} blurred-hot cells escaped "
            f"the r={r} dilated mask")


def test_dilate_mask_radius_zero_axes():
    g = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(1.0)
    from joint_tensorf_tpu.models.alpha_mask import AlphaMask
    m = AlphaMask(grid=g, aabb=jnp.asarray(
        np.array(AABB, np.float32).reshape(2, 3)))
    d = dilate_mask(m, (2, 1, 0))
    gd = np.asarray(d.grid)
    assert gd[4, 4, 4] == 1 and gd[6, 4, 4] == 1 and gd[4, 5, 4] == 1
    assert gd[4, 4, 5] == 0 and gd[7, 4, 4] == 0
    assert d.packed is not None


def test_blur_render_with_dilated_mask_compaction_matches_dense():
    """mask_with_blur + dilated mask + generous K == dense blurred render."""
    state = _trained_ish_field()
    head = CFG.shading_head()
    rng = np.random.default_rng(0)
    n = 32
    centers = jnp.asarray(np.tile([[0.0, 0.0, -4.0]], (n, 1)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)) * [0.25, 0.25, 0.02]
                       + [0, 0, 1], jnp.float32)
    S = 48
    blur = BlurSpec(mode="uniform-gaussian", kernel_size=9)
    kw = dict(blur=blur, c2f_density=jnp.float32(0.08),
              c2f_color=jnp.float32(0.08))

    step = 0.05
    thresh = 1e-4
    mask, _ = update_alpha_mask(state, CFG, RES, step, thresh)
    # radius for sigma_world=0.08 at grid_scale = mean(24/3) = 8:
    # sigma_grid 0.64 -> ceil(5*0.64)+1 = 5, capped at ksize//2 = 4
    dil = dilate_mask(mask, 4)

    dense = RenderConfig(n_samples=S, is_train=False)
    rgb_d, dep_d, op_d = render_rays(
        state, CFG, dense, head, centers, dirs, jax.random.PRNGKey(1),
        jnp.array([2.0, 6.0]), **kw)

    # measure the worst-case alive count under the renderer's exact group
    # gate, then choose K to cover it
    from joint_tensorf_tpu.render.renderer import sample_ray
    aabb = jnp.asarray(np.array(AABB, np.float32).reshape(2, 3))
    units = (aabb[1] - aabb[0]) / (jnp.asarray(RES, jnp.float32) - 1)
    rstep = jnp.mean(units) * CFG.step_ratio
    pts, _, inb = sample_ray(aabb, rstep, S, centers, dirs,
                             jax.random.PRNGKey(1), 2.0, 6.0,
                             stratified=False)
    g = 4
    a = sample_alpha(dil, pts[:, ::g].reshape(-1, 3)).reshape(n, S // g)
    ginb = jnp.any(inb.reshape(n, S // g, g), axis=-1)
    max_groups = int(jnp.max(jnp.sum((a > 0) & ginb, axis=-1)))
    K = min(S - g, (max_groups + 1) * g)
    assert K >= max_groups * g and K < S, "need compaction headroom"

    comp = dataclasses.replace(dense, compact_k=K, mask_stride=g,
                               use_alpha_mask=True, mask_with_blur=True)
    rgb_c, dep_c, op_c = render_rays(
        state, CFG, comp, head, centers, dirs, jax.random.PRNGKey(1),
        jnp.array([2.0, 6.0]), alpha_mask=dil, **kw)

    # the same dilated-mask gate applied DENSELY (no compaction): the
    # compacted render must reproduce it almost exactly — given the gate,
    # compaction with covering K is a pure reindexing
    densemask = dataclasses.replace(dense, use_alpha_mask=True,
                                    mask_with_blur=True, mask_stride=g)
    rgb_m, dep_m, op_m = render_rays(
        state, CFG, densemask, head, centers, dirs, jax.random.PRNGKey(1),
        jnp.array([2.0, 6.0]), alpha_mask=dil, **kw)
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_m),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(op_c), np.asarray(op_m),
                               atol=3e-5)

    # and the gate itself only drops sub-threshold (blurred) alphas: the
    # masked render differs from the unmasked dense one by at most the
    # threshold class, sum over dropped samples <= S * thresh per ray
    bound = S * thresh * 2.0
    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_d),
                               atol=bound)
    np.testing.assert_allclose(np.asarray(op_m), np.asarray(op_d),
                               atol=bound)
