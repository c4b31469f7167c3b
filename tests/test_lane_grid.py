"""Lane-packed grid sampling: exactness vs the corner-packed reference."""
import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops import densify as densify_ops
from joint_tensorf_tpu.ops import lane_grid


def _setup(X=37, Y=29, Z=67, N=4096, seed=0):
    kg, kc = jax.random.split(jax.random.PRNGKey(seed))
    G = jax.random.normal(kg, (X, Y, Z))
    coords = jax.random.uniform(kc, (N, 3), minval=-1.3, maxval=1.3)
    return G, coords


def test_matches_packed_grid_values():
    G, coords = _setup()
    ref = densify_ops.sample_packed_grid(densify_ops.pack_corners(G), coords)
    got = lane_grid.sample_lane_grid(lane_grid.pack_lane_grid(G), coords,
                                     G.shape[2])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_matches_at_block_boundaries():
    """z0 at the 31-cell block seams and the clamped edges must read the
    halo entry, not the next block's start."""
    X, Y, Z = 8, 8, 96
    G = jax.random.normal(jax.random.PRNGKey(1), (X, Y, Z))
    # z0 in {30, 31, 61, 62, 92, Z-2} exercised via coords landing there
    zs = jnp.array([30.3, 30.9, 31.1, 61.5, 62.0, 92.7, Z - 1.001, 0.0])
    z_norm = zs / (Z - 1) * 2.0 - 1.0
    coords = jnp.stack([jnp.full_like(z_norm, 0.21),
                        jnp.full_like(z_norm, -0.4), z_norm], axis=-1)
    ref = densify_ops.sample_packed_grid(densify_ops.pack_corners(G), coords)
    got = lane_grid.sample_lane_grid(lane_grid.pack_lane_grid(G), coords, Z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_packed_grid():
    """Grid AND coordinate (pose-path) gradients equal the corner-packed
    reference path."""
    G, coords = _setup(N=512)
    ds = jax.random.normal(jax.random.PRNGKey(2), (512,))

    def f_ref(g, c):
        return jnp.sum(densify_ops.sample_packed_grid(
            densify_ops.pack_corners(g), c) * ds)

    def f_new(g, c):
        return jnp.sum(lane_grid.sample_lane_grid(
            lane_grid.pack_lane_grid(g), c, g.shape[2]) * ds)

    gr, cr = jax.grad(f_ref, argnums=(0, 1))(G, coords)
    gn, cn = jax.grad(f_new, argnums=(0, 1))(G, coords)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cr),
                               rtol=1e-5, atol=1e-6)


def test_small_z_grid():
    """Z smaller than one block (early phases can have tiny grids)."""
    G, coords = _setup(X=16, Y=16, Z=9, N=777, seed=3)
    ref = densify_ops.sample_packed_grid(densify_ops.pack_corners(G), coords)
    got = lane_grid.sample_lane_grid(lane_grid.pack_lane_grid(G), coords, 9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_direct_vm_build_matches_pack_of_dense_grid():
    """build_lane_grid_vm(factors) == pack_lane_grid(dense expansion),
    values and gradients (it must be a drop-in for the hot path)."""
    import dataclasses

    from joint_tensorf_tpu.models import vm as vm_lib
    from joint_tensorf_tpu.train.step import init_train_state

    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8),
                          app_dim=27, shading_mode="MLP_Fea", hidden=32)
    state = init_train_state(jax.random.PRNGKey(0), cfg, (17, 23, 66),
                             [-1, -1, -1, 1, 1, 1], 2).params.field

    def via_pack(planes, lines):
        st = dataclasses.replace(state, density_planes=list(planes),
                                 density_lines=list(lines))
        return lane_grid.pack_lane_grid(
            vm_lib.compute_density_grid(st, cfg))

    def direct(planes, lines):
        return lane_grid.build_lane_grid_vm(list(planes), list(lines))

    planes = tuple(state.density_planes)
    lines = tuple(state.density_lines)
    ref = via_pack(planes, lines)
    got = direct(planes, lines)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    dG = jax.random.normal(jax.random.PRNGKey(1), ref.shape)

    def loss_ref(p, l):
        return jnp.sum(via_pack(p, l) * dG)

    def loss_new(p, l):
        return jnp.sum(direct(p, l) * dG)

    gr = jax.grad(loss_ref, argnums=(0, 1))(planes, lines)
    gn = jax.grad(loss_new, argnums=(0, 1))(planes, lines)
    for a, b in zip(jax.tree_util.tree_leaves(gn),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_unpack_lane_grid_T_matches_pack_bwd():
    """unpack_lane_grid_T is the streaming rewrite of _pack_bwd (the
    pack_lane_grid VJP); they must agree at Z a multiple of 31, Z not a
    multiple, tiny Z, and Z crossing several blocks."""
    for seed, (X, Y, Z) in enumerate([(7, 5, 62), (9, 6, 67), (4, 4, 13),
                                      (5, 3, 31 * 3 + 1)]):
        G = jax.random.normal(jax.random.PRNGKey(seed), (X, Y, Z))
        P = lane_grid.pack_lane_grid(G)
        dP = jax.random.normal(jax.random.PRNGKey(100 + seed), P.shape)
        (ref,) = lane_grid._pack_bwd((X, Y, Z), dP)
        got = lane_grid.unpack_lane_grid_T((X, Y, Z), dP)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_bf16_row_gather_close_and_f32_grads():
    """row_dtype=bfloat16: values within bf16 quantization of the f32
    path; grid gradients are EXACT f32 (the backward scatter never
    touches bf16); coordinate (pose-path) gradients agree to bf16-value
    tolerance."""
    G, coords = _setup(N=2048)
    P = lane_grid.pack_lane_grid(G)
    Z = G.shape[2]

    ref = lane_grid.sample_lane_grid(P, coords, Z)
    got = lane_grid.sample_lane_grid(P, coords, Z, row_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)

    d_out = jax.random.normal(jax.random.PRNGKey(7), ref.shape)

    def loss(P, c, dt):
        return jnp.sum(lane_grid.sample_lane_grid(P, c, Z, row_dtype=dt)
                       * d_out)

    gP_ref, gc_ref = jax.grad(loss, argnums=(0, 1))(P, coords, "float32")
    gP_b16, gc_b16 = jax.grad(loss, argnums=(0, 1))(P, coords, "bfloat16")
    # grid grads: identical scatter of identical f32 cotangents
    assert gP_b16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gP_b16), np.asarray(gP_ref),
                               rtol=1e-6, atol=1e-6)
    # coordinate grads are DIFFERENCES of bf16-quantized row values
    # (r[x0+1]-r[x0]): near-equal neighbors cancel, so the error is
    # absolute (~2*bf16_eps*|G|), not relative.  Bound per-element
    # absolute error and the aggregate deviation (the pose path sums
    # thousands of per-sample grads, where quantization noise averages).
    gc_b16, gc_ref = np.asarray(gc_b16), np.asarray(gc_ref)
    scale = np.abs(gc_ref).max()
    np.testing.assert_allclose(gc_b16, gc_ref, rtol=5e-2,
                               atol=0.02 * scale)
    assert np.abs(gc_b16 - gc_ref).mean() < 0.01 * np.abs(gc_ref).mean()
