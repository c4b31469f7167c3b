#!/usr/bin/env python
"""Sub-op timing of the dense-grid density path (round-2 perf work).

Decomposes densify fwd/bwd at the compacted-phase shape (524k samples,
300^3 grid, Rd=16) to locate the backward's cost:
  build_fwd      G = sum einsum(plane, line)          [27M cells]
  build_vjp      d_plane/d_line from d_G (einsum transposes)
  pack_fwd       G -> G8 corner packing               [8x traffic]
  pack_vjp       fold d_G8 -> d_G
  gather_fwd     sample_packed_grid on G8             [524k rows]
  gather_vjp     scatter d_G8 + coordinate grads
  full_fwd/grad  end-to-end densify (reference point)
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.ops import densify as densify_ops
from joint_tensorf_tpu.train.step import init_train_state

LOOP = 8


def timed(name, fn, *args, iters=3):
    out = fn(jnp.float32(0.0), *args)
    float(out)   # tunnel-safe sync: block_until_ready under-reports here
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *args)
    float(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP) * 1000
    print(f"{name:16s}: {dt:8.2f} ms", flush=True)
    return dt


def loop(one):
    def run(carry, *args):
        return jax.lax.fori_loop(0, LOOP, lambda _, c: one(c, *args), carry)
    return jax.jit(run)


def main():
    N = 2048 * 256
    res = (300, 300, 300)
    vm_cfg = vm_lib.VMConfig()
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res,
                             [-1.5] * 3 + [1.5] * 3, 4)
    field = state.params.field

    key = jax.random.PRNGKey(1)
    coords = jax.random.uniform(key, (N, 3), minval=-0.6, maxval=0.6)
    G = vm_lib.compute_density_grid(field, vm_cfg)
    G8 = densify_ops.pack_corners(G)
    dG = jnp.ones_like(G)
    dG8 = jnp.ones_like(G8)
    dsamp = jnp.ones((N,), jnp.float32)

    def build_fwd(c, fld):
        g = vm_lib.compute_density_grid(fld, vm_cfg)
        return c + jnp.sum(g) * 1e-20

    def build_vjp(c, fld, dg):
        _, pull = jax.vjp(lambda f: vm_lib.compute_density_grid(f, vm_cfg),
                          fld)
        (df,) = pull(dg + c * 1e-20)
        return c + sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(df)) * 1e-20

    def pack_fwd(c, g):
        p = densify_ops.pack_corners(g + c * 1e-20)
        return c + jnp.sum(p) * 1e-20

    def pack_vjp(c, g, dg8):
        _, pull = jax.vjp(densify_ops.pack_corners, g)
        (d,) = pull(dg8 + c * 1e-20)
        return c + jnp.sum(d) * 1e-20

    def gather_fwd(c, g8, cd):
        s = densify_ops.sample_packed_grid(g8, cd + c * 1e-20)
        return c + jnp.sum(s) * 1e-20

    def gather_vjp(c, g8, cd, ds):
        _, pull = jax.vjp(densify_ops.sample_packed_grid, g8, cd)
        d8, dcd = pull(ds + c * 1e-20)
        return c + jnp.sum(d8) * 1e-20 + jnp.sum(dcd) * 1e-20

    def full_grad(c, fld, cd, ds):
        def f(fl, cc):
            g = vm_lib.compute_density_grid(fl, vm_cfg)
            g8 = densify_ops.pack_corners(g)
            return jnp.sum(densify_ops.sample_packed_grid(g8, cc) * ds)

        gf, gc = jax.grad(f, argnums=(0, 1))(fld, cd + c * 1e-20)
        return c + sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(gf)) * 1e-20 \
            + jnp.sum(gc) * 1e-20

    timed("build_fwd", loop(build_fwd), field)
    timed("build_vjp", loop(build_vjp), field, dG)
    timed("pack_fwd", loop(pack_fwd), G)
    timed("pack_vjp", loop(pack_vjp), G, dG8)
    timed("gather_fwd", loop(gather_fwd), G8, coords)
    timed("gather_vjp", loop(gather_vjp), G8, coords, dsamp)
    timed("full_grad", loop(full_grad), field, coords, dsamp)


def lane_main():
    """Lane-packed candidates vs the corner-packed path (round-2)."""
    N = 2048 * 256
    res = (300, 300, 300)
    vm_cfg = vm_lib.VMConfig()
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res,
                             [-1.5] * 3 + [1.5] * 3, 4)
    field = state.params.field
    coords = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-0.6,
                                maxval=0.6)
    ds = jnp.ones((N,), jnp.float32)

    from joint_tensorf_tpu.ops import lane_grid

    G = vm_lib.compute_density_grid(field, vm_cfg)
    G128 = lane_grid.pack_lane_grid(G)
    Z = res[2]

    def lpack_fwd(c, g):
        p = lane_grid.pack_lane_grid(g + c * 1e-20)
        return c + jnp.sum(p) * 1e-20

    def lgather_fwd(c, g128, cd):
        s = lane_grid.sample_lane_grid(g128, cd + c * 1e-20, Z)
        return c + jnp.sum(s) * 1e-20

    def lgather_vjp(c, g128, cd, dss):
        _, pull = jax.vjp(
            lambda g, cc: lane_grid.sample_lane_grid(g, cc, Z), g128, cd)
        dg, dcd = pull(dss + c * 1e-20)
        return c + jnp.sum(dg) * 1e-20 + jnp.sum(dcd) * 1e-20

    def lfull_grad(c, fld, cd, dss):
        def f(fl, cc):
            g = vm_lib.compute_density_grid(fl, vm_cfg)
            g128 = lane_grid.pack_lane_grid(g)
            return jnp.sum(lane_grid.sample_lane_grid(g128, cc, Z) * dss)

        gf, gc = jax.grad(f, argnums=(0, 1))(fld, cd + c * 1e-20)
        return c + sum(jnp.sum(x) for x in
                       jax.tree_util.tree_leaves(gf)) * 1e-20 \
            + jnp.sum(gc) * 1e-20

    timed("lane_pack_fwd", loop(lpack_fwd), G)
    timed("lane_gather_fwd", loop(lgather_fwd), G128, coords)
    timed("lane_gather_vjp", loop(lgather_vjp), G128, coords, ds)
    timed("lane_full_grad", loop(lfull_grad), field, coords, ds)

    # ---- alpha-mask probe: packed-8 rows vs lane-packed rows
    import numpy as _np
    from scipy import ndimage

    from joint_tensorf_tpu.models import alpha_mask as am_lib
    from joint_tensorf_tpu.models.alpha_mask import (AlphaMask,
                                                     pack_neighborhoods)

    rng = _np.random.default_rng(0)
    occ = (rng.random((160, 160, 160)) < 0.001).astype(_np.float32)
    occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(_np.float32)
    grid = jnp.asarray(occ)
    mask8 = AlphaMask(grid=grid, aabb=field.aabb,
                      packed=pack_neighborhoods(grid))
    m128 = lane_grid.pack_lane_grid(grid)
    probe_n = 2048 * 500
    pcoords = jax.random.uniform(jax.random.PRNGKey(5), (probe_n, 3),
                                 minval=-1.0, maxval=1.0)
    pworld = field.aabb[0] + (pcoords + 1) * 0.5 * (field.aabb[1]
                                                    - field.aabb[0])

    def probe8(c, pw):
        a = am_lib.sample_alpha(mask8, pw + c * 1e-20)
        return c + jnp.sum(a) * 1e-20

    def probe128(c, pc):
        a = lane_grid.sample_lane_grid(m128, pc + c * 1e-20, 160)
        return c + jnp.sum(a) * 1e-20

    timed("probe8 1M", loop(probe8), pworld)
    timed("probe128 1M", loop(probe128), pcoords)


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "lane":
        lane_main()
    else:
        main()
