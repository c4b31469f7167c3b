#!/usr/bin/env python
"""Focused sub-op timing of the compacted train step (round-2 perf work).

Times each piece of the 70%-of-schedule regime (2048 rays x S=1000 ->
K=256, app_k=64, 300^3 grid, 160^3 mask) with amortized in-jit loops: each
measured op runs LOOP times inside one jit with a data dependency through
the carry, so per-dispatch tunnel overhead (~35 ms) amortizes away and XLA
cannot hoist the op.

Pieces:
  presample[s]   sample_ray + alpha probe at stride s + top_k + packed take
  probe[s]       the alpha-mask gather alone at stride s
  dens_fwd       factored density forward on K samples
  dens_grad      density fwd+bwd (factor + coord grads) on K samples
  app_fwd/grad   appearance on app_k*n_rays samples
  densify_fwd/grad  dense-grid expansion build + sample on K samples
  topk           top_k(K) over [n_rays, S]
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models import alpha_mask as am_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.render.renderer import sample_ray
from joint_tensorf_tpu.train.step import init_train_state

LOOP = 8


def timed(name, build_fn, *args, iters=3):
    """build_fn() -> jitted fn(carry, *args) running LOOP reps inside."""
    fn = build_fn()
    out = fn(jnp.float32(0.0), *args)
    float(out)   # the axon tunnel's block_until_ready under-reports; a
    # host transfer is the only trustworthy sync (bench.py measure())
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(out, *args)
    float(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP) * 1000
    print(f"{name:24s}: {dt:8.2f} ms")
    return dt


def main():
    n_rays, S, K, APPK = 2048, 1000, 256, 64
    res = (300, 300, 300)
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb, 4)
    field = state.params.field

    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.normal(size=(n_rays, 3)) * 0.1 + [0, 0, -4.0],
                          jnp.float32)
    d = rng.normal(size=(n_rays, 3)) * np.array([0.3, 0.3, 0.02]) + [0, 0, 1]
    dirs = jnp.asarray(d, jnp.float32)
    near_far = jnp.array([2.0, 6.0])

    occ = (rng.random((160, 160, 160)) < 0.001).astype(np.float32)
    from scipy import ndimage
    occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(np.float32)
    grid = jnp.asarray(occ)
    mask = AlphaMask(grid=grid, aabb=field.aabb, packed=pack_neighborhoods(grid))
    print(f"mask occupancy: {float(grid.mean()):.3f}", flush=True)

    units = (field.aabb[1] - field.aabb[0]) / (jnp.asarray(res, jnp.float32) - 1)
    step_size = float(jnp.mean(units) * vm_cfg.step_ratio)

    def rays_of(c, carry):
        return c + carry * 1e-20

    # ---------------- presample variants
    def presample(stride, c, dd, carry):
        pts, z_vals, in_bbox = sample_ray(
            field.aabb, step_size, S, rays_of(c, carry), dd,
            jax.random.PRNGKey(0), 2.0, 6.0, True)
        if stride > 1:
            probe = pts[:, ::stride].reshape(-1, 3)
            a = am_lib.sample_alpha(mask, probe).reshape(n_rays, S // stride)
            alphas = jnp.repeat(a, stride, axis=1)
        else:
            alphas = am_lib.sample_alpha(mask, pts.reshape(-1, 3)).reshape(
                n_rays, S)
        valid = in_bbox & (alphas > 0)
        score = valid.astype(jnp.float32)
        _, topi = jax.lax.top_k(score, K)
        topi = jnp.sort(topi, axis=-1)
        fv = valid.astype(z_vals.dtype)
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1)
        packed = jnp.stack([z_vals, dists, fv, fv], axis=-1)
        packed = jnp.take_along_axis(packed, topi[..., None], axis=1)
        z = packed[..., 0]
        pts_k = c[:, None, :] + dd[:, None, :] * z[..., None]
        return carry + jnp.sum(pts_k) * 1e-20 + jnp.sum(packed) * 1e-20

    def build_presample(stride):
        def run(carry, c, dd):
            def body(_, cy):
                return presample(stride, c, dd, cy)
            return jax.lax.fori_loop(0, LOOP, body, carry)
        return jax.jit(run)

    # ---------------- probe alone
    def build_probe(stride):
        def one(c, dd, carry):
            pts, z_vals, in_bbox = sample_ray(
                field.aabb, step_size, S, rays_of(c, carry), dd,
                jax.random.PRNGKey(0), 2.0, 6.0, True)
            probe = pts[:, ::stride].reshape(-1, 3)
            a = am_lib.sample_alpha(mask, probe)
            return carry + jnp.sum(a) * 1e-20

        def run(carry, c, dd):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(c, dd, cy), carry)
        return jax.jit(run)

    # ---------------- compacted coords for feature timing
    key = jax.random.PRNGKey(1)
    coords_k = jax.random.uniform(key, (n_rays * K, 3), minval=-0.6,
                                  maxval=0.6)
    coords_app = coords_k[: n_rays * APPK]

    def build_dens_fwd():
        def one(cd, carry):
            f = vm_lib.compute_density_feature(field, vm_cfg,
                                               cd + carry * 1e-20)
            return carry + jnp.sum(f) * 1e-20

        def run(carry, cd):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(cd, cy), carry)
        return jax.jit(run)

    def build_dens_grad():
        def loss(fld, cd):
            return jnp.sum(vm_lib.compute_density_feature(fld, vm_cfg, cd))

        g = jax.grad(loss, argnums=(0, 1))

        def one(cd, carry):
            gf, gc = g(field, cd + carry * 1e-20)
            leaves = jax.tree_util.tree_leaves(gf)
            return carry + sum(jnp.sum(x) for x in leaves) * 1e-20 \
                + jnp.sum(gc) * 1e-20

        def run(carry, cd):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(cd, cy), carry)
        return jax.jit(run)

    def build_app_grad(fwd_only):
        def loss(fld, cd):
            return jnp.sum(vm_lib.compute_app_feature(fld, vm_cfg, cd))

        g = jax.grad(loss, argnums=(0, 1))

        def one(cd, carry):
            if fwd_only:
                return carry + loss(field, cd + carry * 1e-20) * 1e-20
            gf, gc = g(field, cd + carry * 1e-20)
            leaves = jax.tree_util.tree_leaves(gf)
            return carry + sum(jnp.sum(x) for x in leaves) * 1e-20 \
                + jnp.sum(gc) * 1e-20

        def run(carry, cd):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(cd, cy), carry)
        return jax.jit(run)

    def build_densify(fwd_only):
        from joint_tensorf_tpu.ops import densify as densify_ops

        def loss(fld, cd):
            G = vm_lib.compute_density_grid(fld, vm_cfg)
            G8 = densify_ops.pack_corners(G)
            return jnp.sum(densify_ops.sample_packed_grid(G8, cd))

        g = jax.grad(loss, argnums=(0, 1))

        def one(cd, carry):
            if fwd_only:
                return carry + loss(field, cd + carry * 1e-20) * 1e-20
            gf, gc = g(field, cd + carry * 1e-20)
            leaves = jax.tree_util.tree_leaves(gf)
            return carry + sum(jnp.sum(x) for x in leaves) * 1e-20 \
                + jnp.sum(gc) * 1e-20

        def run(carry, cd):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(cd, cy), carry)
        return jax.jit(run)

    def build_topk():
        def one(c, carry):
            sc = c[:, :1] * jnp.ones((n_rays, S)) + carry * 1e-20
            _, topi = jax.lax.top_k(sc, K)
            return carry + jnp.sum(topi) * 1e-20

        def run(carry, c):
            return jax.lax.fori_loop(0, LOOP,
                                     lambda _, cy: one(c, cy), carry)
        return jax.jit(run)

    timed("probe stride=2", lambda: build_probe(2), centers, dirs)
    timed("probe stride=4", lambda: build_probe(4), centers, dirs)
    timed("probe stride=8", lambda: build_probe(8), centers, dirs)
    timed("presample stride=2", lambda: build_presample(2), centers, dirs)
    timed("presample stride=4", lambda: build_presample(4), centers, dirs)
    timed("topk", build_topk, centers)
    timed("dens_fwd K", build_dens_fwd, coords_k)
    timed("dens_grad K", build_dens_grad, coords_k)
    timed("app_fwd appk", lambda: build_app_grad(True), coords_app)
    timed("app_grad appk", lambda: build_app_grad(False), coords_app)
    timed("densify_fwd K", lambda: build_densify(True), coords_k)
    timed("densify_grad K", lambda: build_densify(False), coords_k)


if __name__ == "__main__":
    main()
