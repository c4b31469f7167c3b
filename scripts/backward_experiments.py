#!/usr/bin/env python
"""Isolate forward / coordinate-grad / plane-scatter costs of the fused
feature evaluation, and test sorted-scatter + compaction variants."""
import sys
import time

sys.path.insert(0, ".")
from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32) * 0 + 1)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N = 2_000_000
    res = (300, 300, 300)
    cfg = vm_lib.VMConfig()
    state = vm_lib.init_vm(jax.random.PRNGKey(0), cfg, res,
                           [-1.5] * 3 + [1.5] * 3)
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-0.95, 0.95, (N, 3)), jnp.float32)

    def fused_loss(st, c):
        s, a = vm_lib.compute_fused_features(st, cfg, c)
        return jnp.sum(s) + jnp.sum(a)

    fwd = jax.jit(fused_loss)
    grad_all = jax.jit(jax.grad(fused_loss, argnums=(0, 1)))
    grad_coords = jax.jit(
        lambda st, c: jax.grad(lambda cc: fused_loss(
            jax.tree.map(jax.lax.stop_gradient, st), cc))(c))
    grad_planes = jax.jit(
        lambda st, c: jax.grad(lambda ss: fused_loss(
            ss, jax.lax.stop_gradient(c)))(st))

    print(f"fused fwd           : {timeit(fwd, state, coords):8.2f} ms")
    print(f"fused grad coords   : {timeit(grad_coords, state, coords):8.2f} ms")
    print(f"fused grad planes   : {timeit(grad_planes, state, coords):8.2f} ms")
    print(f"fused grad both     : {timeit(grad_all, state, coords):8.2f} ms")

    # compaction scale test: N/4 points
    coords_s = coords[: N // 4]
    print(f"grad both N/4       : {timeit(grad_all, state, coords_s):8.2f} ms")

    # raw scatter-add cost: segment-sum of 4N 64-wide rows into H*W bins
    vals = jnp.asarray(rng.standard_normal((N, 64)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 300 * 300, N))

    @jax.jit
    def scatter(vals, idx):
        out = jnp.zeros((300 * 300, 64), jnp.float32)
        return out.at[idx].add(vals)

    @jax.jit
    def scatter_sorted(vals, idx):
        order = jnp.argsort(idx)
        out = jnp.zeros((300 * 300, 64), jnp.float32)
        return out.at[idx[order]].add(vals[order])

    @jax.jit
    def seg_sorted(vals, idx):
        order = jnp.argsort(idx)
        return jax.ops.segment_sum(vals[order], idx[order],
                                   num_segments=300 * 300)

    print(f"scatter-add  1x64xN : {timeit(scatter, vals, idx):8.2f} ms")
    print(f"scatter sorted      : {timeit(scatter_sorted, vals, idx):8.2f} ms")
    print(f"segment_sum sorted  : {timeit(seg_sorted, vals, idx):8.2f} ms")


if __name__ == "__main__":
    main()
