#!/usr/bin/env python
"""Measure TPU cost of the sort/permutation machinery for binned scatter.

The binned plane-scatter kernel needs samples grouped by plane tile:
  perm = stable argsort of tile_id  (~25-400 distinct values over ~2M keys)
plus the permuted per-sample rows.  This measures the candidate ways to
get that permutation and apply it.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N = 2_000_000
    T = 361  # 19x19 tiles
    rng = np.random.default_rng(0)
    tile_id = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    rows = jnp.asarray(rng.normal(size=(N, 64)), jnp.float32)

    iota = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def argsort_keys(tid):
        return jnp.argsort(tid * N + iota)  # stable via unique keys? N*T < 2^31 fails: use composite
    # careful: T*N = 7.2e8 < 2^31 OK

    @jax.jit
    def sort_pairs(tid):
        _, perm = jax.lax.sort((tid, iota), num_keys=1, is_stable=True)
        return perm

    @jax.jit
    def apply_perm(r, perm):
        return jnp.take(r, perm, axis=0)

    @jax.jit
    def bincount_offsets(tid):
        cnt = jnp.bincount(tid, length=T)
        return jnp.cumsum(cnt)

    @jax.jit
    def searchsorted_offsets(sorted_tid):
        return jnp.searchsorted(sorted_tid, jnp.arange(T + 1, dtype=jnp.int32))

    p = argsort_keys(tile_id)
    print("argsort composite key :", timeit(argsort_keys, tile_id), "ms")
    p2 = sort_pairs(tile_id)
    print("lax.sort pairs        :", timeit(sort_pairs, tile_id), "ms")
    np.testing.assert_array_equal(np.asarray(tile_id)[np.asarray(p)],
                                  np.sort(np.asarray(tile_id)))
    print("take rows [N,64] perm :", timeit(apply_perm, rows, p), "ms")
    print("bincount+cumsum       :", timeit(bincount_offsets, tile_id), "ms")
    st = jnp.sort(tile_id)
    print("searchsorted offsets  :", timeit(searchsorted_offsets, st), "ms")

    # scatter baseline: what XLA does today for the plane grad
    HW = 300 * 300
    flat_idx = jnp.asarray(rng.integers(0, HW, N), jnp.int32)

    @jax.jit
    def xla_scatter(r, idx):
        return jnp.zeros((HW, 64), jnp.float32).at[idx].add(r)

    print("XLA scatter-add 1 corner:", timeit(xla_scatter, rows, flat_idx), "ms")


if __name__ == "__main__":
    main()
