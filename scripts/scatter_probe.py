#!/usr/bin/env python
"""Cost-model probes for the XLA row scatter-add (round 4, VERDICT #3).

The compacted step's remaining ~27 ms is three density-plane (+three
appearance-plane) scatter-adds that XLA emits at ~45 ns/update-row.  The
candidate attack (march-order run compression: pre-sum consecutive
same-cell samples, mark redundant rows out-of-bounds) only wins if:
  (a) OOB update rows cost ~nothing in the emit loop (XLA drops them),
  (b) the emit cost is per-row, not per-byte (C-independent),
and run lengths average ~2.2 (scripts/scatter_probe.py --runlen; measured
round 4), so run-sums would cut effective rows to ~0.45N.

This measures (a) and (b) directly:  scatter [N, C] -> [90000, C] with a
sweep over OOB fraction and C, plus n_rows and sortedness sensitivity.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N = 524288
    n_rows = 90000
    rng = np.random.default_rng(0)

    @jax.jit
    def scat(idx, upd):
        C = upd.shape[1]
        return jnp.zeros((n_rows, C), jnp.float32).at[idx].add(upd)

    print(f"{'case':42s} {'ms':>8s} {'ns/valid_row':>13s}")
    base_idx = rng.integers(0, n_rows, N)
    for C in (8, 64, 128, 192):
        upd = jnp.asarray(rng.random((N, C)), jnp.float32)
        t = timeit(scat, jnp.asarray(base_idx), upd)
        print(f"C={C:<4d} all-valid                            "
              f"{t:8.2f} {t*1e6/N:13.1f}")
    upd = jnp.asarray(rng.random((N, 64)), jnp.float32)
    for frac in (0.25, 0.5, 0.75, 0.9):
        idx = base_idx.copy()
        oob = rng.random(N) < frac
        idx[oob] = n_rows + 5   # out of bounds -> dropped by XLA scatter
        t = timeit(scat, jnp.asarray(idx), upd)
        valid = (~oob).sum()
        print(f"C=64 oob={frac:<4.2f}                            "
              f"{t:8.2f} {t*1e6/max(valid,1):13.1f}")
    # sortedness: march-order indices are locally coherent; fully sorted
    # vs random tells whether XLA's internal sort dominates or the emit
    t = timeit(scat, jnp.asarray(np.sort(base_idx)), upd)
    print(f"C=64 pre-sorted                          {t:8.2f}"
          f" {t*1e6/N:13.1f}")
    for rows in (1024, 16384, 270000):
        @jax.jit
        def scat_r(idx, upd, rows=rows):
            return jnp.zeros((rows, 64), jnp.float32).at[idx].add(upd)
        idx = rng.integers(0, rows, N)
        t = timeit(scat_r, jnp.asarray(idx), upd)
        print(f"C=64 n_rows={rows:<7d}                     {t:8.2f}"
              f" {t*1e6/N:13.1f}")


if __name__ == "__main__":
    main()
