#!/usr/bin/env python
"""Decompose the sorted-scatter routes at the production shapes (round 5).

Measures, per shape:
  * XLA scatter-add baseline (the thing to beat);
  * argsort of the keys alone;
  * argsort + row permute of the updates (the shared preprocessing of any
    sorted scheme — scripts/scatter_probe.py argues this alone is a row op
    of the scatter's magnitude);
  * segment_scatter (one-hot matmul accumulate, round-3 kernel) total;
  * tile_scatter (VMEM row-RMW accumulate, round-5 kernel) total;
  * each kernel's accumulate-only portion (pre-sorted inputs), isolating
    the in-kernel rate from the preprocessing.

The verdict goes to BENCH_NOTES.md / the kernels' STATUS docstrings.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.segment_scatter import scatter_add_rows
from joint_tensorf_tpu.ops.tile_scatter import scatter_add_rows_tiled


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    # [N, C] -> rows: compacted-phase density (524k,64)->90k/160k
    # (300^2 / 400^2 destinations) and appearance (131k,192)
    for (n, rows, c) in [(524288, 90000, 64), (524288, 160000, 64),
                         (131072, 160000, 192)]:
        idx = jnp.asarray(rng.integers(0, rows, size=n), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

        want = jnp.zeros((rows, c), jnp.float32).at[idx].add(upd)
        got = scatter_add_rows_tiled(idx, upd, rows)
        err = float(jnp.max(jnp.abs(want - got)))
        print(f"[{n}x{c} -> {rows}] tile_scatter max abs err {err:.3e}")

        xla = jax.jit(lambda i, u: jnp.zeros((rows, c), jnp.float32)
                      .at[i].add(u))
        srt = jax.jit(lambda i: jnp.argsort(i))
        perm = jax.jit(lambda i, u: (jnp.take(i, jnp.argsort(i)),
                                     jnp.take(u, jnp.argsort(i), axis=0)))
        seg = jax.jit(lambda i, u: scatter_add_rows(i, u, rows))
        til = jax.jit(lambda i, u: scatter_add_rows_tiled(i, u, rows))

        t_xla = timeit(xla, idx, upd)
        t_sort = timeit(srt, idx)
        t_perm = timeit(perm, idx, upd)
        t_seg = timeit(seg, idx, upd)
        t_til = timeit(til, idx, upd)
        # accumulate-only: feed PRE-SORTED inputs; the internal argsort of
        # a sorted key array still runs but its permute gather becomes the
        # identity (same row count — honest lower bound is t_total minus
        # the measured sort+permute delta instead)
        print(f"  xla scatter        {t_xla:7.2f} ms  "
              f"({t_xla/n*1e6:5.1f} ns/row)")
        print(f"  argsort            {t_sort:7.2f} ms")
        print(f"  argsort+permute    {t_perm:7.2f} ms")
        print(f"  segsum total       {t_seg:7.2f} ms  "
              f"(accumulate ~{t_seg - t_perm:5.2f})")
        print(f"  tilesum total      {t_til:7.2f} ms  "
              f"(accumulate ~{t_til - t_perm:5.2f})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
