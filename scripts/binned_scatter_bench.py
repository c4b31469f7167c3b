#!/usr/bin/env python
"""TPU benchmark: binned Pallas plane-scatter VJP vs XLA scatter VJP."""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.binned_scatter import sample_plane_binned
from joint_tensorf_tpu.ops.sampling import sample_plane


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force transfer
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    for (H, W, R, N) in [(300, 300, 64, 2_000_000),
                         (300, 300, 64, 524_288),
                         (128, 128, 64, 886_000)]:
        key = jax.random.PRNGKey(0)
        plane = jax.random.normal(key, (H, W, R), jnp.float32)
        u = jax.random.uniform(key, (N,), minval=-1, maxval=1)
        v = jax.random.uniform(key, (N,), minval=-1, maxval=1)
        g = jax.random.normal(key, (N, R), jnp.float32)

        def make(fn):
            def loss(p, uu, vv, gg):
                return jnp.sum(fn(p, uu, vv) * gg)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        d_ref = make(sample_plane)
        d_bin = make(sample_plane_binned)

        r = d_ref(plane, u, v, g)
        b = d_bin(plane, u, v, g)
        err = float(jnp.max(jnp.abs(r[0] - b[0])) /
                    (jnp.max(jnp.abs(r[0])) + 1e-9))
        t_ref = timeit(d_ref, plane, u, v, g)
        t_bin = timeit(d_bin, plane, u, v, g)
        print(f"[{H}x{W} R={R} N={N}] xla {t_ref:.1f} ms | "
              f"binned {t_bin:.1f} ms | speedup {t_ref/t_bin:.2f}x | "
              f"rel err {err:.2e}", flush=True)

        # forward-only for reference
        f_ref = jax.jit(lambda p, uu, vv: sample_plane(p, uu, vv))
        print(f"    fwd gather {timeit(f_ref, plane, u, v):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
