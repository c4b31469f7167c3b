#!/usr/bin/env python
"""XLA row scatter-add vs the sorted segment-sum Pallas kernel, at the
compacted train step's production shapes (docs/DESIGN_NOTES.md round-3).
Also validates exactness on the real TPU before timing."""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.segment_scatter import scatter_add_rows

LOOP = 8


def timed(name, fn, *args, iters=3):
    out = fn(jnp.float32(0.0), *args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *args)
    float(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP) * 1000
    print(f"{name:32s}: {dt:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for (n, rows, c) in [(524288, 90000, 64), (131072, 90000, 192),
                         (524288, 300, 32)]:
        idx = jnp.asarray(rng.integers(0, rows, size=n), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)

        want = jnp.zeros((rows, c), jnp.float32).at[idx].add(upd)
        got = scatter_add_rows(idx, upd, rows)
        err = float(jnp.max(jnp.abs(want - got)))
        rel = err / (float(jnp.max(jnp.abs(want))) + 1e-9)
        print(f"[{n}x{c} -> {rows}] max abs err {err:.3e} (rel {rel:.2e})")

        def xla(carry, idx, upd):
            def body(_, cy):
                u = upd + cy * 1e-20
                d = jnp.zeros((rows, c), jnp.float32).at[idx].add(u)
                return cy + jnp.sum(d) * 1e-20
            return jax.lax.fori_loop(0, LOOP, body, carry)

        def pallas(carry, idx, upd):
            def body(_, cy):
                u = upd + cy * 1e-20
                d = scatter_add_rows(idx, u, rows)
                return cy + jnp.sum(d) * 1e-20
            return jax.lax.fori_loop(0, LOOP, body, carry)

        timed(f"xla scatter {n}x{c}->{rows}", jax.jit(xla), idx, upd)
        timed(f"pallas segsum {n}x{c}->{rows}", jax.jit(pallas), idx, upd)


if __name__ == "__main__":
    main()
