#!/usr/bin/env python
"""Microbench: pack_lane_grid VJP (the dense-grid fold) variants at 300^3.

The round-2 custom fold (_pack_bwd) measured ~86 ms standalone in the
full-grad path; roofline for its 460MB-read/108MB-write is ~2.5 ms.  This
times the fold alone and candidate rewrites.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops import lane_grid

LOOP = 4


def timed(name, fn, *args, iters=3):
    out = fn(jnp.float32(0.0), *args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *args)
    float(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP) * 1000
    print(f"{name:28s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    X = Y = Z = 300
    Zb = lane_grid.n_blocks(Z)
    rng = np.random.default_rng(0)
    dP = jnp.asarray(rng.standard_normal((X, Y, Zb, 128)), jnp.float32)

    # current custom fold
    def cur(carry, dP):
        def body(_, cy):
            (dG,) = lane_grid._pack_bwd((X, Y, Z), dP + cy * 1e-20)
            return cy + jnp.sum(dG) * 1e-20
        return jax.lax.fori_loop(0, LOOP, body, carry)

    timed("fold current", jax.jit(cur), dP)

    # optimized fold
    def opt(carry, dP):
        def body(_, cy):
            dG = lane_grid.unpack_lane_grid_T((X, Y, Z), dP + cy * 1e-20)
            return cy + jnp.sum(dG) * 1e-20
        return jax.lax.fori_loop(0, LOOP, body, carry)

    if hasattr(lane_grid, "unpack_lane_grid_T"):
        timed("fold optimized", jax.jit(opt), dP)

    # forward pack, for context
    G = jnp.asarray(rng.standard_normal((X, Y, Z)), jnp.float32)

    def fwd(carry, G):
        def body(_, cy):
            P = lane_grid._pack_lane_grid_impl(G + cy * 1e-20)
            return cy + jnp.sum(P) * 1e-20
        return jax.lax.fori_loop(0, LOOP, body, carry)

    timed("pack forward", jax.jit(fwd), G)


if __name__ == "__main__":
    main()
