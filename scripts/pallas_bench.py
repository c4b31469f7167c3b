#!/usr/bin/env python
"""Validate + benchmark the Pallas compositor natively on TPU vs the jnp
reference (forward and backward)."""
import sys
import time

sys.path.insert(0, ".")
from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.pallas_kernels import (composite_pallas,
                                                  composite_reference)


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]) * 0 + 1)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N, S = 2048, 1024
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.uniform(0, 0.5, (N, S)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (N, S, 3)), jnp.float32)
    z = jnp.asarray(np.sort(rng.uniform(2, 6, (N, S)), -1), jnp.float32)

    p_f = jax.jit(composite_pallas)
    r_f = jax.jit(composite_reference)

    # correctness on-device
    out_p = p_f(alpha, rgb, z)
    out_r = r_f(alpha, rgb, z)
    for a, b, name in zip(out_p, out_r, ["rgb", "depth", "acc", "w"]):
        scale = float(jnp.abs(b).max()) + 1e-8
        err = float(jnp.abs(a - b).max()) / scale
        print(f"native {name} max rel err: {err:.2e}")
        assert err < 5e-4, name  # exp(matmul-cumsum(log)) rounding over S=1024

    def loss_p(alpha, rgb, z):
        rm, d, a, w = composite_pallas(alpha, rgb, z)
        return jnp.sum((rm + (1 - a[:, None])) ** 2)

    def loss_r(alpha, rgb, z):
        rm, d, a, w = composite_reference(alpha, rgb, z)
        return jnp.sum((rm + (1 - a[:, None])) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))
    ga, gb = gp(alpha, rgb, z), gr(alpha, rgb, z)
    print(f"native d_alpha max err: {float(jnp.abs(ga[0]-gb[0]).max()):.2e}")

    print(f"fwd  pallas: {timeit(p_f, alpha, rgb, z):7.2f} ms | "
          f"jnp: {timeit(r_f, alpha, rgb, z):7.2f} ms")
    print(f"grad pallas: {timeit(gp, alpha, rgb, z):7.2f} ms | "
          f"jnp: {timeit(gr, alpha, rgb, z):7.2f} ms")


if __name__ == "__main__":
    main()
