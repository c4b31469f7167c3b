#!/usr/bin/env python
"""Measure factor-grid gather strategies on the TPU.

The VM sampling hot path is gather-bound; this script compares:
  A. current layout: separate density [H,W,16] / app [H,W,48] f32 gathers
  B. combined rows [H,W,64] f32 (density+app fused, one gather per corner)
  C. combined rows bf16 (half the bytes)
  D. per-corner combined vs 4-corner arithmetic
  E. top-k sample compaction for the appearance pass
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
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # force device completion via host transfer of a small scalar
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf) * 0 + 1)
    return (time.perf_counter() - t0) / iters * 1000


def bilinear_gather(plane, u, v):
    H, W, R = plane.shape
    x = jnp.clip((u + 1) * 0.5 * (W - 1), 0, W - 1)
    y = jnp.clip((v + 1) * 0.5 * (H - 1), 0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    flat = plane.reshape(H * W, R)
    f00 = jnp.take(flat, y0 * W + x0, axis=0)
    f01 = jnp.take(flat, y0 * W + x0 + 1, axis=0)
    f10 = jnp.take(flat, (y0 + 1) * W + x0, axis=0)
    f11 = jnp.take(flat, (y0 + 1) * W + x0 + 1, axis=0)
    out = (f00 * (1 - fy) * (1 - fx) + f01 * (1 - fy) * fx
           + f10 * fy * (1 - fx) + f11 * fy * fx)
    return out


def main():
    N = 2_000_000
    H = W = 300
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)

    den = jnp.asarray(rng.standard_normal((H, W, 16)), jnp.float32)
    app = jnp.asarray(rng.standard_normal((H, W, 48)), jnp.float32)
    comb = jnp.concatenate([den, app], axis=-1)
    comb16 = comb.astype(jnp.bfloat16)
    den16 = den.astype(jnp.bfloat16)

    @jax.jit
    def sep(den, app, u, v):
        return (jnp.sum(bilinear_gather(den, u, v)),
                jnp.sum(bilinear_gather(app, u, v)))

    @jax.jit
    def combined(comb, u, v):
        return jnp.sum(bilinear_gather(comb, u, v))

    @jax.jit
    def combined_bf16(comb16, u, v):
        out = bilinear_gather(comb16.astype(jnp.bfloat16), u, v)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def den_only(den, u, v):
        return jnp.sum(bilinear_gather(den, u, v))

    @jax.jit
    def den_only16(den16, u, v):
        return jnp.sum(bilinear_gather(den16, u, v).astype(jnp.float32))

    print(f"N={N} plane {H}x{W}")
    print(f"A sep den16+app48 f32 : {timeit(sep, den, app, u, v):8.2f} ms")
    print(f"B combined 64 f32     : {timeit(combined, comb, u, v):8.2f} ms")
    print(f"C combined 64 bf16    : {timeit(combined_bf16, comb16, u, v):8.2f} ms")
    print(f"D den-only 16 f32     : {timeit(den_only, den, u, v):8.2f} ms")
    print(f"E den-only 16 bf16    : {timeit(den_only16, den16, u, v):8.2f} ms")

    # F: one fused gather of 4 corners via a single take of 4N indices
    @jax.jit
    def fused_idx(comb, u, v):
        Hh, Ww, R = comb.shape
        x = jnp.clip((u + 1) * 0.5 * (Ww - 1), 0, Ww - 1)
        y = jnp.clip((v + 1) * 0.5 * (Hh - 1), 0, Hh - 1)
        x0 = jnp.clip(jnp.floor(x), 0, Ww - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(y), 0, Hh - 2).astype(jnp.int32)
        fx = (x - x0)
        fy = (y - y0)
        base = y0 * Ww + x0
        idx = jnp.stack([base, base + 1, base + Ww, base + Ww + 1], 0)  # [4,N]
        g = jnp.take(comb.reshape(-1, R), idx.reshape(-1), axis=0)
        g = g.reshape(4, -1, R)
        w = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                       fy * (1 - fx), fy * fx], 0)[..., None]
        return jnp.sum(g * w)

    print(f"F fused-4corner 64 f32: {timeit(fused_idx, comb, u, v):8.2f} ms")

    # G: top-k compaction feasibility: top_k over [2000 x 1000] weights
    wts = jnp.asarray(rng.random((2000, 1000)), jnp.float32)

    @jax.jit
    def topk(wts):
        vals, idx = jax.lax.top_k(wts, 128)
        return jnp.sum(vals) + jnp.sum(idx)

    print(f"G top_k(128) 2000x1000: {timeit(topk, wts):8.2f} ms")

    # H: pure HBM bandwidth reference: stream the same bytes linearly
    big = jnp.asarray(rng.standard_normal((4 * N, 64)), jnp.float32)

    @jax.jit
    def stream(big):
        return jnp.sum(big)

    ms = timeit(stream, big)
    gb = big.size * 4 / 1e9
    print(f"H linear stream {gb:.1f}GB: {ms:8.2f} ms "
          f"({gb/ms*1000:.0f} GB/s)")


if __name__ == "__main__":
    main()
