"""Pallas TPU kernels for the rendering hot path.

STATUS (round 5, VERDICT round-4 #5 wire-or-retire): RETIRED from the
production path, kept + tested as the design-space record (like
ops/segment_scatter.py).  Two independent reasons:
  1. Measured loss: Mosaic has no native cumsum, so the kernel's O(S^2)
     triangular-matmul transmittance substitute costs more than XLA's
     fused linear-time chain at production S (grad 27 vs 10 ms at S~1000,
     scripts/pallas_bench.py round 1) — and the jnp path has since gained
     the division-free analytic-VJP exclusive_cumprod (ops/composite.py),
     widening the gap.
  2. Structural: the kernel shades ALL samples densely (it needs
     `fused_app_feat` for every sample), so it cannot compose with the
     two-stage appearance gate (`app_k`, the static-shape analogue of the
     reference's weight>thres gather) that every production phase runs —
     the config that could use it (dense appearance) is the measured
     -6 dB-slower-but-exact bisect arm, where compositing is a rounding
     error next to the dense shading cost.
`RenderConfig.use_pallas_composite` remains the opt-in for experiments;
no shipped config sets it.

The kernel: a fused volume compositor — alpha, exclusive transmittance,
weights, and the weighted RGB/depth/opacity reductions in one VMEM pass over
the samples axis, with a hand-derived custom VJP (also a Pallas kernel).
The jnp reference implementation lives in ops/composite.py / the renderer;
tests validate both forward and backward against it.

Why the compositor and not the gathers: on TPU, random factor-grid gathers
are fastest through XLA's native gather (measured in
scripts/gather_experiments.py — a 64-wide fused row gather is within ~2.5x
of linear-stream bandwidth); a Pallas gather would need sample binning by
grid tile to beat it (design sketched in docs/DESIGN_NOTES.md for a later
round).  The compositor, in contrast, is a chain of elementwise +
scan + reduction ops over [N, S] arrays that XLA materializes between ops —
a single VMEM-resident kernel removes those round trips.

Forward math (reference tensorBase.py:57-65, 785-802):
    u_i = 1 - alpha_i + eps,  T_i = prod_{j<i} u_j   (exclusive)
    w_i = alpha_i * T_i
    rgb_map = sum_i w_i * rgb_i ;  depth = sum_i w_i z_i ;  acc = sum_i w_i

Backward (suffix-sum form):  with g_i = dL/dw_i,
    dL/dalpha_i = T_i g_i - (1 / u_i) * sum_{k>i} w_k g_k
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10
_TILE_N = 256


def _interpret() -> bool:
    # compile natively on TPU; interpret elsewhere (CPU tests)
    return jax.default_backend() != "tpu"



def _tri_lower_strict(S, dtype):
    """L[i, j] = 1 where j < i — exclusive-scan matmul operand.

    Mosaic has no cumprod/cumsum primitive; scans become one MXU matmul:
    exclusive_cumsum(x) = x @ L^T with this mask.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (col < row).astype(dtype)


def _excl_cumsum(x, tri):
    """Exclusive cumsum along the last axis via triangular matmul."""
    return jax.lax.dot_general(
        x, tri, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(alpha_ref, rgb_ref, z_ref, rgbmap_ref, depth_ref, acc_ref,
                weights_ref):
    alpha = alpha_ref[:]                                   # [TN, S]
    S = alpha.shape[-1]
    u = 1.0 - alpha + EPS
    tri = _tri_lower_strict(S, alpha.dtype)
    # exclusive transmittance: T_i = exp(sum_{j<i} log u_j);  u in (eps, 1]
    T_excl = jnp.exp(_excl_cumsum(jnp.log(u), tri))
    w = alpha * T_excl                                     # [TN, S]
    weights_ref[:] = w
    acc_ref[:] = jnp.sum(w, axis=-1, keepdims=True)
    depth_ref[:] = jnp.sum(w * z_ref[:], axis=-1, keepdims=True)
    rgb = rgb_ref[:]                                       # [TN, 3, S]
    rgbmap_ref[:] = jnp.sum(w[:, None, :] * rgb, axis=-1)  # [TN, 3]


def _bwd_kernel(alpha_ref, rgb_ref, z_ref, weights_ref,
                g_rgbmap_ref, g_depth_ref, g_acc_ref,
                d_alpha_ref, d_rgb_ref):
    alpha = alpha_ref[:]
    w = weights_ref[:]
    u = 1.0 - alpha + EPS
    rgb = rgb_ref[:]                                       # [TN, 3, S]
    # dL/dw_i = sum_c g_rgb_c rgb_ci + g_depth z_i + g_acc
    g_w = (jnp.sum(g_rgbmap_ref[:][:, :, None] * rgb, axis=1)
           + g_depth_ref[:] * z_ref[:]
           + g_acc_ref[:])                                 # [TN, S]
    S = alpha.shape[-1]
    tri = _tri_lower_strict(S, alpha.dtype)
    # strict suffix sum over k > i = strict-lower matmul with swapped sides
    suffix = jax.lax.dot_general(
        w * g_w, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    T_excl = jnp.exp(_excl_cumsum(jnp.log(u), tri))
    d_alpha_ref[:] = T_excl * g_w - suffix / u
    d_rgb_ref[:] = g_rgbmap_ref[:][:, :, None] * w[:, None, :]


def _pad_to(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@jax.custom_vjp
def composite_pallas(alpha, rgb, z_vals):
    """alpha: [N,S]; rgb: [N,S,3]; z_vals: [N,S]
    -> (rgb_map [N,3], depth [N], acc [N], weights [N,S])."""
    return _composite_fwd_impl(alpha, rgb, z_vals)


def _composite_fwd_impl(alpha, rgb, z_vals):
    N, S = alpha.shape
    Np = -(-N // _TILE_N) * _TILE_N
    alpha_p = _pad_to(alpha, Np)
    rgb_p = _pad_to(jnp.moveaxis(rgb, -1, 1), Np)          # [Np, 3, S]
    z_p = _pad_to(z_vals, Np)
    grid = (Np // _TILE_N,)
    rgbmap, depth, acc, weights = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 3), alpha.dtype),
            jax.ShapeDtypeStruct((Np, 1), alpha.dtype),
            jax.ShapeDtypeStruct((Np, 1), alpha.dtype),
            jax.ShapeDtypeStruct((Np, S), alpha.dtype),
        ],
        interpret=_interpret(),
    )(alpha_p, rgb_p, z_p)
    return (rgbmap[:N], depth[:N, 0], acc[:N, 0], weights[:N])


def _composite_fwd(alpha, rgb, z_vals):
    out = _composite_fwd_impl(alpha, rgb, z_vals)
    return out, (alpha, rgb, z_vals, out[3])


def _composite_bwd(res, grads):
    alpha, rgb, z_vals, weights = res
    g_rgbmap, g_depth, g_acc, g_weights_in = grads
    # (weights output gradient is folded in on the jnp side — rarely used)
    N, S = alpha.shape
    Np = -(-N // _TILE_N) * _TILE_N
    alpha_p = _pad_to(alpha, Np)
    rgb_p = _pad_to(jnp.moveaxis(rgb, -1, 1), Np)
    z_p = _pad_to(z_vals, Np)
    w_p = _pad_to(weights, Np)
    g_rgbmap_p = _pad_to(g_rgbmap, Np)
    g_depth_p = _pad_to(g_depth[:, None], Np)
    g_acc_p = _pad_to(g_acc[:, None], Np)
    grid = (Np // _TILE_N,)
    d_alpha, d_rgb = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, S), alpha.dtype),
            jax.ShapeDtypeStruct((Np, 3, S), alpha.dtype),
        ],
        interpret=_interpret(),
    )(alpha_p, rgb_p, z_p, w_p, g_rgbmap_p, g_depth_p, g_acc_p)
    # fold a (rare) direct weights-output cotangent via the jnp path
    if g_weights_in is not None:
        u = 1.0 - alpha + EPS
        T_incl = jnp.cumprod(u, axis=-1)
        T_excl = jnp.concatenate(
            [jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=-1)
        wg = weights * g_weights_in
        suffix = jnp.cumsum(wg[:, ::-1], axis=-1)[:, ::-1] - wg
        d_alpha = d_alpha[:N] + T_excl * g_weights_in - suffix / u
        d_alpha = _pad_to(d_alpha, Np)
    d_z = g_depth[:, None] * weights        # depth = sum_i w_i z_i
    return (d_alpha[:N], jnp.moveaxis(d_rgb[:N], 1, -1), d_z)


composite_pallas.defvjp(_composite_fwd, _composite_bwd)


def composite_reference(alpha, rgb, z_vals):
    """jnp reference with identical contract (for tests/benchmarks)."""
    u = 1.0 - alpha + EPS
    T_incl = jnp.cumprod(u, axis=-1)
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=-1)
    w = alpha * T_excl
    rgb_map = jnp.sum(w[..., None] * rgb, axis=-2)
    depth = jnp.sum(w * z_vals, axis=-1)
    acc = jnp.sum(w, axis=-1)
    return rgb_map, depth, acc, w
