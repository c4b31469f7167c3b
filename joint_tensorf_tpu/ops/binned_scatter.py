"""Binned factor-grid scatter: the Pallas backward pass for plane sampling.

The train step's dominant cost is the VJP of the bilinear plane gathers
(reference: the F.grid_sample backward reached from tensoRF.py:230-270):
XLA lowers it to 4 scatter-adds of ~2M 64-wide rows per axis, measured
~400-600 ms of a dense 2k-ray step on v5e (docs/DESIGN_NOTES.md).

This module replaces that transpose with a binned matmul scatter:

1.  Assign every sample to a TSxTS-cell plane tile; local one-hot size
    P = (TS+1)^2 <= 128 so each sample costs ONE MXU pass (TS=10, P=121).
2.  Group samples by tile with a stable argsort; pad each tile's segment
    to a multiple of the chunk size C so every C-row chunk belongs to
    exactly one tile.  The padding uses gather-only index math (no
    scatter): padded row j maps back to source row via searchsorted over
    per-tile aligned offsets; invalid rows read a zero row.
3.  A Pallas kernel runs one program per chunk.  It builds the [P, C]
    bilinear one-hot weights on the VPU and accumulates
    W @ g -> [P, R] into a per-tile VMEM accumulator.  Consecutive
    chunks of one tile map to the same output block, so Pallas keeps the
    accumulator resident and flushes it exactly once per tile.
4.  The per-tile grads overlap by one row/column (bilinear corners).
    They are folded onto the plane with one reshape/transpose for the
    tile cores plus three strided `.at[::TS].add` updates for the
    shared edges — no scatter anywhere.

Coordinate gradients (the pose path) are produced by `jax.vjp` of a
gather-only closure over the *stop-gradient* plane, so they match the
jnp reference bit-for-bit while XLA never sees the plane scatter.

The public entry `sample_plane_binned` is a drop-in for
`ops.sampling.sample_plane` with a custom VJP.

STATUS (measured v5e, 2026-08-17, scripts/binned_scatter_bench.py): correct
(tests/test_binned_scatter.py) but 0.6-0.7x the throughput of XLA's native
row scatter-add at production shapes — the argsort+pad preprocessing and
one-hot construction outweigh the scatter savings once rows are already
64-wide (see tpu gather facts in docs/DESIGN_NOTES.md).  It is therefore
NOT wired into models/vm.py; kept as the reference implementation for a
future revisit at larger R (where the [P,C]@[C,R] MXU pass amortizes
better) and as documentation of the design space explored.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import sample_plane as _sample_plane_ref

TS = 10          # tile side in cells; local one-hot is (TS+1)^2 = 121 <= 128
P_PAD = 128      # one-hot rows padded to one MXU/VPU sublane tile
CHUNK = 256      # samples per kernel program


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- kernel


def _scatter_kernel(ct_ref, packed_ref, g_ref, out_ref):
    """One chunk: accumulate bilinear one-hot matmul into the tile block.

    packed_ref: [1, C, 8] f32 rows (lx0, ly0, fx, fy, pad...)
    g_ref:      [1, C, R] f32 upstream grads (zero rows for padding)
    out_ref:    [1, P1*P1, R] accumulator for tile ct_ref[i]
    """
    i = pl.program_id(0)
    prev = ct_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (ct_ref[i] != prev))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    pk = packed_ref[0]                       # [C, 8]
    lx0, ly0 = pk[:, 0], pk[:, 1]
    fx, fy = pk[:, 2], pk[:, 3]
    C = pk.shape[0]
    P1 = TS + 1

    # transposed one-hot [P_PAD, C]: W[p, c] = bilinear weight of sample c
    # on local cell p.  Corner offsets in flat local index: +1 (x),
    # +P1 (y), +P1+1 (xy); lx0 <= TS-1 so no row wrap; rows >= P1*P1
    # never match and stay zero.
    p00 = (ly0 * P1 + lx0).astype(jnp.int32)[None, :]      # [1, C]
    iota = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, C), 0)
    w00 = ((1 - fx) * (1 - fy))[None, :]
    w01 = (fx * (1 - fy))[None, :]
    w10 = ((1 - fx) * fy)[None, :]
    w11 = (fx * fy)[None, :]
    W = (jnp.where(iota == p00, w00, 0.0)
         + jnp.where(iota == p00 + 1, w01, 0.0)
         + jnp.where(iota == p00 + P1, w10, 0.0)
         + jnp.where(iota == p00 + P1 + 1, w11, 0.0))

    contrib = jax.lax.dot_general(
        W, g_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [P_PAD, R]
    out_ref[0, :, :] = out_ref[0, :, :] + contrib


def _plane_grad_scatter(g, x0, y0, fx, fy, H, W, R):
    """Scatter bilinear-weighted rows g [N, R] into a [H, W, R] grad grid."""
    N = g.shape[0]
    n_tx = (W - 2) // TS + 1 if W > 1 else 1
    n_ty = (H - 2) // TS + 1 if H > 1 else 1
    T = n_ty * n_tx
    P1 = TS + 1

    tx = x0 // TS
    ty = y0 // TS
    tid = ty * n_tx + tx                                    # [N]

    # ---- group by tile, pad each segment to CHUNK multiples (gather-only)
    perm = jnp.argsort(tid)
    sorted_tid = jnp.take(tid, perm)
    seg_start = jnp.searchsorted(
        sorted_tid, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)
    cnt = seg_start[1:] - seg_start[:-1]                    # [T]
    aligned_cnt = jnp.maximum(-(-cnt // CHUNK), 1) * CHUNK
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_cnt)]).astype(jnp.int32)

    n_pad = -(-N // CHUNK) * CHUNK + T * CHUNK              # static upper bound
    j = jnp.arange(n_pad, dtype=jnp.int32)
    t_j = jnp.clip(
        jnp.searchsorted(aligned_start, j, side="right").astype(jnp.int32) - 1,
        0, T - 1)
    r_j = j - jnp.take(aligned_start, t_j)
    valid = (r_j >= 0) & (r_j < jnp.take(cnt, t_j))
    src = jnp.where(
        valid,
        jnp.take(perm, jnp.clip(jnp.take(seg_start, t_j) + r_j, 0, max(N - 1, 0))),
        N)

    # padded per-sample rows; row N is the zero row
    lx0 = (x0 - tx * TS).astype(jnp.float32)
    ly0 = (y0 - ty * TS).astype(jnp.float32)
    packed = jnp.stack(
        [lx0, ly0, fx.astype(jnp.float32), fy.astype(jnp.float32)], axis=-1)
    packed = jnp.pad(packed, ((0, 1), (0, 4)))              # [N+1, 8]
    g_z = jnp.pad(g.astype(jnp.float32), ((0, 1), (0, 0)))  # [N+1, R]

    n_chunks = n_pad // CHUNK
    packed_pad = jnp.take(packed, src, axis=0).reshape(n_chunks, CHUNK, 8)
    g_pad = jnp.take(g_z, src, axis=0).reshape(n_chunks, CHUNK, R)
    chunk_tile = t_j[::CHUNK]                               # [n_chunks]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, CHUNK, 8), lambda i, ct: (i, 0, 0)),
            pl.BlockSpec((1, CHUNK, R), lambda i, ct: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P_PAD, R), lambda i, ct: (ct[i], 0, 0)),
    )
    tiles = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P_PAD, R), jnp.float32),
        interpret=_interpret(),
    )(chunk_tile, packed_pad, g_pad)

    # ---- overlap-add tiles onto the plane (edges shared between tiles)
    tiles = tiles[:, :P1 * P1, :].reshape(n_ty, n_tx, P1, P1, R)
    Hp, Wp = n_ty * TS + 1, n_tx * TS + 1
    out = jnp.zeros((Hp, Wp, R), jnp.float32)
    core = tiles[:, :, :TS, :TS, :].transpose(0, 2, 1, 3, 4)
    out = out.at[:n_ty * TS, :n_tx * TS].add(
        core.reshape(n_ty * TS, n_tx * TS, R))
    right = tiles[:, :, :TS, TS, :].transpose(0, 2, 1, 3)   # [n_ty, TS, n_tx, R]
    out = out.at[:n_ty * TS, TS::TS].add(right.reshape(n_ty * TS, n_tx, R))
    bottom = tiles[:, :, TS, :TS, :]                        # [n_ty, n_tx, TS, R]
    out = out.at[TS::TS, :n_tx * TS].add(bottom.reshape(n_ty, n_tx * TS, R))
    corner = tiles[:, :, TS, TS, :]                         # [n_ty, n_tx, R]
    out = out.at[TS::TS, TS::TS].add(corner)
    return out[:H, :W]


# ------------------------------------------------------- custom-VJP wrapper


def _pixel_bins(u, v, H, W):
    """Replicates ops.sampling._pix/_floor_frac integer parts."""
    x = jnp.clip((u + 1.0) * 0.5 * (W - 1), 0.0, float(W - 1))
    y = jnp.clip((v + 1.0) * 0.5 * (H - 1), 0.0, float(H - 1))
    x0 = jnp.clip(jnp.floor(x), 0, W - 2 if W > 1 else 0).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2 if H > 1 else 0).astype(jnp.int32)
    return x0, y0, x - x0, y - y0


@jax.custom_vjp
def sample_plane_binned(plane, u, v):
    """Drop-in for ops.sampling.sample_plane with a binned-scatter VJP."""
    return _sample_plane_ref(plane, u, v)


def _fwd(plane, u, v):
    return _sample_plane_ref(plane, u, v), (plane, u, v)


def _bwd(res, g):
    plane, u, v = res
    H, W, R = plane.shape
    x0, y0, fx, fy = _pixel_bins(u, v, H, W)
    d_plane = _plane_grad_scatter(g, x0, y0, fx, fy, H, W, R)
    # coordinate grads (the pose path): vjp of the gather-only closure —
    # the plane is closed over, so XLA differentiates just the bilinear
    # weights (corner re-gathers + elementwise), never the plane scatter.
    _, pull = jax.vjp(
        lambda uu, vv: _sample_plane_ref(jax.lax.stop_gradient(plane), uu, vv),
        u, v)
    d_u, d_v = pull(g)
    return d_plane.astype(plane.dtype), d_u, d_v


sample_plane_binned.defvjp(_fwd, _bwd)
