"""Row scatter-add via a tile-local VMEM accumulator (round 5, VERDICT #1).

STATUS: measured DEAD END on v5e (2026-08-21) — kept, tested and
benchmarked as the design-space record closing the tile-local question
the round-3/4 notes left open.  scripts/tile_scatter_bench.py
decomposition at the production shapes:

    [524k,64]->90k   : XLA scatter 10.3 ms (19.7 ns/row)
                       argsort 2.9 | argsort+permute 13.8
                       segsum total 18.2 (accumulate ~4.4)
                       tilesum total 20.5 (accumulate ~6.7)
    [524k,64]->160k  : XLA 10.1 | sort+permute 13.8 | tilesum 21.5
    [131k,192]->160k : XLA 6.3 (48 ns/row) | sort+permute 6.3
                       | tilesum 11.0 (accumulate ~4.7)

Two independent kill conditions, both now MEASURED rather than argued:
  1. The sorted-route preprocessing (key sort + row permute of the
     updates) alone costs MORE than XLA's entire scatter — 13.8 vs
     10.3 ms — and every sorted scheme pays it (the permute is itself a
     row op at the same ~20 ns/row wall).
  2. The in-kernel accumulate floor: direct VMEM row RMW runs at
     ~12.7 ns/row (≈12 cycles — confirming the round-4 cycle-arithmetic
     estimate of 8-15), the one-hot-matmul accumulate at ~8.4 ns/row;
     neither is far enough below the 19.7 ns/row emit to buy back any
     preprocessing at all.

Conclusion recorded in BENCH_NOTES/DESIGN_NOTES: XLA's scatter emit
(~17-20 ns/update-row, C-independent to 128 lanes) is effectively the
hardware floor for random row scatter-add on this chip; the remaining
compacted-step headroom is algorithmic (fewer rows), not kernel-level.

The tile-local design (what was sketched in docs/DESIGN_NOTES.md
"Binned-gather Pallas kernel", steps 1-4): destination rows are tiled
into blocks; sorted samples for one block form a contiguous range; each
grid program accumulates its samples into a VMEM-resident block with
DIRECT dynamic row read-modify-writes (indices staged in SMEM so the
scalar reads are cheap), and flushes the block once — instead of the
one-hot matmuls of ops/segment_scatter.py and instead of XLA's
row-at-a-time emit.

Equivalent to the reference's autograd scatter into F.grid_sample's
operand (tensoRF.py:230-270 backward); exactness vs .at[].add is pinned
in tests/test_tile_scatter.py (summation order differs only within one
destination row, which scatter-add leaves unspecified anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 4096     # destination rows per grid program (VMEM tile)
CHUNK = 1024          # samples per DMA step
NBUF = 2              # double-buffered DMA slots


def _kernel(C: int, starts_ref, idx_hbm, upd_hbm, out_ref):
    j = pl.program_id(0)
    base = j * BLOCK_ROWS
    s0 = starts_ref[j]
    s1 = starts_ref[j + 1]
    a0 = (s0 // CHUNK) * CHUNK            # align the range out to chunks
    n_chunks = pl.cdiv(s1 - a0, CHUNK)

    out_ref[:] = jnp.zeros_like(out_ref)

    def scoped(idx_smem, upd_vmem, sem_i, sem_u):
        def make_dmas(c, slot):
            off = a0 + c * CHUNK
            ci = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(off, CHUNK)],
                idx_smem.at[pl.ds(slot * CHUNK, CHUNK)], sem_i.at[slot])
            cu = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, CHUNK), :],
                upd_vmem.at[slot], sem_u.at[slot])
            return ci, cu

        @pl.when(n_chunks > 0)
        def _():
            for d in make_dmas(0, 0):
                d.start()

        def body(c, _):
            slot = jax.lax.rem(c, NBUF)

            @pl.when(c + 1 < n_chunks)
            def _():
                for d in make_dmas(c + 1, jax.lax.rem(c + 1, NBUF)):
                    d.start()

            for d in make_dmas(c, slot):
                d.wait()

            # direct VMEM row RMW per sample.  Rows outside this block
            # (alignment slack riding in from neighbours, sorted-pad
            # samples) are parked on the scratch row below the block.
            def sbody(s, _):
                r = idx_smem[slot * CHUNK + s] - base
                in_block = (r >= 0) & (r < BLOCK_ROWS)
                r_safe = jnp.where(in_block, r, BLOCK_ROWS)
                out_ref[pl.ds(r_safe, 1), :] += upd_vmem[
                    slot, pl.ds(s, 1), :]
                return ()

            jax.lax.fori_loop(0, CHUNK, sbody, (), unroll=1)
            return ()

        jax.lax.fori_loop(0, n_chunks, body, ())

    pl.run_scoped(
        scoped,
        idx_smem=pltpu.SMEM((NBUF * CHUNK,), jnp.int32),
        upd_vmem=pltpu.VMEM((NBUF, CHUNK, C), jnp.float32),
        sem_i=pltpu.SemaphoreType.DMA((NBUF,)),
        sem_u=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def scatter_add_rows_tiled(idx, updates, n_rows: int, interpret=None):
    """zeros([n_rows, C]).at[idx].add(updates), via the tile-local kernel.

    idx: [N] integer in [0, n_rows); updates: [N, C] f32.
    interpret=None auto-selects interpreter mode on the CPU backend.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _scatter_add_rows_tiled(idx, updates, n_rows, interpret)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _scatter_add_rows_tiled(idx, updates, n_rows: int, interpret: bool):
    N, C = updates.shape
    n_blocks = -(-n_rows // BLOCK_ROWS)
    C_pad = -(-C // 128) * 128

    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx)
    idx_s = jnp.take(idx, order)
    upd_s = jnp.take(updates, order, axis=0)
    # pad the sample axis so aligned CHUNK slices never run off the end;
    # padded entries carry idx = n_blocks*BLOCK_ROWS and land on each
    # block's scratch rows (the +8 below), discarded at the slice
    pad_n = (-N) % CHUNK + CHUNK
    idx_s = jnp.pad(idx_s, (0, pad_n), constant_values=n_blocks * BLOCK_ROWS)
    upd_s = jnp.pad(upd_s, ((0, pad_n), (0, C_pad - C)))

    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS
    starts = jnp.minimum(
        jnp.searchsorted(idx_s, block_edges, side="left").astype(jnp.int32),
        N)

    out = pl.pallas_call(
        functools.partial(_kernel, C_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                # +8 scratch rows per block park out-of-block samples
                # (8, not 1: Mosaic block shapes need sublane-multiple rows)
                (BLOCK_ROWS + 8, C_pad),
                lambda j, starts: (j, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * (BLOCK_ROWS + 8), C_pad), jnp.float32),
        interpret=interpret,
    )(starts, idx_s, upd_s)

    out = out.reshape(n_blocks, BLOCK_ROWS + 8, C_pad)[:, :BLOCK_ROWS, :]
    return out.reshape(n_blocks * BLOCK_ROWS, C_pad)[:n_rows, :C]
