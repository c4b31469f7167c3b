"""Row scatter-add as a sorted segment-sum Pallas kernel (round 3).

The factor-grid gradients are row scatter-adds:

    d_packed = zeros([n_rows, C]).at[idx].add(updates)     # idx: [N]

XLA lowers this to a sort (cheap, ~0.4 ms at 524k keys) followed by a
row-at-a-time scatter emit that measured ~45 ns/update-row on v5e — 6.7 ms
per density plane at the compacted phase, 20 ms/step over three axes
(docs/DESIGN_NOTES.md round-3 profile).  Roofline for the same bytes is
~0.25 ms.

This kernel closes most of that gap by converting the scatter into
MXU-friendly dense math:

  1. (XLA side) sort the indices ascending and permute the updates — one
     cheap key sort + one packed row gather;
  2. partition output rows into blocks of ``BLOCK_ROWS``; sorted samples
     for one block form a CONTIGUOUS range, found with searchsorted;
  3. (Pallas) grid over output blocks; each program DMAs its sample range
     chunk-by-chunk into VMEM and accumulates

         out_block += onehot(idx_chunk - block_lo)^T @ updates_chunk

     — a [CHUNK, BLOCK_ROWS]^T x [CHUNK, C] matmul per chunk.  The
     one-hot is exact in f32 and built from a lane iota; total matmul
     FLOPs are N * BLOCK_ROWS * C * 2, small for BLOCK_ROWS of a few
     hundred.

Equivalent to the reference's autograd scatter into F.grid_sample's
operand (tensoRF.py:230-270 backward); exactness (vs .at[].add) is pinned
in tests/test_segment_scatter.py including duplicate and empty rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512      # output rows per grid program
CHUNK = 1024          # samples per accumulation step


def _kernel(C: int, starts_ref, idx_hbm, upd_hbm, out_ref):
    j = pl.program_id(0)
    s0 = starts_ref[j]
    s1 = starts_ref[j + 1]
    count = s1 - s0
    base = j * BLOCK_ROWS

    out_ref[:] = jnp.zeros_like(out_ref)

    def scoped(idx_vmem, upd_vmem, sem_i, sem_u):
        def body(c, _):
            off = s0 + c * CHUNK
            ci = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(off, CHUNK), :], idx_vmem, sem_i)
            cu = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, CHUNK), :], upd_vmem, sem_u)
            ci.start()
            cu.start()
            ci.wait()
            cu.wait()
            rows = idx_vmem[:, 0]                            # [CHUNK]
            upd = upd_vmem[:]                                # [CHUNK, C]
            # mask samples past this block's range (the fixed-size slice
            # can run into the next block's samples or the padded tail)
            pos = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]
            in_range = (pos + c * CHUNK) < count
            local = jnp.where(in_range, rows - base, BLOCK_ROWS)
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, BLOCK_ROWS), 1) == local[:, None]
            ).astype(upd.dtype)
            out_ref[:] += jax.lax.dot_general(
                onehot, upd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)
            return ()

        jax.lax.fori_loop(0, pl.cdiv(count, CHUNK), body, ())

    pl.run_scoped(
        scoped,
        idx_vmem=pltpu.VMEM((CHUNK, 1), jnp.int32),
        upd_vmem=pltpu.VMEM((CHUNK, C), jnp.float32),
        sem_i=pltpu.SemaphoreType.DMA(()),
        sem_u=pltpu.SemaphoreType.DMA(()),
    )


def scatter_add_rows(idx, updates, n_rows: int, interpret=None):
    """zeros([n_rows, C]).at[idx].add(updates), via the sorted kernel.

    idx: [N] integer in [0, n_rows); updates: [N, C] f32.
    interpret=None auto-selects interpreter mode on the CPU backend (the
    Mosaic kernel only compiles for TPU), keeping CPU tests runnable.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _scatter_add_rows(idx, updates, n_rows, interpret)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _scatter_add_rows(idx, updates, n_rows: int, interpret: bool):
    N, C = updates.shape
    n_blocks = -(-n_rows // BLOCK_ROWS)
    padded_rows = n_blocks * BLOCK_ROWS

    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx)
    idx_s = jnp.take(idx, order)
    upd_s = jnp.take(updates, order, axis=0)
    # pad the sample axis so in-kernel CHUNK slices never run off the end;
    # padded entries point past every block and are masked by `count`
    pad_n = (-N) % CHUNK + CHUNK
    idx_s = jnp.pad(idx_s, (0, pad_n), constant_values=n_rows)
    upd_s = jnp.pad(upd_s, ((0, pad_n), (0, 0)))

    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLOCK_ROWS
    # padded entries carry idx = n_rows >= every block edge's row range, so
    # they never undercut a start; cap at N so the last block's count
    # excludes the pad.
    starts = jnp.minimum(
        jnp.searchsorted(idx_s, block_edges, side="left").astype(jnp.int32),
        N)

    out = pl.pallas_call(
        functools.partial(_kernel, C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_ROWS, C), lambda j, *_: (j, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((padded_rows, C), updates.dtype),
        interpret=interpret,
    )(starts, idx_s[:, None], upd_s)
    return out[:n_rows]
