"""Row scatter-add as a sorted segment-sum Pallas kernel (round 3).

STATUS: measured DEAD END on v5e for the production destinations — kept,
tested and benchmarked as the design-space record (like
ops/binned_scatter.py).  scripts/segment_scatter_bench.py (2026-08-20,
double-buffered DMA, CHUNK=2048): 17.2 vs XLA's 9.3 ms at [524k,64]->90k,
9.7 vs 4.3 at [131k,192]->90k.  The fundamental cost is the one-hot
over-compute: FLOPs = N x BLOCK_ROWS x C, and shrinking BLOCK_ROWS
proportionally inflates the chunk-alignment slack, so the product does not
converge below XLA's ~45 ns/row scatter emit for ~90k-row destinations.
The one-hot-matmul trick only wins when the destination is small enough
for a SINGLE matmul (the [300, 2R] line factors — ops/sampling.py
_scatter_rows_matmul, a measured ~3x win).  The `tpu.plane_scatter`
switch stays default "xla".

The factor-grid gradients are row scatter-adds:

    d_packed = zeros([n_rows, C]).at[idx].add(updates)     # idx: [N]

XLA lowers this to a sort (cheap, ~0.4 ms at 524k keys) followed by a
row-at-a-time scatter emit that measured ~45 ns/update-row on v5e — 6.7 ms
per density plane at the compacted phase, 20 ms/step over three axes
(docs/DESIGN_NOTES.md round-3 profile).  Roofline for the same bytes is
~0.25 ms.

This kernel converts the scatter into dense MXU math:

  1. (XLA side) sort the indices ascending and permute the updates — one
     cheap key sort + one packed row gather;
  2. partition output rows into blocks of ``BLOCK_ROWS``; sorted samples
     for one block form a CONTIGUOUS range, found with searchsorted;
  3. (Pallas) grid over output blocks; each program DMAs its sample range
     (aligned out to CHUNK boundaries) and accumulates, per 128-sample
     group,

         out_block += (iota_row + base == idx_group)^T-free one-hot
                      [BLOCK_ROWS, 128] @ updates_group [128, C]

     The one-hot is built directly in the transposed orientation (row
     iota on sublanes vs the group's indices on lanes), so no in-kernel
     reshapes or transposes are needed.  Samples from neighboring blocks
     that ride in via alignment slack simply match no row; sorted-pad
     samples carry idx = n_rows and only ever touch the padded output
     rows, which the caller slices off.  f32 one-hots keep every product
     exact — only the summation order differs from XLA's scatter.

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
CHUNK = 2048          # samples per DMA step
GROUP = 128           # samples per one-hot matmul (lane width)
NBUF = 2              # double-buffered DMA slots


def _kernel(C: int, starts_ref, idx_hbm, upd_hbm, out_ref):
    j = pl.program_id(0)
    base = j * BLOCK_ROWS
    s0 = starts_ref[j]
    s1 = starts_ref[j + 1]
    a0 = (s0 // CHUNK) * CHUNK            # align the range out to chunks
    n_chunks = pl.cdiv(s1 - a0, CHUNK)

    out_ref[:] = jnp.zeros_like(out_ref)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, GROUP), 0)

    def scoped(idx_vmem, upd_vmem, sem_i, sem_u):
        def start_dma(c, slot):
            off = a0 + c * CHUNK
            ci = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(off // GROUP, CHUNK // GROUP), :],
                idx_vmem.at[slot], sem_i.at[slot])
            cu = pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, CHUNK), :],
                upd_vmem.at[slot], sem_u.at[slot])
            ci.start()
            cu.start()
            return ci, cu

        @pl.when(n_chunks > 0)
        def _():
            start_dma(0, 0)

        def body(c, _):
            slot = jax.lax.rem(c, NBUF)

            @pl.when(c + 1 < n_chunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, NBUF))

            # wait for this slot's copies
            off = a0 + c * CHUNK
            pltpu.make_async_copy(
                idx_hbm.at[pl.ds(off // GROUP, CHUNK // GROUP), :],
                idx_vmem.at[slot], sem_i.at[slot]).wait()
            pltpu.make_async_copy(
                upd_hbm.at[pl.ds(off, CHUNK), :],
                upd_vmem.at[slot], sem_u.at[slot]).wait()

            acc = jnp.zeros_like(out_ref)
            for g in range(CHUNK // GROUP):
                rows_g = idx_vmem[slot, g:g + 1, :] - base  # [1, GROUP]
                onehot = (row_iota == rows_g).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    onehot, upd_vmem[slot, g * GROUP:(g + 1) * GROUP, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] += acc.astype(out_ref.dtype)
            return ()

        jax.lax.fori_loop(0, n_chunks, body, ())

    pl.run_scoped(
        scoped,
        idx_vmem=pltpu.VMEM((NBUF, CHUNK // GROUP, GROUP), jnp.int32),
        upd_vmem=pltpu.VMEM((NBUF, CHUNK, C), jnp.float32),
        sem_i=pltpu.SemaphoreType.DMA((NBUF,)),
        sem_u=pltpu.SemaphoreType.DMA((NBUF,)),
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
    # Mosaic HBM slices must be 128-lane-aligned on the channel dim: pad C
    # up (the extra DMA bytes are cheap next to the scatter win)
    C_pad = -(-C // 128) * 128

    idx = idx.astype(jnp.int32)
    order = jnp.argsort(idx)
    idx_s = jnp.take(idx, order)
    upd_s = jnp.take(updates, order, axis=0)
    # pad the sample axis so aligned CHUNK slices never run off the end;
    # padded entries carry idx = n_rows (sorted-last) and land in the
    # parked output rows [n_rows, padded_rows), sliced off below
    pad_n = (-N) % CHUNK + CHUNK
    idx_s = jnp.pad(idx_s, (0, pad_n), constant_values=n_rows)
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
                (BLOCK_ROWS, C_pad), lambda j, *_: (j, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, C_pad),
                                       updates.dtype),
        interpret=interpret,
    )(starts, idx_s.reshape(-1, GROUP), upd_s)
    return out[:n_rows, :C]
