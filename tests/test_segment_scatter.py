"""Sorted segment-sum scatter kernel vs .at[].add (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.ops.segment_scatter import (BLOCK_ROWS, CHUNK,
                                                   scatter_add_rows)


@pytest.mark.parametrize("n,rows,c", [
    (5000, 900, 64),          # duplicates, non-multiple rows
    (CHUNK + 7, BLOCK_ROWS, 8),
    (300, 3000, 16),          # mostly-empty destination
])
def test_matches_at_add(n, rows, c):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows, size=n), jnp.int32)
    upd = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    want = jnp.zeros((rows, c), jnp.float32).at[idx].add(upd)
    got = scatter_add_rows(idx, upd, rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hot_rows_and_empty_blocks():
    # every sample lands in two rows of one block; other blocks stay zero
    rng = np.random.default_rng(1)
    n, rows, c = 4 * CHUNK, 4 * BLOCK_ROWS, 32
    idx = jnp.asarray(rng.choice([BLOCK_ROWS + 3, BLOCK_ROWS + 4], size=n),
                      jnp.int32)
    upd = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    want = jnp.zeros((rows, c), jnp.float32).at[idx].add(upd)
    got = scatter_add_rows(idx, upd, rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_prod_bwd_segsum_matches_xla():
    """The full sample_planeline_prod VJP under the segsum plane-scatter
    switch must match the XLA scatter path."""
    import jax

    from joint_tensorf_tpu.ops import sampling

    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.standard_normal((20, 22, 4)), jnp.float32)
    line = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    u, v, w = [jnp.asarray(rng.uniform(-1, 1, 500), jnp.float32)
               for _ in range(3)]

    def loss(p, l, u, v, w):
        return jnp.sum(sampling.sample_planeline_prod(p, l, u, v, w) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(plane, line, u, v, w)
    sampling.set_plane_scatter_impl("segsum")
    try:
        g_new = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(plane, line, u, v, w)
    finally:
        sampling.set_plane_scatter_impl("xla")
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_runsum_compression_matches_xla_scatter():
    """The march-order run-compression transform (ops/sampling._run_compress
    + OOB-marked emission rows) must reproduce .at[].add exactly up to f32
    re-association, including runs longer than the window, singleton runs,
    adjacent runs with the same idx value elsewhere, and all-one-run."""
    import numpy as np

    from joint_tensorf_tpu.ops import sampling

    rng = np.random.default_rng(0)
    n_rows, C = 97, 8
    # runs with lengths 1..11 (window W=4 -> overflow windows exercised)
    lens = rng.integers(1, 12, 300)
    vals = rng.integers(0, n_rows, 300)
    idx = np.repeat(vals, lens).astype(np.int32)
    N = idx.shape[0]
    g = rng.standard_normal((N, C)).astype(np.float32)

    ref = np.zeros((n_rows, C), np.float32)
    np.add.at(ref, idx, g)

    idx2, g2 = sampling._run_compress(jnp.asarray(idx), jnp.asarray(g))
    got = jnp.zeros((n_rows, C), jnp.float32).at[idx2].add(g2, mode="drop")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)

    # emitted (in-bounds) rows == sum over ACTUAL runs of ceil(len/W)
    # (adjacent generated runs with equal values merge into one run)
    W = 4
    run_lens = []
    cur = 1
    for a, b in zip(idx[:-1], idx[1:]):
        if a == b:
            cur += 1
        else:
            run_lens.append(cur)
            cur = 1
    run_lens.append(cur)
    expect_rows = int(sum(-(-l // W) for l in run_lens))
    assert int((np.asarray(idx2) < n_rows).sum()) == expect_rows

    # degenerate: one giant run
    idx1 = np.zeros(64, np.int32)
    g1 = rng.standard_normal((64, C)).astype(np.float32)
    i2, s2 = sampling._run_compress(jnp.asarray(idx1), jnp.asarray(g1))
    got1 = jnp.zeros((n_rows, C), jnp.float32).at[i2].add(s2, mode="drop")
    np.testing.assert_allclose(np.asarray(got1[0]), g1.sum(0), rtol=2e-5,
                               atol=2e-5)
