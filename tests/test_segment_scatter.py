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
