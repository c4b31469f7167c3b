"""Exactness of the tile-local VMEM scatter accumulator (interpret mode).

Pins scatter_add_rows_tiled == zeros.at[idx].add(updates) including
duplicate destinations, empty blocks, non-multiple shapes, and all-OOB-pad
edge cases (ops/tile_scatter.py; summation order within one destination
row is the only latitude, and f32 sums of these magnitudes agree to a
tight tolerance).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.ops.tile_scatter import scatter_add_rows_tiled


@pytest.mark.parametrize("n,rows,c", [
    (4096, 9000, 64),     # production-like: dense duplicates
    (1000, 300, 32),      # tiny destination, non-multiple N and C
    (130, 5000, 192),     # sparse: most blocks empty, C > 128
])
def test_matches_xla_scatter(n, rows, c):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows, size=n), jnp.int32)
    upd = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    want = jnp.zeros((rows, c), jnp.float32).at[idx].add(upd)
    got = scatter_add_rows_tiled(idx, upd, rows)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_single_hot_row():
    # every update targets one row: worst-case duplicate accumulation
    n, rows, c = 2048, 512, 64
    idx = jnp.full((n,), 77, jnp.int32)
    upd = jnp.ones((n, c), jnp.float32)
    got = scatter_add_rows_tiled(idx, upd, rows)
    assert float(got[77, 0]) == n
    assert float(jnp.abs(got).sum()) == n * c


def test_empty_updates_edgecase():
    idx = jnp.zeros((1,), jnp.int32)
    upd = jnp.zeros((1, 8), jnp.float32)
    got = scatter_add_rows_tiled(idx, upd, 100)
    assert float(jnp.abs(got).sum()) == 0.0
