"""Binned Pallas plane-scatter VJP vs the jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joint_tensorf_tpu.ops.binned_scatter import sample_plane_binned
from joint_tensorf_tpu.ops.sampling import sample_plane


def _rand(key, H, W, R, N, spread=1.2):
    k1, k2, k3 = jax.random.split(key, 3)
    plane = jax.random.normal(k1, (H, W, R), jnp.float32)
    # spread > 1 exercises out-of-range clamping
    u = jax.random.uniform(k2, (N,), minval=-spread, maxval=spread)
    v = jax.random.uniform(k3, (N,), minval=-spread, maxval=spread)
    return plane, u, v


@pytest.mark.parametrize("H,W,R,N", [
    (37, 53, 16, 1000),     # odd sizes, multiple tiles
    (12, 12, 8, 300),       # single-ish tile
    (64, 64, 64, 2048),     # fused-width channels
])
def test_forward_matches(H, W, R, N):
    plane, u, v = _rand(jax.random.PRNGKey(0), H, W, R, N)
    np.testing.assert_allclose(
        np.asarray(sample_plane_binned(plane, u, v)),
        np.asarray(sample_plane(plane, u, v)), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("H,W,R,N", [
    (37, 53, 16, 1000),
    (64, 64, 64, 2048),
    (11, 9, 4, 130),
])
def test_vjp_matches(H, W, R, N):
    plane, u, v = _rand(jax.random.PRNGKey(1), H, W, R, N)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, R), jnp.float32)

    def loss(fn, p, uu, vv):
        return jnp.sum(fn(p, uu, vv) * g)

    d_ref = jax.grad(lambda p, uu, vv: loss(sample_plane, p, uu, vv),
                     argnums=(0, 1, 2))(plane, u, v)
    d_bin = jax.grad(lambda p, uu, vv: loss(sample_plane_binned, p, uu, vv),
                     argnums=(0, 1, 2))(plane, u, v)

    # plane grad: many-sample accumulation -> small float tolerance
    np.testing.assert_allclose(np.asarray(d_bin[0]), np.asarray(d_ref[0]),
                               rtol=1e-4, atol=1e-4)
    # coordinate grads are computed by the identical jnp path
    np.testing.assert_allclose(np.asarray(d_bin[1]), np.asarray(d_ref[1]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_bin[2]), np.asarray(d_ref[2]),
                               rtol=1e-6, atol=1e-6)


def test_vjp_under_jit_and_empty_tiles():
    # heavily clustered samples leave most tiles empty; jit the whole vjp
    H, W, R, N = 101, 101, 32, 4096
    plane = jax.random.normal(jax.random.PRNGKey(3), (H, W, R), jnp.float32)
    u = jax.random.uniform(jax.random.PRNGKey(4), (N,)) * 0.05 - 0.9
    v = jax.random.uniform(jax.random.PRNGKey(5), (N,)) * 0.05 + 0.8
    g = jnp.ones((N, R), jnp.float32)

    def d(fn):
        return jax.jit(jax.grad(lambda p: jnp.sum(fn(p, u, v) * g)))(plane)

    np.testing.assert_allclose(np.asarray(d(sample_plane_binned)),
                               np.asarray(d(sample_plane)),
                               rtol=1e-4, atol=1e-4)
