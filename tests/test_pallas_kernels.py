"""Pallas compositor vs jnp reference: forward and custom VJP.

The kernels auto-select interpreter mode on the CPU test backend; the same
code compiles natively on TPU (exercised by scripts/pallas_bench.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.ops.pallas_kernels import (composite_pallas,
                                                  composite_reference)


def make_inputs(n=100, s=33, seed=0):
    rng = np.random.default_rng(seed)
    alpha = jnp.asarray(rng.uniform(0, 0.6, (n, s)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, s, 3)), jnp.float32)
    z = jnp.asarray(np.sort(rng.uniform(2, 6, (n, s)), axis=-1), jnp.float32)
    return alpha, rgb, z


def test_forward_matches_reference():
    alpha, rgb, z = make_inputs()
    out_p = composite_pallas(alpha, rgb, z)
    out_r = composite_reference(alpha, rgb, z)
    for p, r, name in zip(out_p, out_r, ["rgb", "depth", "acc", "weights"]):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=1e-5,
                                    err_msg=name)


def test_backward_matches_reference():
    alpha, rgb, z = make_inputs(n=40, s=17)

    def loss_p(alpha, rgb, z):
        rgb_map, depth, acc, w = composite_pallas(alpha, rgb, z)
        # use a loss touching rgb_map, acc (white bg) like the renderer does
        out = rgb_map + (1.0 - acc[..., None])
        return jnp.sum(out**2) + 0.1 * jnp.sum(depth * 0)

    def loss_r(alpha, rgb, z):
        rgb_map, depth, acc, w = composite_reference(alpha, rgb, z)
        out = rgb_map + (1.0 - acc[..., None])
        return jnp.sum(out**2) + 0.1 * jnp.sum(depth * 0)

    g_p = jax.grad(loss_p, argnums=(0, 1))(alpha, rgb, z)
    g_r = jax.grad(loss_r, argnums=(0, 1))(alpha, rgb, z)
    np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_r[0]),
                                atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_p[1]), np.asarray(g_r[1]),
                                atol=2e-5)


def test_backward_with_weights_cotangent():
    alpha, rgb, z = make_inputs(n=16, s=9, seed=3)

    def loss_p(alpha):
        rgb_map, depth, acc, w = composite_pallas(alpha, rgb, z)
        return jnp.sum(w * jnp.arange(9)[None, :])

    def loss_r(alpha):
        rgb_map, depth, acc, w = composite_reference(alpha, rgb, z)
        return jnp.sum(w * jnp.arange(9)[None, :])

    g_p = jax.grad(loss_p)(alpha)
    g_r = jax.grad(loss_r)(alpha)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=2e-5)


def test_depth_gradient_through_z():
    alpha, rgb, z = make_inputs(n=8, s=9, seed=4)

    def loss_p(z):
        _, depth, _, _ = composite_pallas(alpha, rgb, z)
        return jnp.sum(depth**2)

    def loss_r(z):
        _, depth, _, _ = composite_reference(alpha, rgb, z)
        return jnp.sum(depth**2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_p)(z)),
                               np.asarray(jax.grad(loss_r)(z)), atol=2e-5)
