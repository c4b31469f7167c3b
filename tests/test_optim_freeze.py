"""Regression tests for the round-4 appknone NaN (dense-appearance arm died
with a NaN aabb at the first upsample):

1. Adam zero-lr leaves must be EXACTLY frozen — ``p - 0 * m`` propagates a
   non-finite moment into the parameter (0 * NaN = NaN), so the update must
   select the old value instead of scaling by zero.
2. The renderer must treat the field aabb as a BUFFER (reference registers
   it with requires_grad=False, tensorBase.py:430): d(loss)/d(aabb) == 0,
   so no upstream non-finite cotangent can ever reach it.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.render.renderer import RenderConfig, render_rays
from joint_tensorf_tpu.train.optim import AdamState, adam_init, adam_update


def test_zero_lr_leaf_survives_nan_grad():
    params = {"hot": jnp.ones((3,)), "frozen": jnp.asarray([1.0, 2.0])}
    grads = {"hot": jnp.asarray([1.0, jnp.nan, 1.0]),
             "frozen": jnp.asarray([jnp.nan, jnp.inf])}
    lr = {"hot": jnp.float32(0.1), "frozen": jnp.zeros(())}
    new_p, _ = adam_update(grads, adam_init(params), params, lr)
    # frozen leaf: bit-identical despite non-finite grads
    np.testing.assert_array_equal(np.asarray(new_p["frozen"]),
                                  np.asarray(params["frozen"]))
    # hot leaf: the NaN lane is poisoned (expected — the latch catches it),
    # finite lanes still step
    assert np.isfinite(np.asarray(new_p["hot"]))[0]
    assert not np.isfinite(np.asarray(new_p["hot"]))[1]


def test_zero_lr_matches_plain_adam_when_finite():
    params = {"a": jnp.arange(4.0)}
    grads = {"a": jnp.asarray([0.5, -0.25, 1.0, 0.0])}
    st = adam_init(params)
    stepped, _ = adam_update(grads, st, params, {"a": jnp.float32(0.01)})
    frozen, _ = adam_update(grads, st, params, {"a": jnp.zeros(())})
    assert not np.allclose(np.asarray(stepped["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(frozen["a"]),
                                  np.asarray(params["a"]))


def test_render_has_zero_aabb_gradient():
    cfg = vm_lib.VMConfig(density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6),
                          app_dim=9, shading_mode="MLP_Fea", hidden=16)
    state = vm_lib.init_vm(jax.random.PRNGKey(0), cfg, (16, 16, 16),
                           [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
                           init_scale=0.3, init_bias=0.1)
    head = cfg.shading_head()
    rng = np.random.default_rng(0)
    n = 16
    centers = jnp.asarray(np.tile([[0.0, 0.0, -4.0]], (n, 1)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)) * [0.25, 0.25, 0.02]
                       + [0, 0, 1], jnp.float32)
    rcfg = RenderConfig(n_samples=64, is_train=True)

    def loss(field):
        rgb, _, _ = render_rays(field, cfg, rcfg, head, centers, dirs,
                                jax.random.PRNGKey(1),
                                jnp.array([2.0, 6.0]))
        return jnp.sum(rgb ** 2)

    g = jax.grad(loss)(state)
    np.testing.assert_array_equal(np.asarray(g.aabb), 0.0)
    # the field grads themselves must be finite and (planes) nonzero
    leaves = jax.tree_util.tree_leaves(
        dataclasses.replace(g, aabb=jnp.zeros((2, 3))))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
