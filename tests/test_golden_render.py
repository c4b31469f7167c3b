"""Golden-value regression test for the full render path.

Pins the end-to-end numeric output of render_rays (sampling -> factor-grid
gather-product -> density activation -> compositing -> shading -> white-bg
blend, with and without the c2f factor blur) for a fixed seeded VM state and
fixed rays.  The semantics are established by the torch-comparison unit
tests (tests/test_ops.py); this test guards against silent regressions in
the composition of those pieces.  Values generated on jax CPU 2026-08-18;
tolerance leaves room for XLA fusion-order drift across versions.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.render.renderer import (BlurSpec, RenderConfig,
                                               render_rays)

GOLDEN_SHARP = {
    "rgb": [0.9855548143386841, 0.9852701425552368, 0.9848434925079346,
            0.9885165691375732, 0.9882934093475342, 0.9879565238952637,
            0.9719141721725464, 0.9713772535324097, 0.970556378364563,
            0.9871247410774231, 0.9868665337562561, 0.9864794611930847],
    "depth": [-0.8636463284492493, -0.8829764723777771,
              -0.7736095786094666, -0.8728310465812683],
    "opacity": [0.029072484001517296, 0.023115133866667747,
                0.05651916190981865, 0.025897489860653877],
}
GOLDEN_BLUR = {
    "rgb": [0.986530601978302, 0.9862657785415649, 0.9858683347702026,
            0.9863680601119995, 0.9861030578613281, 0.9857031106948853,
            0.9810368418693542, 0.9806743860244751, 0.9801191091537476,
            0.9861985445022583, 0.9859210252761841, 0.9855060577392578],
    "depth": [-0.8700335621833801, -0.8692968487739563,
              -0.8330395817756653, -0.8677064776420593],
    "opacity": [0.027107246220111847, 0.02744021825492382,
                0.03816072270274162, 0.027760742232203484],
}


def _setup():
    cfg = vm_lib.VMConfig(density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4),
                          app_dim=9, shading_mode="MLP_Fea", hidden=16)
    head = cfg.shading_head()
    state = vm_lib.init_vm(jax.random.PRNGKey(7), cfg, (12, 12, 12),
                           [-1.5] * 3 + [1.5] * 3)
    state = dataclasses.replace(
        state,
        density_planes=[p * 8.0 for p in state.density_planes],
        density_lines=[l * 8.0 for l in state.density_lines])
    centers = jnp.asarray(np.repeat([[0.0, 0.0, -4.0]], 4, 0), jnp.float32)
    dirs = jnp.asarray([[0, 0, 1], [0.1, 0, 1], [0, 0.1, 1], [-0.1, -0.1, 1]],
                       jnp.float32)
    rcfg = RenderConfig(n_samples=24, is_train=False, white_bg=True)
    return cfg, head, state, rcfg, centers, dirs


def _check(out, golden):
    rgb, depth, opacity = out
    np.testing.assert_allclose(np.asarray(rgb).reshape(-1), golden["rgb"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth).reshape(-1), golden["depth"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(opacity).reshape(-1),
                               golden["opacity"], rtol=2e-4, atol=2e-5)


def test_golden_render_sharp():
    cfg, head, state, rcfg, centers, dirs = _setup()
    out = render_rays(state, cfg, rcfg, head, centers, dirs,
                      jax.random.PRNGKey(0), jnp.array([2.0, 6.0]))
    _check(out, GOLDEN_SHARP)


def test_golden_render_blurred():
    cfg, head, state, rcfg, centers, dirs = _setup()
    out = render_rays(state, cfg, rcfg, head, centers, dirs,
                      jax.random.PRNGKey(0), jnp.array([2.0, 6.0]),
                      blur=BlurSpec(mode="uniform-gaussian", kernel_size=8),
                      c2f_density=jnp.float32(0.2), c2f_color=jnp.float32(0.2))
    _check(out, GOLDEN_BLUR)
    # blur must actually change the output (guards a silently-disabled path)
    sharp = render_rays(state, cfg, rcfg, head, centers, dirs,
                        jax.random.PRNGKey(0), jnp.array([2.0, 6.0]))
    assert np.abs(np.asarray(out[0]) - np.asarray(sharp[0])).max() > 1e-4
