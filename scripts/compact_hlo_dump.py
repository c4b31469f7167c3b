#!/usr/bin/env python
"""Dump the compacted train step's optimized HLO and summarize hot fusions.

Companion to compact_profile.py: the trace names ops `fusion.N`; this prints
each requested fusion's computation body (root + a few lines) so the trace's
per-op times get real names.
"""
import re
import sys

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from scripts.compact_profile import build
    state, it = build()
    # grab the jitted step fn + example args from build()'s closure
    # simpler: re-lower here by calling it once with trace capture off
    import joint_tensorf_tpu  # noqa

    # Rebuild exactly like compact_profile.build does, but lower instead
    from joint_tensorf_tpu.models import vm as vm_lib
    from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
    from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                              init_train_state, make_train_step)
    n_views, H, W = 100, 400, 400
    rays_per_view = 20
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    rng = np.random.default_rng(0)
    from joint_tensorf_tpu.data.synthetic import sphere_poses
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911) * (W / 800)
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    from joint_tensorf_tpu.train.step import default_scalars
    s = default_scalars(n_views)
    occ = (rng.random((160, 160, 160)) < 0.001).astype(np.float32)
    from scipy import ndimage
    occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(np.float32)
    occ_grid = jnp.asarray(occ)
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, (300,) * 3,
                             aabb, n_views)
    mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                     packed=pack_neighborhoods(occ_grid))
    cfg = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
                     n_samples=1000, pose_opt=True, use_pose_noise=True,
                     use_alpha_mask=True, compact_k=256,
                     densify_density=False, app_k=64)
    step = make_train_step(cfg, vm_cfg, head)
    idx = jnp.asarray(np.arange(rays_per_view, dtype=np.int64))
    lowered = step.lower(state, pose_base, intr, intr_inv, images, edges,
                         view_sel, idx, jax.random.PRNGKey(0), s, mask)
    txt = lowered.compile().as_text()
    with open("/tmp/compact_step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)/1e6:.1f} MB -> /tmp/compact_step_hlo.txt")

    wanted = sys.argv[1:] or ["fusion.7 ", "fusion.72", "fusion.73",
                              "fusion.74", "fusion.75", "fusion.76",
                              "fusion.77", "fusion.58", "fusion.59",
                              "fusion.78", "fusion.85", "fusion.10 ",
                              "fusion.46", "while.67",
                              "dynamic-update-slice.230"]
    # print the call site line (shows shape + computation name) for each
    for w in wanted:
        pat = re.compile(r"^\s*%?" + re.escape(w.strip()) + r" = .*$",
                         re.MULTILINE)
        m = pat.search(txt)
        if m:
            line = m.group(0)
            print("\n### ", line[:500])
            # find metadata op_name hints
            meta = re.search(r'metadata=\{[^}]*\}', line)
            if meta:
                print("    ", meta.group(0)[:400])


if __name__ == "__main__":
    main()
