#!/usr/bin/env python
"""Op-level attribution of the compacted train step via a device trace.

Runs the exact bench.py compacted-phase step under jax.profiler, then parses
the perfetto trace JSON and prints per-op device time grouped by HLO op
name / fusion, so the "unattributed" remainder of the step gets names
(VERDICT round-2 #1a).

Usage:  python scripts/compact_profile.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)


def build():
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
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.0),
        c2f_color=jnp.float32(0.0), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

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

    def it(st, i):
        idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                          .astype(np.int64))
        return step(st, pose_base, intr, intr_inv, images, edges,
                    view_sel, idx, jax.random.PRNGKey(i), s, mask)

    return state, it


def parse_trace(outdir):
    paths = glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid whose process name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    by_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_names.get(e.get("pid"), "")
        if not any(k in pname.lower() for k in ("tpu", "device", "xla")):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        by_op[name] += dur
        count[name] += 1
        total += dur
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    print(f"\ntrace: {path}")
    print(f"total device-op time: {total/1000:.2f} ms (all lanes summed)")
    print(f"{'op':70s} {'ms':>9s} {'n':>5s}")
    for name, us in rows[:60]:
        print(f"{name[:70]:70s} {us/1000:9.3f} {count[name]:5d}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtf_profile"
    state, it = build()
    st = state
    for i in range(3):
        st, m = it(st, i)
        float(m["loss"])
        print(f"warmup {i} ok", flush=True)
    jax.profiler.start_trace(outdir)
    for i in range(8):
        st, m = it(st, 100 + i)
    float(m["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    parse_trace(outdir)


if __name__ == "__main__":
    main()
