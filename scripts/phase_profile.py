#!/usr/bin/env python
"""Op-level device-trace attribution for ANY bench phase (round 4).

Generalizes compact_profile.py to the three bench.py phases so the dense
(blur-active) step — the round-4 attack target (VERDICT #2) — gets the
same per-op time table the compacted step got in round 3.

Usage:
  python scripts/phase_profile.py dense [outdir] [key=value ...]
  python scripts/phase_profile.py early bf=1      # densify_dtype=bfloat16
  python scripts/phase_profile.py compact

Overrides: bf=1 (bfloat16 rows), app_k=N, impl=lane|packed8, rays=N,
samples=N, res=N, reps=N, scatter=xla|segsum|runsum, compact_k=N
(dense/early: bbox-style compaction budget).
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

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joint_tensorf_tpu.models import vm as vm_lib
from joint_tensorf_tpu.models.alpha_mask import AlphaMask, pack_neighborhoods
from joint_tensorf_tpu.render.renderer import BlurSpec
from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                          init_train_state, make_train_step)


def build(phase: str, kv: dict):
    if kv.get("scatter"):
        from joint_tensorf_tpu.ops.sampling import set_plane_scatter_impl
        set_plane_scatter_impl(str(kv["scatter"]))
    n_views, H, W = 100, 400, 400
    n_rays_total = int(kv.get("rays", 2048))
    rays_per_view = max(1, n_rays_total // n_views)
    vm_cfg = vm_lib.VMConfig()
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]

    if phase == "early":
        res, n_samples, blur = (128,) * 3, 443, True
    elif phase == "dense":
        res, n_samples, blur = (300,) * 3, 1000, True
    else:
        res, n_samples, blur = (300,) * 3, 1000, False
    res = (int(kv.get("res", res[0])),) * 3
    n_samples = int(kv.get("samples", n_samples))

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
    blur_scalar = 0.05 if blur else 0.0
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(blur_scalar),
        c2f_color=jnp.float32(blur_scalar), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb,
                             n_views)
    mask = None
    cfg = StepConfig(
        H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
        n_samples=n_samples, pose_opt=True, use_pose_noise=True,
        densify_density=True,
        densify_impl=str(kv.get("impl", "lane")),
        densify_dtype="bfloat16" if kv.get("bf") else "float32",
        # app_k=0 -> None (dense/fused appearance; tpu.app_k_dense_only)
        app_k=(None if kv.get("app_k") == "0"
               else int(kv["app_k"]) if kv.get("app_k") else 64),
        compact_k=int(kv["compact_k"]) if kv.get("compact_k") else None,
        blur=BlurSpec(mode="uniform-gaussian", kernel_size=64)
        if blur else None)
    if kv.get("blurmask") and phase in ("dense", "early"):
        # dilated-mask blur-active culling (bench.py dense_blur_mask
        # mirror): solids-like opaque balls -> dilate by the kernel
        # support radius; K from compact_k= (default 512; read the real
        # probed value off bench.py's "[bench] dense blur-mask" line)
        from joint_tensorf_tpu.models.alpha_mask import dilate_mask
        ball_rng = np.random.default_rng(11)
        axl = np.linspace(-1.5, 1.5, res[0], dtype=np.float32)
        BX, BY, BZ = np.meshgrid(axl, axl, axl, indexing="ij")
        sharp = np.zeros(res, np.float32)
        for _ in range(6):
            cx, cy, cz = ball_rng.uniform(-0.9, 0.9, 3)
            rad = ball_rng.uniform(0.25, 0.45)
            sharp[(BX - cx) ** 2 + (BY - cy) ** 2 + (BZ - cz) ** 2
                  < rad * rad] = 1.0
        m0 = AlphaMask(grid=jnp.asarray(sharp),
                       aabb=state.params.field.aabb)
        r_blur = int(kv.get("radius", 28))
        mask = dilate_mask(m0, r_blur)
        cfg = dataclasses.replace(
            cfg, use_alpha_mask=True, mask_with_blur=True,
            compact_k=int(kv.get("compact_k", 512)))
    if phase == "compact":
        occ = (rng.random((160, 160, 160)) < 0.001).astype(np.float32)
        from scipy import ndimage
        occ = ndimage.binary_dilation(occ > 0, iterations=8) \
            .astype(np.float32)
        occ_grid = jnp.asarray(occ)
        mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                         packed=pack_neighborhoods(occ_grid))
        cfg = dataclasses.replace(cfg, use_alpha_mask=True, compact_k=256,
                                  densify_density=False, blur=None)
    step = make_train_step(cfg, vm_cfg, head)

    def it(st, i):
        idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                          .astype(np.int64))
        return step(st, pose_base, intr, intr_inv, images, edges,
                    view_sel, idx, jax.random.PRNGKey(i), s, mask)

    def lower():
        idx = jnp.asarray(np.arange(rays_per_view, dtype=np.int64))
        return step.lower(state, pose_base, intr, intr_inv, images, edges,
                          view_sel, idx, jax.random.PRNGKey(0), s, mask)

    return state, it, lower


def dump_hlo(lower, names, path="/tmp/phase_hlo.txt"):
    """Write the optimized HLO and print each named op's definition line
    plus its fused computation's source files, so the trace's fusion.N
    times get real names."""
    import re
    txt = lower().compile().as_text()
    with open(path, "w") as f:
        f.write(txt)
    print(f"HLO written to {path} ({len(txt)} bytes)")
    for name in names:
        m = re.search(rf"%?{re.escape(name)} = [^\n]*", txt)
        if not m:
            print(f"\n== {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"\n== {name}: {line[:320]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            bm = re.search(
                rf"%?{re.escape(comp)} [^\n]*\n(.*?)\n}}", txt, re.S)
            if bm:
                body = bm.group(1)
                files = re.findall(
                    r'source_file="([^"]+)" source_line=(\d+)', body)
                hist = {}
                for f_, l_ in files:
                    key = f"{f_.split('/')[-1]}:{l_}"
                    hist[key] = hist.get(key, 0) + 1
                top = sorted(hist.items(), key=lambda kv: -kv[1])[:8]
                print("   sources:", ", ".join(f"{k}x{v}" for k, v in top))



def parse_trace(outdir, reps):
    paths = glob.glob(os.path.join(outdir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
    print(f"total device-op time: {total/1000:.2f} ms "
          f"({total/1000/reps:.2f} ms/step over {reps} steps)")
    print(f"{'op':70s} {'ms/step':>9s} {'n':>5s}")
    for name, us in rows[:60]:
        print(f"{name[:70]:70s} {us/1000/reps:9.3f} {count[name]:5d}")


def main():
    args = sys.argv[1:]
    phase = args[0] if args else "dense"
    kv = dict(a.split("=", 1) for a in args[1:] if "=" in a)
    outdir = next((a for a in args[1:] if "=" not in a), "/tmp/jtf_profile")
    reps = int(kv.get("reps", 8))
    state, it, lower = build(phase, kv)
    if kv.get("dump"):
        dump_hlo(lower, [x for x in kv["dump"].split(",") if x])
        if kv.get("dump_only"):
            return
    st = state
    for i in range(3):
        st, m = it(st, i)
        float(m["loss"])
        print(f"warmup {i} ok", flush=True)
    # median-of-3 pipelined timing alongside the trace
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            st, m = it(st, 10 + r * 5 + i)
        float(m["loss"])
        print(f"batch {r}: {(time.perf_counter()-t0)/5*1000:.1f} ms/step",
              flush=True)
    jax.profiler.start_trace(outdir)
    for i in range(reps):
        st, m = it(st, 100 + i)
    float(m["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    parse_trace(outdir, reps)


if __name__ == "__main__":
    main()
