#!/usr/bin/env python
"""Measure the sharded train step's collective volume on the virtual mesh
(VERDICT round-4 #7): the scaling model (BENCH_NOTES "Round-3 scaling
model") predicts one full field-gradient psum per step — 69.4 MB f32 at
the Blender headline parameter count.  That accounting is CHECKABLE here
even without a pod: compile the rays-sharded step on an 8-device CPU mesh
and sum the bytes of every all-reduce in the optimized HLO.

Checks, at a small shape (so CPU compile stays fast):
  * measured all-reduce bytes ~= field-grad params x 4 B (+ the pose psum
    and scalar loss/metric reductions, which the model calls negligible);
  * then re-emits the production-shape prediction through the SAME
    verified accounting.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/psum_volume.py
"""
import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import dataclasses

import jax.numpy as jnp
import numpy as np


def collective_bytes(compiled_text):
    """Sum operand bytes of all-reduce/reduce-scatter/all-gather ops."""
    tot = {}
    dt_bytes = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "u8": 1, "s8": 1}
    for line in compiled_text.splitlines():
        m = re.search(r"= (.+?) "
                      r"(all-reduce|reduce-scatter|all-gather)"
                      r"(-start)?\(", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        shapes = re.sub(r"\{[0-9,]*\}", "", shapes)  # strip layout braces
        n = 0
        for sm in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            cnt = 1
            for d in dims.split(","):
                if d:
                    cnt *= int(d)
            n += cnt * dt_bytes.get(dt, 4)
        tot.setdefault(kind, []).append(n)
    return tot


def main():
    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_setup
    from joint_tensorf_tpu.parallel.mesh import make_mesh
    from joint_tensorf_tpu.parallel.sharding import shard_train_step
    from joint_tensorf_tpu.train.step import StepScalars, make_train_step
    from joint_tensorf_tpu.data.synthetic import sphere_poses

    vm_cfg, head, state, cfg = _tiny_setup(res=(32, 32, 32))
    mesh = make_mesh(shape=(8, 1), axes=("rays", "comp"),
                     devices=jax.devices()[:8])
    from jax.sharding import NamedSharding, PartitionSpec as P
    from joint_tensorf_tpu.parallel.sharding import rays_shardmap_vg
    raw = make_train_step(cfg, vm_cfg, head, jit=False,
                          ray_sharding=NamedSharding(mesh, P("rays")),
                          vg_transform=rays_shardmap_vg(mesh))
    step = shard_train_step(raw, mesh, state, shard_components=False)

    n_views, H, W = cfg.n_views, cfg.H, cfg.W
    rng = np.random.default_rng(0)
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 1.2 * W
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)
    ray_idx = jnp.asarray(rng.permutation(H * W)[:128].astype(np.int64))
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.0),
        c2f_color=jnp.float32(0.0), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(0.0), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

    with mesh:
        lowered = jax.jit(step).lower(state, pose_base, intr, intr_inv,
                                      images, edges, view_sel, ray_idx,
                                      jax.random.PRNGKey(0), s, None)
        compiled = lowered.compile()
    text = compiled.as_text()
    tot = collective_bytes(text)

    # model accounting: the field gradient (factors + basis + shading MLP)
    # psums once; pose grads (n_views x 6) and scalar metrics are noise
    field = state.params.field
    leaves = (list(field.density_planes) + list(field.density_lines)
              + list(field.app_planes) + list(field.app_lines)
              + [field.basis] + jax.tree.leaves(field.shading))
    field_params = sum(int(np.prod(p.shape)) for p in leaves)
    pose_params = int(np.prod(state.params.se3_refine.shape))
    predicted = field_params * 4 + pose_params * 4

    measured = sum(sum(v) for v in tot.values())
    print(f"all-reduce ops: "
          f"{ {k: (len(v), sum(v)) for k, v in tot.items()} }")
    print(f"measured collective bytes/step : {measured:>12,}")
    print(f"model prediction (grads x 4B)  : {predicted:>12,} "
          f"(field {field_params:,} + pose {pose_params:,} params)")
    print(f"ratio measured/predicted       : {measured / predicted:.3f}")

    # production-shape re-emission through the verified accounting
    res, Rd, Ra, app_dim, hidden = 300, 16, 48, 27, 64
    planes = 3 * res * res * (Rd + Ra)
    lines = 3 * res * (Rd + Ra)
    basis = 3 * Ra * app_dim
    mlp = (app_dim + 3 + 2 * 2 * 3 + 2 * 6 * 3) * hidden + hidden \
        + hidden * hidden + hidden + hidden * 3 + 3
    total = planes + lines + basis + mlp
    print(f"production (300^3, Rd16/Ra48)  : {total * 4 / 1e6:.1f} MB/step "
          f"(BENCH_NOTES model: 69.4 MB)")


if __name__ == "__main__":
    main()
