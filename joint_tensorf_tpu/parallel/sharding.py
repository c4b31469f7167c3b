"""PartitionSpecs and sharded step construction.

Sharding layout:
  * ray batch (``ray_idx``) -> P("rays")
  * factor grids -> P(None, None, "comp") on the component axis when the
    mesh has a comp axis (tensor parallelism); replicated otherwise
  * everything else (pose table, basis, MLP, images, L2G warp nets,
    error maps) -> replicated

With these in/out shardings under ``jax.jit`` the SPMD partitioner slices
the render + VJP over rays, keeps factor math component-local, and inserts
the psum for replicated-param gradients — no hand-written collectives.

Works for any trainer state pytree shaped like
``state.params.field: VMState`` + ``state.scene_opt: AdamState over the
field`` (both TrainState and L2GState): every other leaf is replicated.
"""
from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vm import VMState
from ..train.step import StepScalars


def _ns(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def field_sharding(mesh: Mesh, field: VMState, shard_components: bool):
    comp = "comp" if (shard_components and "comp" in mesh.axis_names) else None
    plane_s = _ns(mesh, P(None, None, comp))
    line_s = _ns(mesh, P(None, comp))
    repl = _ns(mesh, P())
    return dataclasses.replace(
        field,
        density_planes=[plane_s for _ in field.density_planes],
        density_lines=[line_s for _ in field.density_lines],
        app_planes=[plane_s for _ in field.app_planes],
        app_lines=[line_s for _ in field.app_lines],
        basis=repl,
        shading=jax.tree.map(lambda _: repl, field.shading),
        aabb=repl,
    )


def state_sharding(mesh: Mesh, state, shard_components: bool = False):
    """Sharding pytree matching any TrainState-shaped state.

    Replicates every leaf, then shards ``params.field`` and the matching
    scene-optimizer moments on the component axis.  Covers the BAT
    TrainState and the L2G L2GState (whose extra leaves — warp nets,
    optimised-pose table, error map — are all small and replicated).
    """
    repl = _ns(mesh, P())
    fs = field_sharding(mesh, state.params.field, shard_components)
    sh = jax.tree.map(lambda _: repl, state)
    return dataclasses.replace(
        sh,
        params=dataclasses.replace(sh.params, field=fs),
        scene_opt=dataclasses.replace(sh.scene_opt, mu=fs,
                                      nu=jax.tree.map(lambda s: s, fs),
                                      count=repl),
    )


def batch_sharding(mesh: Mesh):
    """Shardings for the per-step batch arguments of make_train_step."""
    repl = _ns(mesh, P())
    rays = _ns(mesh, P("rays"))
    return dict(pose_base=repl, intr=repl, intr_inv=repl, images=repl,
                edge_masks=repl, view_sel=repl, ray_idx=rays, rng=repl)


def shard_state(mesh: Mesh, state, shard_components: bool = False):
    """device_put a trainer state onto the mesh with its sharding."""
    return jax.device_put(state, state_sharding(mesh, state,
                                                shard_components))


def rays_shardmap_vg(mesh: Mesh):
    """value_and_grad transform: explicit shard_map over the rays axis.

    With only in/out shardings + internal constraints, GSPMD is free to —
    and measurably does (scripts/psum_volume.py round 5: zero field-grad
    all-reduce bytes, ray all-gathers instead) — replicate the
    gather/scatter-heavy render+VJP instead of partitioning it.  shard_map
    removes that freedom: each device renders ITS ray shard against the
    (comp-replicated) parameters and the gradients are explicitly
    pmean-reduced — one psum of the field+pose gradient per step, exactly
    the communication the scaling model budgets (BENCH_NOTES "Round-3
    scaling model": 69.4 MB f32 at the headline parameter count).

    Exactness: local losses are plain means over equal-sized ray shards,
    so pmean(local losses) == the global mean, and pmean(local grads) ==
    grad of the global mean (regularizer terms are identical on every
    device and average to themselves).  Stratified jitter is pre-drawn
    outside (make_train_step), sharded P(None, "rays") alongside ray_idx.
    PSNR is recomputed from the reduced MSE (a mean of per-shard PSNRs
    would not match the unsharded value).

    Covers the rays-only layout (params replicated).  The comp-sharded
    (tensor-parallel) layout still uses plain GSPMD propagation — its
    density/appearance partial sums need in-render psums that shard_map
    would have to thread through the renderer.
    """
    from jax.experimental.shard_map import shard_map

    from ..train import losses

    def transform(vg):
        repl = P()
        in_specs = (repl, repl, repl, repl, repl, repl, repl,
                    P("rays"), P(None, "rays"), repl, repl, repl)
        out_specs = ((repl, repl), repl)

        def local(params, pose_base, intr, intr_inv, images, edge_masks,
                  view_sel, ray_idx, jitter, rng, s, alpha_mask):
            (loss, metrics), grads = vg(params, pose_base, intr, intr_inv,
                                        images, edge_masks, view_sel,
                                        ray_idx, jitter, rng, s, alpha_mask)
            loss = jax.lax.pmean(loss, "rays")
            metrics = {k: jax.lax.pmean(v, "rays")
                       for k, v in metrics.items()}
            metrics["psnr"] = losses.psnr_from_mse(metrics["mse"])
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, "rays"), grads)
            return (loss, metrics), grads

        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

    return transform


def shard_train_step(step_fn, mesh: Mesh, state,
                     shard_components: bool = False):
    """jit a raw (unjitted) train step with explicit in/out shardings.

    ``state`` supplies the pytree structure (TrainState or L2GState);
    the step contract is the shared one of make_train_step /
    make_l2g_train_step.
    """
    st_sh = state_sharding(mesh, state, shard_components)
    b = batch_sharding(mesh)
    repl = _ns(mesh, P())
    sc_sh = jax.tree.map(lambda _: repl, StepScalars(
        lr_index=0.0, lr_basis=0.0, lr_pose=0.0, c2f_density=0.0,
        c2f_color=0.0, near_far=0.0, l1_weight=0.0, tv_density_weight=0.0,
        tv_color_weight=0.0, use_edge=0.0, edge_factor=0.0,
        non_edge_factor=0.0, view_pe_progress=0.0, fea_pe_progress=0.0,
        pose_do_step=0.0, tv_depth_weight=0.0))

    sharded = jax.jit(
        step_fn,
        in_shardings=(st_sh, b["pose_base"], b["intr"], b["intr_inv"],
                      b["images"], b["edge_masks"], b["view_sel"],
                      b["ray_idx"], b["rng"], sc_sh, None),
        out_shardings=(st_sh, None),
    )
    return sharded


def shard_render_chunk(render_chunk_fn, mesh: Mesh, field: VMState,
                       shard_components: bool = False):
    """jit a raw render chunk fn with ray-sharded inputs.

    Contract: render_chunk(field, centers [C,3], dirs [C,3], scalars,
    alpha_mask, rng) -> (rgb, depth, opacity); centers/dirs/outputs are
    sharded over the rays axis, the field per field_sharding.
    """
    fs = field_sharding(mesh, field, shard_components)
    rays = _ns(mesh, P("rays"))
    repl = _ns(mesh, P())
    sc_sh = jax.tree.map(lambda _: repl, StepScalars(
        lr_index=0.0, lr_basis=0.0, lr_pose=0.0, c2f_density=0.0,
        c2f_color=0.0, near_far=0.0, l1_weight=0.0, tv_density_weight=0.0,
        tv_color_weight=0.0, use_edge=0.0, edge_factor=0.0,
        non_edge_factor=0.0, view_pe_progress=0.0, fea_pe_progress=0.0,
        pose_do_step=0.0, tv_depth_weight=0.0))
    return jax.jit(
        render_chunk_fn,
        in_shardings=(fs, rays, rays, sc_sh, None, repl),
        out_shardings=(rays, rays, rays),
    )
