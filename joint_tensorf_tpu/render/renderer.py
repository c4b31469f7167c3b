"""Volume renderer: ray sampling -> factor sampling -> compositing.

TPU re-design of TensorBase.forward / BatBase.forward
(tensorBase.py:729-802, batBase.py:44-165):

  * everything is one pure jittable function with static shapes
    (n_rays x n_samples); out-of-bbox / alpha-culled samples are masked with
    ``where`` instead of boolean-gathered;
  * the blur path precomputes per-axis banded blur matrices once per call
    and reuses them across density/appearance factor grids;
  * the appearance head runs densely over all samples, then is gated by the
    reference's weight threshold (weight > thres) as a multiplicative mask.

Gradients: sampling coordinates are differentiable w.r.t. ray origins/dirs,
which is how pose gradients flow (SURVEY.md §3.5).  The non-BAT path stops
coordinate gradients exactly like the reference detaches them.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..geometry.ndc import grad_rescale
from ..models import vm as vm_lib
from ..models import alpha_mask as am_lib
from ..models.shading import ShadingHead
from ..ops import composite as composite_ops


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (hashable; part of the jit cache key)."""
    n_samples: int
    white_bg: bool = True
    is_train: bool = False
    stratified: bool = True          # only effective when is_train
    ndc: bool = False
    ndc_near_plane: float = 1.0
    ndc_simulate_euclid_sample: bool = False
    ndc_simulate_euclid_depth: bool = False
    detach_viewdirs: bool = True
    detach_xyz: bool = True
    stop_coord_grad: bool = False    # True for the pose-frozen TensoRF path
    use_alpha_mask: bool = False
    # probe the alpha mask once per `mask_stride` samples along each ray
    # (see the strided-lookup comment in render_rays; 1 = per-sample)
    mask_stride: int = 4
    mlp_predict_density: bool = False
    # rematerialize the shading MLP in the backward pass: its activations at
    # n_rays x n_samples resolution dominate peak HBM (jax.checkpoint trades
    # them for a recompute — SURVEY.md hardware notes)
    remat_shading: bool = True
    # rematerialize the fused factor sampling.  With the fused
    # sample_planeline_prod custom VJP the gather residuals are just the
    # coordinates (ops/sampling.py), so this now defaults OFF; it remains
    # available for low-memory configurations.
    remat_features: bool = False
    # use the fused Pallas compositor (ops/pallas_kernels.py).  Skips the
    # weight>thres appearance gate (contributions it would zero are bounded
    # by thres per sample, ~1e-6); validated vs the jnp path in tests.
    use_pallas_composite: bool = False
    # static per-ray sample budget after alpha-mask compaction; None = dense.
    # The TPU analogue of the reference's boolean sample culling
    # (tensorBase.py:750-755): per ray, keep the top-K samples by mask
    # occupancy (static shape) and composite over those only.  Exact as long
    # as <= K samples per ray survive the mask — choose K from the mask's
    # occupancy when building the phase.
    compact_k: int | None = None
    # evaluate density via the dense-grid expansion (ops/densify.py):
    # mathematically exact, one packed row op per sample instead of ~6
    # factored gathers/scatters, at an O(XYZ) per-step grid-build cost.
    densify_density: bool = False
    # dense-grid layout: "packed8" (ops/densify.py corner channels) or
    # "lane" (ops/lane_grid.py full-128-lane z-block rows + masked dot)
    densify_impl: str = "packed8"
    # dense-grid gather row dtype: "bfloat16" halves the dominant
    # dense-phase HBM traffic; gradients stay float32 (ops/lane_grid.py
    # _bf16_row_gather)
    densify_dtype: str = "float32"
    # apply the alpha-mask gate DURING blur-active rendering.  The caller
    # must then pass a mask dilated by the blur kernel's support radius
    # (models/alpha_mask.dilate_mask): the factor blur is an exact 3D
    # convolution of the density field with a normalized positive kernel
    # (the paper's separability identity), so the dilated sharp mask is a
    # conservative occupancy gate for the blurred field.  The reference
    # simply disables culling under blur (batBase.py:76-82).
    mask_with_blur: bool = False
    # two-stage appearance: compute appearance/shading only on the top-app_k
    # samples per ray by compositing weight (the TPU analogue of the
    # reference's dynamic weight>thres gather, tensorBase.py:773-783).
    # Exact when <= app_k samples per ray pass the weight threshold;
    # None = dense appearance over all samples.
    app_k: int | None = None


@dataclasses.dataclass(frozen=True)
class BlurSpec:
    """Static blur-path configuration; the sigma values are traced inputs."""
    mode: str            # "uniform-gaussian" | "uniform-average"
    kernel_size: int


def sample_ray(aabb, step_size, n_samples: int, centers, dirs, rng,
               near: float, far: float, stratified: bool):
    """Euclidean ray sampling (tensorBase.py:572-612).

    Returns (pts [N,S,3], z_vals [N,S], in_bbox [N,S]).
    """
    axes_w, z_vals, in_bbox, _ = sample_ray_axes(
        aabb, step_size, n_samples, centers, dirs, rng, near, far,
        stratified)
    pts = jnp.stack(axes_w, axis=-1)
    return pts, z_vals, in_bbox


def sample_ray_axes(aabb, step_size, n_samples: int, centers, dirs, rng,
                    near: float, far: float, stratified: bool,
                    jitter=None):
    """sample_ray in per-axis form: ((wx, wy, wz) each [N,S], z_vals,
    in_bbox, (t_min [N], jitter [N,1])).

    ``jitter`` [N,1]: optionally pre-drawn stratified offsets.  The sharded
    train step draws them OUTSIDE its shard_map so every device's rays get
    the same offsets an unsharded step would give them (drawing inside a
    ray-sharded region with a replicated key would hand each shard the
    same offset sequence and break sharded==unsharded parity).

    The (t_min, jitter) tail lets the compaction path recompute z values of
    selected samples elementwise (z = t_min + step*(index + jitter)) instead
    of row-gathering them (docs/DESIGN_NOTES round-3).

    The hot path never materializes [N,S,3] points: column slices of
    T(4,128)-laid-out arrays (and their pad-scatter transposes) are
    lane-starved on TPU and dominated the compacted step profile
    (docs/DESIGN_NOTES.md round-2).
    """
    dirs_d = jax.lax.stop_gradient(dirs)
    o_d = jax.lax.stop_gradient(centers)
    vec = jnp.where(dirs_d == 0, 1e-6, dirs_d)
    rate_a = (aabb[1] - o_d) / vec
    rate_b = (aabb[0] - o_d) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(axis=-1), near, far)

    steps = jnp.arange(n_samples, dtype=centers.dtype)[None, :]
    if stratified:
        if jitter is None:
            jitter = jax.random.uniform(rng, (centers.shape[0], 1),
                                        dtype=centers.dtype)
        steps = steps + jitter
    else:
        jitter = jnp.zeros((centers.shape[0], 1), dtype=centers.dtype)
    z_vals = t_min[:, None] + step_size * steps                  # [N,S]
    axes_w = []
    in_bbox = None
    for a in range(3):
        w = centers[:, a, None] + dirs[:, a, None] * z_vals      # [N,S]
        inb = (w >= aabb[0, a]) & (w <= aabb[1, a])
        in_bbox = inb if in_bbox is None else (in_bbox & inb)
        axes_w.append(w)
    return tuple(axes_w), z_vals, in_bbox, (t_min, jitter)


def sample_ray_ndc(aabb, n_samples: int, centers, dirs, rng,
                   near: float, far: float, stratified: bool,
                   ndc_near_plane: float,
                   simulate_euclid_sample: bool,
                   simulate_euclid_depth: bool,
                   jitter=None):
    """NDC ray sampling with the grad-rescale trick (tensorBase.py:554-571)."""
    interpx = jnp.linspace(near, far, n_samples, dtype=centers.dtype)[None, :]
    interpx = jnp.broadcast_to(interpx, (centers.shape[0], n_samples))
    if stratified:
        if jitter is None:
            jitter = jax.random.uniform(rng, interpx.shape,
                                        dtype=centers.dtype)
        interpx = interpx + jitter * ((far - near) / n_samples)
    ndc_depth = 2 * ndc_near_plane / (1 - ndc_near_plane - interpx)
    simulated = grad_rescale(interpx, ndc_depth)
    z_for_pts = simulated if simulate_euclid_sample else interpx
    pts = centers[:, None, :] + dirs[:, None, :] * z_for_pts[..., None]
    in_bbox = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    z_vals = ndc_depth if simulate_euclid_depth else interpx
    return pts, z_vals, in_bbox


def _finish_pallas(rcfg, cfg, head, state, sigma, dists, z_vals,
                   fused_app_feat, mlp_pts, mlp_viewdirs, dirs, n, S,
                   near_far, rng_bg, view_pe_progress, fea_pe_progress):
    """Composite + shade via the fused Pallas compositor kernel."""
    from ..ops.pallas_kernels import composite_pallas

    def shade(shading_params, p, v, f, vp, fp):
        return head.apply(shading_params, p, v, f, vp, fp)

    if rcfg.remat_shading:
        shade = jax.checkpoint(shade)
    rgb = shade(state.shading, mlp_pts.reshape(-1, 3),
                mlp_viewdirs.reshape(-1, 3), fused_app_feat,
                view_pe_progress, fea_pe_progress).reshape(n, S, 3)
    alpha = 1.0 - jnp.exp(-sigma * dists * cfg.distance_scale)
    rgb_map, depth_map, acc_map, _ = composite_pallas(alpha, rgb, z_vals)

    if rcfg.white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    elif rcfg.is_train:
        coin = jax.random.uniform(rng_bg, ()) < 0.5
        rgb_map = rgb_map + coin * (1.0 - acc_map[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

    depth_map = depth_map + (1.0 - acc_map) * dirs[..., -1]
    if rcfg.ndc_simulate_euclid_depth:
        depth_map = jnp.clip(depth_map, 0.0, 10.0)
    else:
        depth_map = depth_map - near_far[0] + 0.05
    depth_map = jax.lax.stop_gradient(depth_map)
    return rgb_map, depth_map, acc_map


def render_rays(
    state: vm_lib.VMState,
    cfg: vm_lib.VMConfig,
    rcfg: RenderConfig,
    head: ShadingHead,
    centers,                      # [N,3]
    dirs,                         # [N,3]
    rng,
    near_far,                     # traced [2]
    alpha_mask: Optional[am_lib.AlphaMask] = None,
    blur: Optional[BlurSpec] = None,
    c2f_density: Any = None,      # traced scalar (world-space sigma)
    c2f_color: Any = None,
    view_pe_progress: Any = 1.0,
    fea_pe_progress: Any = 1.0,
    ray_jitter=None,              # [N,1] euclid / [N,S] NDC (see sample_ray_axes)
):
    """Returns (rgb_map [N,3], depth_map [N], opacity [N])."""
    n = centers.shape[0]
    S = rcfg.n_samples
    resolution = state.resolution()
    # aabb is a BUFFER, not a parameter (the reference registers it with
    # requires_grad=False, tensorBase.py:430): pose/plane gradients flow
    # through the sampling coordinates, never into the box itself.  Without
    # this stop_gradient a non-finite cotangent anywhere upstream of a
    # normalize_coord reaches the aabb leaf, and Adam's `p - 0*NaN` then
    # poisons the box permanently (the round-4 appknone arm died this way
    # at the it-1000 upsample: NaN aabb -> negative resolution).
    aabb = jax.lax.stop_gradient(state.aabb)
    aabb_size = aabb[1] - aabb[0]

    rng_samp, rng_bg = jax.random.split(rng)
    stratified = rcfg.is_train and rcfg.stratified

    viewdirs = dirs
    axes_w = None        # per-axis [n,S] world coords (euclid hot path)
    pts = None
    if rcfg.ndc:
        pts, z_vals, in_bbox = sample_ray_ndc(
            aabb, S, centers, viewdirs, rng_samp, near_far[0], near_far[1],
            stratified, rcfg.ndc_near_plane, rcfg.ndc_simulate_euclid_sample,
            rcfg.ndc_simulate_euclid_depth, jitter=ray_jitter)
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1)
        rays_norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * rays_norm
        viewdirs = viewdirs / rays_norm
    else:
        # step size derives from the (dynamic) aabb and static resolution
        units = aabb_size / (jnp.asarray(resolution, dtype=aabb.dtype) - 1)
        step_size = jnp.mean(units) * cfg.step_ratio
        axes_w, z_vals, in_bbox, (t_min, jitter) = sample_ray_axes(
            aabb, step_size, S, centers, viewdirs, rng_samp,
            near_far[0], near_far[1], stratified, jitter=ray_jitter)
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1)

    # ------------------------------------------------------------- blur mats
    blur_active = blur is not None
    d_mats = c_mats = None
    if blur_active:
        grid_scale = jnp.mean(jnp.asarray(resolution, aabb.dtype) / aabb_size)
        dk = vm_lib.c2f_kernel(blur.mode, c2f_density, blur.kernel_size,
                               grid_scale)
        ck = vm_lib.c2f_kernel(blur.mode, c2f_color, blur.kernel_size,
                               grid_scale)
        d_mats = vm_lib.make_blur_mats(dk, resolution)
        c_mats = vm_lib.make_blur_mats(ck, resolution)

    # ------------------------------------------------------------ density
    valid = in_bbox

    group_alpha = None     # [n, S//stride] bool, for group-level compaction
    use_group = False
    stride = 1
    if rcfg.use_alpha_mask and alpha_mask is not None and \
            (not blur_active or rcfg.mask_with_blur):
        # strided lookup: consecutive samples are ~step_ratio/2 grid cells
        # (~0.27 mask cells at the usual mask:grid resolution ratio) apart
        # while the mask's maxpool(5) build dilates the alive set by ~2
        # mask cells (alpha_mask.update_alpha_mask), so one probe per
        # `stride` samples stays conservative: the worst-case probe offset
        # is (stride-1)*0.27 ≈ 0.8 mask cells at stride 4 — and the 2M-row
        # lookup is row-op bound (DESIGN_NOTES), so rows/stride is
        # time/stride.
        stride = rcfg.mask_stride if S % max(rcfg.mask_stride, 1) == 0 else 1
        if axes_w is not None:
            probe = tuple(jax.lax.stop_gradient(w[:, ::stride]).reshape(-1)
                          for w in axes_w)
        else:
            probe = tuple(jax.lax.stop_gradient(pts[:, ::stride, a])
                          .reshape(-1) for a in range(3))
        a = am_lib.sample_alpha(alpha_mask, probe).reshape(n, S // stride)
        group_alpha = a > 0
        # group-level compaction (below) never materializes the per-sample
        # repeat; the dense masked path still needs it
        use_group = (rcfg.compact_k is not None and not rcfg.ndc
                     and stride > 1 and rcfg.compact_k % stride == 0
                     and rcfg.compact_k < S)
        if not use_group:
            alphas = (jnp.repeat(group_alpha, stride, axis=1)
                      if stride > 1 else group_alpha)
            valid = valid & alphas
    elif rcfg.compact_k is not None and not rcfg.ndc:
        # Bbox-gated compaction (round 4): with no alpha culling available
        # (blur active — the reference disables the mask, batBase.py:77 —
        # or no mask built yet), compact on the IN-BBOX gate alone.  Exact
        # regardless of blur: out-of-bbox samples contribute nothing in
        # either system (tensorBase.py:587-589 slab test), and the
        # trainer's bbox probe sizes K to cover the worst-case in-bbox
        # count.  Group granularity reuses the strided machinery with an
        # all-true alpha term.
        stride_c = (rcfg.mask_stride
                    if S % max(rcfg.mask_stride, 1) == 0 else 1)
        if stride_c > 1 and rcfg.compact_k % stride_c == 0 \
                and rcfg.compact_k < S:
            stride = stride_c
            group_alpha = jnp.ones((n, S // stride), bool)
            use_group = True

    # ------------------------------------------------- sample compaction
    # Keep only K samples per ray (the ones surviving the masks) — static
    # shapes, march order preserved.  Exact when <= K samples are alive.
    if rcfg.compact_k is not None and rcfg.compact_k < S:
        K = rcfg.compact_k
        if rcfg.ndc:
            # NDC path: march-order selection via one top_k on a composite
            # integer score (valid samples first, each group in march
            # order) — no post-sort needed, because top_k returns indices
            # in descending-score order, which this score makes equal to
            # march order.  Fillers (when < K samples are alive) land at
            # the END and are zeroed by the rank test below.
            i_idx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
            score = jnp.where(valid, 2 * S - i_idx, S - i_idx)
            _, topi = jax.lax.top_k(score, K)             # [n, K] march order
            # pts is NOT o + d*z_vals here (simulate_euclid flags), so pts
            # rides a packed gather; its VJP is one packed row scatter.
            packed = jnp.concatenate(
                [jax.lax.stop_gradient(
                    jnp.stack([z_vals, dists], axis=-1)), pts], axis=-1)
            packed = jnp.take_along_axis(packed, topi[..., None], axis=1)
            pts = packed[..., 2:5]
            z_vals = packed[..., 0]
            dists = packed[..., 1]
            n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)   # [n]
            rank = jax.lax.broadcasted_iota(jnp.int32, (valid.shape[0], K), 1)
            valid = rank < n_valid[:, None]
        elif use_group:
            # Group-level selection: pick the first K/stride PROBE GROUPS
            # (stride consecutive samples sharing one alpha probe) that are
            # alive, then expand — the top_k runs on [n, S/stride] instead
            # of [n, S] (it was ~7 ms of the compacted step at S=1000).
            # Exact when <= K/stride groups are alive per ray, which the
            # trainer's compact-K probe measures at group granularity.
            # Per-sample validity is reconstructed elementwise: group rank
            # < n_alive_groups (selection+alpha), AND the recomputed
            # in-bbox test of each expanded sample.
            g = stride
            G = S // g
            Kg = K // g
            ginb = jnp.any(in_bbox.reshape(n, G, g), axis=-1)
            gvalid = group_alpha & ginb                            # [n, G]
            gi = jax.lax.broadcasted_iota(jnp.int32, gvalid.shape, 1)
            gscore = jnp.where(gvalid, 2 * G - gi, G - gi)
            _, topg = jax.lax.top_k(gscore, Kg)          # [n, Kg] march order
            n_vg = jnp.sum(gvalid.astype(jnp.int32), axis=-1)
            grank = jax.lax.broadcasted_iota(jnp.int32, (n, Kg), 1)
            gsel = grank < n_vg[:, None]                           # [n, Kg]
            topi = (topg[..., None] * g
                    + jnp.arange(g, dtype=jnp.int32)).reshape(n, K)
            z_vals = jax.lax.stop_gradient(
                t_min[:, None] + step_size * (topi.astype(centers.dtype)
                                              + jitter))
            dists = jnp.where(topi == S - 1, 0.0,
                              jnp.broadcast_to(step_size, z_vals.shape)
                              ).astype(z_vals.dtype)
            axes_w = tuple(centers[:, a, None] + dirs[:, a, None] * z_vals
                           for a in range(3))
            inb_sel = None
            for a, w in enumerate(axes_w):
                ok = (w >= aabb[0, a]) & (w <= aabb[1, a])
                inb_sel = ok if inb_sel is None else (inb_sel & ok)
            valid = jnp.repeat(gsel, g, axis=1) & inb_sel
        else:
            # Euclid hot path: NOTHING is gathered.  One top_k on the
            # composite score selects the first K valid samples in march
            # order; z, dists, validity and the per-axis coords are all
            # recomputed elementwise from the selected indices:
            #   z     = t_min + step*(index + jitter)      (exact)
            #   dists = step (every pre-compaction dist is step_size,
            #           except the final sample's 0 — reproduced from the
            #           index test)
            #   valid = slot_rank < n_valid (top_k fills missing slots
            #           with the lowest-index INVALID samples, which the
            #           score places after every valid one)
            # This replaced a [n*K, 4]-channel packed row gather plus a
            # [n, K] sort (docs/DESIGN_NOTES round-3: ~7 ms of the
            # compacted step).
            i_idx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
            score = jnp.where(valid, 2 * S - i_idx, S - i_idx)
            _, topi = jax.lax.top_k(score, K)             # [n, K] march order
            n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)   # [n]
            rank = jax.lax.broadcasted_iota(jnp.int32, (valid.shape[0], K), 1)
            new_valid = rank < n_valid[:, None]
            z_vals = jax.lax.stop_gradient(
                t_min[:, None] + step_size * (topi.astype(centers.dtype)
                                              + jitter))
            dists = jnp.where(topi == S - 1, 0.0,
                              jnp.broadcast_to(step_size, z_vals.shape)
                              ).astype(z_vals.dtype)
            valid = new_valid
            # recompute per-axis coords from the compacted z: pose grads
            # flow through the elementwise o + d*z, not a gather
            axes_w = tuple(centers[:, a, None] + dirs[:, a, None] * z_vals
                           for a in range(3))
        S = K

    # normalized sampling coords, per axis (lane-friendly [N] arrays)
    if axes_w is not None:
        coords = tuple(
            ((w - aabb[0, a]) * (2.0 / (aabb[1, a] - aabb[0, a]))
             - 1.0).reshape(-1) for a, w in enumerate(axes_w))
        pts = jnp.stack(axes_w, axis=-1)
    else:
        flat_pts = pts.reshape(-1, 3)
        coords = vm_lib.normalize_coord(flat_pts, aabb)

    mlp_viewdirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    if rcfg.detach_viewdirs:
        mlp_viewdirs = jax.lax.stop_gradient(mlp_viewdirs)
    mlp_pts = jax.lax.stop_gradient(pts) if rcfg.detach_xyz else pts

    fused_app_feat = None
    use_densify = (rcfg.densify_density and vm_lib.can_densify(cfg)
                   and not rcfg.mlp_predict_density)
    use_fused = (not use_densify and rcfg.app_k is None
                 and vm_lib.can_fuse_features(cfg)
                 and not rcfg.mlp_predict_density)
    if use_densify:
        # density via the dense rank expansion: MXU einsum build + ONE
        # packed row gather per sample (exact; ops/densify.py docstring)
        dcoords = (jax.lax.stop_gradient(coords) if rcfg.stop_coord_grad
                   else coords)
        if rcfg.densify_impl == "lane":
            from ..ops import lane_grid

            # build dense G (einsums) then pack (custom-VJP fold).  The
            # direct factor->G128 blocked-einsum build (build_lane_grid_vm)
            # measured STRICTLY SLOWER in the full step (dense 218->321 ms:
            # three 5-D small-R einsums with 460MB outputs don't fuse) —
            # kept in ops/lane_grid.py as a documented dead end.
            G = vm_lib.compute_density_grid(state, cfg, blur_mats=d_mats)
            G128 = lane_grid.pack_lane_grid(G)
            sigma_feature = lane_grid.sample_lane_grid(
                G128, dcoords, resolution[2],
                row_dtype=rcfg.densify_dtype)
        else:
            from ..ops import densify as densify_ops

            G = vm_lib.compute_density_grid(state, cfg, blur_mats=d_mats)
            G8 = densify_ops.pack_corners(G)
            sigma_feature = densify_ops.sample_packed_grid(G8, dcoords)
        sigma_feature = sigma_feature.reshape(n, S)
        rgb_all = None
    elif rcfg.mlp_predict_density:
        # density comes from the shading head (batBase.py:106-109)
        app_feat = vm_lib.compute_app_feature(
            state, cfg, coords, blur_mats=c_mats,
            stop_coord_grad=rcfg.stop_coord_grad)
        rgb_all, sigma_feature = head.apply(
            state.shading, mlp_pts.reshape(-1, 3), mlp_viewdirs.reshape(-1, 3),
            app_feat, view_pe_progress, fea_pe_progress)
        sigma_feature = sigma_feature.reshape(n, S)
    elif use_fused:
        # one fused 64-wide gather serves both density and appearance
        def fused(st, c, dm, cm):
            return vm_lib.compute_fused_features(
                st, cfg, c, d_mats=dm, c_mats=cm,
                stop_coord_grad=rcfg.stop_coord_grad)

        if rcfg.remat_features:
            fused = jax.checkpoint(fused)
        sigma_feature, fused_app_feat = fused(state, coords, d_mats, c_mats)
        sigma_feature = sigma_feature.reshape(n, S)
        rgb_all = None
    else:
        sigma_feature = vm_lib.compute_density_feature(
            state, cfg, coords, blur_mats=d_mats,
            stop_coord_grad=rcfg.stop_coord_grad).reshape(n, S)
        rgb_all = None

    if cfg.component_wise_feature2density:
        sigma = sigma_feature
    else:
        sigma = vm_lib.feature2density(cfg, sigma_feature)
    sigma = jnp.where(valid, sigma, 0.0)

    if rcfg.use_pallas_composite and not rcfg.mlp_predict_density \
            and fused_app_feat is not None:
        return _finish_pallas(rcfg, cfg, head, state, sigma, dists, z_vals,
                              fused_app_feat, mlp_pts, mlp_viewdirs, dirs,
                              n, S, near_far, rng_bg, view_pe_progress,
                              fea_pe_progress)

    alpha = 1.0 - jnp.exp(-sigma * dists * cfg.distance_scale)
    one_minus = 1.0 - alpha + 1e-10
    # analytic-VJP exclusive cumprod: autodiffing the scan costs
    # 26 ms/step at [2000, 1000] (ops/composite.exclusive_cumprod)
    T_excl = composite_ops.exclusive_cumprod(one_minus)
    weight = alpha * T_excl

    # ---------------------------------------------------------- appearance
    if rcfg.app_k is not None and not rcfg.mlp_predict_density:
        # Two-stage appearance: shade only the top-app_k samples per ray by
        # compositing weight.  The reference gathers appearance where
        # weight > thres (tensorBase.py:773-783) — dynamic-shape on GPU;
        # here the gate is capped at a static K2 (exact when <= K2 samples
        # pass the threshold; dropped tail samples would contribute
        # < thres-weighted colors).  Row-op cost of the factored appearance
        # gathers scales by K2/S.
        K2 = min(rcfg.app_k, S)
        gate = (weight > cfg.raymarch_weight_thres) & valid
        score = jax.lax.stop_gradient(jnp.where(gate, weight, 0.0))
        _, topi2 = jax.lax.top_k(score, K2)                    # [n, K2]
        topi2 = jnp.sort(topi2, axis=-1)
        w_sel = jnp.take_along_axis(weight, topi2, axis=1)     # diff gather
        if rcfg.ndc:
            gate_sel = jnp.take_along_axis(
                jax.lax.stop_gradient(gate.astype(weight.dtype)),
                topi2, axis=1)
            pts_sel = jnp.take_along_axis(pts, topi2[..., None], axis=1)
            coords_sel = vm_lib.normalize_coord(pts_sel.reshape(-1, 3), aabb)
        else:
            # two plain [n, S] takes.  Round 3 packed these into one
            # [n, S, 2] take, but a minor-dim-2 tensor tiles to T(8,128)
            # on TPU — a 64x physical blowup (16 MB logical -> ~1 GB
            # padded) that measured 26 ms in the dense step
            # (scripts/phase_profile.py round 4, fusion.19)
            z_sel = jnp.take_along_axis(jax.lax.stop_gradient(z_vals),
                                        topi2, axis=1)
            gate_sel = jnp.take_along_axis(
                jax.lax.stop_gradient(gate.astype(weight.dtype)),
                topi2, axis=1)
            axes_sel = tuple(centers[:, a, None] + dirs[:, a, None] * z_sel
                             for a in range(3))
            pts_sel = jnp.stack(axes_sel, axis=-1)
            coords_sel = tuple(
                ((w - aabb[0, a]) * (2.0 / (aabb[1, a] - aabb[0, a]))
                 - 1.0).reshape(-1) for a, w in enumerate(axes_sel))
        app_feat = vm_lib.compute_app_feature(
            state, cfg, coords_sel, blur_mats=c_mats,
            stop_coord_grad=rcfg.stop_coord_grad)
        vd_sel = jnp.broadcast_to(viewdirs[:, None, :], pts_sel.shape)
        if rcfg.detach_viewdirs:
            vd_sel = jax.lax.stop_gradient(vd_sel)
        mlp_pts_sel = (jax.lax.stop_gradient(pts_sel) if rcfg.detach_xyz
                       else pts_sel)

        def shade(shading_params, p, v, f, vp, fp):
            return head.apply(shading_params, p, v, f, vp, fp)

        if rcfg.remat_shading:
            shade = jax.checkpoint(shade)
        rgb_sel = shade(state.shading, mlp_pts_sel.reshape(-1, 3),
                        vd_sel.reshape(-1, 3), app_feat,
                        view_pe_progress, fea_pe_progress).reshape(n, K2, 3)
        rgb_sel = rgb_sel * gate_sel[..., None]

        acc_map = jnp.sum(weight, axis=-1)
        rgb_map = jnp.sum(w_sel[..., None] * rgb_sel, axis=-2)

        if rcfg.white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        elif rcfg.is_train:
            coin = jax.random.uniform(rng_bg, ()) < 0.5
            rgb_map = rgb_map + coin * (1.0 - acc_map[..., None])
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

        depth_map = jnp.sum(weight * z_vals, axis=-1)
        depth_map = depth_map + (1.0 - acc_map) * dirs[..., -1]
        if rcfg.ndc_simulate_euclid_depth:
            depth_map = jnp.clip(depth_map, 0.0, 10.0)
        else:
            depth_map = depth_map - near_far[0] + 0.05
        depth_map = jax.lax.stop_gradient(depth_map)
        return rgb_map, depth_map, acc_map

    if rcfg.mlp_predict_density:
        app_gate = valid
        rgb = rgb_all.reshape(n, S, 3)
    else:
        app_gate = weight > cfg.raymarch_weight_thres
        if fused_app_feat is not None:
            app_feat = fused_app_feat
        else:
            app_feat = vm_lib.compute_app_feature(
                state, cfg, coords, blur_mats=c_mats,
                stop_coord_grad=rcfg.stop_coord_grad)

        def shade(shading_params, p, v, f, vp, fp):
            return head.apply(shading_params, p, v, f, vp, fp)

        if rcfg.remat_shading:
            shade = jax.checkpoint(shade)
        rgb = shade(state.shading, mlp_pts.reshape(-1, 3),
                    mlp_viewdirs.reshape(-1, 3), app_feat,
                    view_pe_progress, fea_pe_progress)
        rgb = rgb.reshape(n, S, 3)
    rgb = rgb * app_gate[..., None]

    acc_map = jnp.sum(weight, axis=-1)
    rgb_map = jnp.sum(weight[..., None] * rgb, axis=-2)

    if rcfg.white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    elif rcfg.is_train:
        # random white-background coin flip (tensorBase.py:788)
        coin = jax.random.uniform(rng_bg, ()) < 0.5
        rgb_map = rgb_map + coin * (1.0 - acc_map[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

    depth_map = jnp.sum(weight * z_vals, axis=-1)
    depth_map = depth_map + (1.0 - acc_map) * dirs[..., -1]
    if rcfg.ndc_simulate_euclid_depth:
        depth_map = jnp.clip(depth_map, 0.0, 10.0)
    else:
        depth_map = depth_map - near_far[0] + 0.05
    depth_map = jax.lax.stop_gradient(depth_map)

    return rgb_map, depth_map, acc_map
