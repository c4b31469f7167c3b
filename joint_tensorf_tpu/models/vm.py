"""VM-decomposed (plane x line) tensorial radiance field as a pure pytree.

Re-design of the reference's TensorVMSplit / BAT_VMSplit / TensorCP / BAT_CP
(tensoRF.py, bateRF.py) as functional state + pure ops:

  * factor grids are channels-last ([H, W, R] planes, [D, R] lines) so
    per-sample reads are contiguous R-vectors and blur/upsample become
    MXU matmuls;
  * the coarse-to-fine component-wise blur takes precomputed banded blur
    matrices (ops/blur.py) — exact equivalent of the reference's grouped
    conv1d with replicate padding (bateRF.py:8-39) at matmul cost;
  * upsample / shrink are pure functions returning a new state (shape
    changes happen at phase boundaries, outside jit).

Axis conventions (tensorBase.py:405-406): matMode=[[0,1],[0,2],[1,2]],
vecMode=[2,1,0]; plane i is [H=res[m1], W=res[m0], R_i], line i is
[D=res[vec_i], R_i].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..ops import blur as blur_ops
from ..ops import resample
from ..ops.kernels import gaussian_kernel, average_kernel
# packed variants: one corner-packed row gather/scatter per sample instead
# of 4 (planes) / 2 (lines) — ~2x on the factor-grid VJP, bitwise identical
# (ops/sampling.py pack_plane docstring; scripts/packed_gather_bench.py)
from ..ops.sampling import (sample_line_packed as sample_line,
                            sample_plane_packed as sample_plane,
                            sample_planeline_prod)
from . import shading as shading_lib

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@dataclasses.dataclass(frozen=True)
class VMConfig:
    """Static (hashable) field configuration."""
    density_n_comp: tuple[int, int, int] = (16, 16, 16)
    app_n_comp: tuple[int, int, int] = (48, 48, 48)
    app_dim: int = 27
    shading_mode: str = "MLP_Fea"
    view_pe: int = 2
    pos_pe: int = 2
    fea_pe: int = 2
    hidden: int = 64
    fea2dense: str = "softplus"        # or "relu"
    density_shift: float = -10.0
    distance_scale: float = 25.0
    raymarch_weight_thres: float = 1e-6
    step_ratio: float = 0.5
    decomposition: str = "VM"           # "VM" or "CP"
    # storage dtype of the factor grids ("float32" | "bfloat16") — the TPU
    # analogue of the reference's optional fp16 tensors (tensorf.py:222-227).
    # Compute stays float32 (gradient scatters and Adam accumulate in f32);
    # bf16 halves factor-grid HBM footprint, useful at LLFF's 800^3 grids.
    factor_dtype: str = "float32"
    # BAT blur-path variants (bateRF.py:52-89); all False on the main configs
    abs_components: bool = False
    component_wise_feature2density: bool = False
    plane_feature2density: bool = False
    convolve_plane_only: bool = False
    convolve_positive_only: bool = False
    ignore_negative_split: bool = False

    def shading_head(self) -> shading_lib.ShadingHead:
        return shading_lib.make_shading_head(
            self.shading_mode, self.app_dim, self.view_pe, self.pos_pe,
            self.fea_pe, self.hidden,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VMState:
    """Learnable field state (a pytree of arrays).

    For CP decomposition the plane lists are empty and basis maps R (not 3R).
    """
    density_planes: list[Any]
    density_lines: list[Any]
    app_planes: list[Any]
    app_lines: list[Any]
    basis: Any               # [sum(app_n_comp) (VM) | app_n_comp[0] (CP), app_dim]
    shading: Any             # shading-head params pytree
    aabb: Any                # [2,3] — dynamic: bbox shrinks during training

    def resolution(self) -> list[int]:
        if self.density_planes:
            # res[m0] = W of plane 0, res[m1] = H of plane 0, res[2] = D of line 0
            return [self.density_planes[0].shape[1],
                    self.density_planes[0].shape[0],
                    self.density_lines[0].shape[0]]
        return [self.density_lines[2].shape[0],
                self.density_lines[1].shape[0],
                self.density_lines[0].shape[0]]


# --------------------------------------------------------------------- init
def init_vm(key, cfg: VMConfig, resolution: Sequence[int], aabb,
            init_scale: float = 0.1, init_bias: float = 0.0,
            init_density: bool = True, init_app: bool = True,
            init_basis: bool = True, prev: VMState | None = None) -> VMState:
    """Initialize factors |bias + scale*N(0,1)| (tensoRF.py:159-169).

    With ``prev`` given, groups not re-initialized are carried over
    (supports the reset_on_last_upsample partial re-init, tensorf.py:416-425).
    """
    res = list(resolution)
    keys = jax.random.split(key, 16)
    ki = iter(range(16))
    fdt = jnp.dtype(cfg.factor_dtype)

    def one_svd(n_comp):
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            if cfg.decomposition == "VM":
                p = jax.random.normal(keys[next(ki)], (res[m1], res[m0], n_comp[i]))
                planes.append(jnp.abs(init_bias + init_scale * p).astype(fdt))
            l = jax.random.normal(keys[next(ki)], (res[VEC_MODE[i]], n_comp[i]))
            if cfg.decomposition == "VM":
                lines.append(jnp.abs(init_bias + init_scale * l).astype(fdt))
            else:
                # CP initializes without abs/bias (tensoRF.py:349-355)
                lines.append((init_scale * l).astype(fdt))
        return planes, lines

    d_planes, d_lines = one_svd(cfg.density_n_comp)
    a_planes, a_lines = one_svd(cfg.app_n_comp)

    basis_in = (sum(cfg.app_n_comp) if cfg.decomposition == "VM"
                else cfg.app_n_comp[0])
    bound = 1.0 / (basis_in ** 0.5)
    basis = jax.random.uniform(keys[next(ki)], (basis_in, cfg.app_dim),
                               minval=-bound, maxval=bound)
    head = cfg.shading_head()
    shading = head.init(keys[next(ki)])

    if prev is not None:
        if not init_density:
            d_planes, d_lines = prev.density_planes, prev.density_lines
        if not init_app:
            a_planes, a_lines = prev.app_planes, prev.app_lines
        if not init_basis:
            basis = prev.basis
        shading = prev.shading

    return VMState(
        density_planes=d_planes, density_lines=d_lines,
        app_planes=a_planes, app_lines=a_lines,
        basis=basis, shading=shading,
        aabb=jnp.asarray(aabb, dtype=jnp.float32).reshape(2, 3),
    )


# ----------------------------------------------------------------- sampling
def normalize_coord(xyz, aabb):
    """World -> [-1,1] per axis (tensorBase.py:502-503)."""
    return (xyz - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


def coord_axes(coords):
    """coords as (cx, cy, cz) tuple of [N] arrays, from either form.

    Feature evaluators take per-axis coordinate arrays: slicing columns out
    of an [N,3] array (and the pad-scatter transpose of that slice in the
    VJP) runs at 4/128 vector lanes on TPU and measurably dominated the
    compacted train step (docs/DESIGN_NOTES.md round-2); callers on the hot
    path pass a tuple of lane-friendly [N] arrays instead.
    """
    if isinstance(coords, (tuple, list)):
        return coords[0], coords[1], coords[2]
    return coords[:, 0], coords[:, 1], coords[:, 2]


def feature2density(cfg: VMConfig, feat):
    if cfg.fea2dense == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    if cfg.fea2dense == "relu":
        return jax.nn.relu(feat + cfg.density_shift)
    raise ValueError(cfg.fea2dense)


def make_blur_mats(kernel, resolution: Sequence[int]):
    """Per-axis banded blur matrices for a kernel: {axis_len: B}."""
    mats = {}
    for L in set(int(r) for r in resolution):
        mats[L] = blur_ops.blur_matrix(kernel, L)
    return mats


def c2f_kernel(mode: str, parameter, kernel_size: int, grid_scale):
    """World-sigma -> grid-units kernel (batBase.py:13-25).

    grid_scale = mean(gridSize / aabbSize) converts the world-space c2f
    parameter into grid units.
    """
    if mode == "uniform-gaussian":
        return gaussian_kernel(grid_scale * parameter, kernel_size)
    if mode == "uniform-average":
        return average_kernel(grid_scale * parameter, kernel_size)
    raise ValueError(f"invalid c2f_mode {mode!r}")


def _stop(x):
    return jax.lax.stop_gradient(x)


def compute_density_feature(state: VMState, cfg: VMConfig, coords,
                            blur_mats=None, stop_coord_grad: bool = False):
    """coords: [N,3] normalized -> sigma feature [N].

    blur_mats: optional {length: B} banded matrices (BAT path, bateRF.py:41-94).
    stop_coord_grad=True reproduces the non-BAT classes' .detach() on the
    sampling coordinates (tensoRF.py:233) — pose gradients only flow when
    False (the BAT path).
    """
    cs = coord_axes(coords)
    if stop_coord_grad:
        cs = _stop(cs)
    if cfg.decomposition == "CP":
        return _cp_feature(state.density_lines, cfg, cs, blur_mats,
                           act=("density" if cfg.component_wise_feature2density
                                else None))
    sigma = jnp.zeros(cs[0].shape, dtype=cs[0].dtype)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        plane = state.density_planes[i]
        line = state.density_lines[i]
        # per-component activation variants (bateRF.py:52-64)
        if cfg.component_wise_feature2density:
            plane = feature2density(cfg, plane)
            line = feature2density(cfg, line)
        elif cfg.plane_feature2density:
            plane = feature2density(cfg, plane)
        elif cfg.abs_components:
            plane = jnp.abs(plane)
            line = jnp.abs(line)
        plane_sharp = plane
        if blur_mats is not None:
            plane = blur_ops.blur_plane(plane, blur_mats[plane.shape[0]],
                                        blur_mats[plane.shape[1]])
            if not cfg.convolve_plane_only:
                line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
        if blur_mats is not None and cfg.convolve_positive_only:
            # the sharp-fallback mixes blurred/sharp per sample — needs the
            # separate p/l path (bateRF.py:83-89)
            p = sample_plane(plane, cs[m0], cs[m1])                 # [N,R]
            l = sample_line(line, cs[VEC_MODE[i]])                  # [N,R]
            pos = _stop(l) >= 0
            if cfg.ignore_negative_split:
                p = p * pos
            else:
                p_sharp = sample_plane(plane_sharp, cs[m0], cs[m1])
                p = jnp.where(pos, p, p_sharp)
            prod = p * l
        else:
            # fused product with hand-written VJP: one packed gather + one
            # packed scatter per factor instead of XLA's ~6 default row ops
            prod = sample_planeline_prod(plane, line, cs[m0], cs[m1],
                                         cs[VEC_MODE[i]])
        sigma = sigma + jnp.sum(prod, axis=-1)
    return sigma


def compute_app_feature(state: VMState, cfg: VMConfig, coords,
                        blur_mats=None, stop_coord_grad: bool = False):
    """coords: [N,3] normalized -> appearance features [N, app_dim]."""
    cs = coord_axes(coords)
    if stop_coord_grad:
        cs = _stop(cs)
    if cfg.decomposition == "CP":
        prod = _cp_feature(state.app_lines, cfg, cs, blur_mats,
                           act=None, reduce=False)
        return prod @ state.basis
    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        plane = state.app_planes[i]
        line = state.app_lines[i]
        if blur_mats is not None:
            # appearance always blurs both factors (bateRF.py:97-130)
            plane = blur_ops.blur_plane(plane, blur_mats[plane.shape[0]],
                                        blur_mats[plane.shape[1]])
            line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
        feats.append(sample_planeline_prod(plane, line, cs[m0], cs[m1],
                                           cs[VEC_MODE[i]]))
    return jnp.concatenate(feats, axis=-1) @ state.basis       # [N, app_dim]


def _cp_feature(lines, cfg: VMConfig, coords, blur_mats, act, reduce=True):
    """CP decomposition: product of three blurred line samples
    (bateRF.py:140-195 / tensoRF.py:366-404)."""
    cs = coord_axes(coords)
    prod = None
    for i in range(3):
        line = lines[i]
        if act == "density":
            line = feature2density(cfg, line)
        if blur_mats is not None:
            line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
        s = sample_line(line, cs[VEC_MODE[i]])
        prod = s if prod is None else prod * s
    if reduce:
        return jnp.sum(prod, axis=-1)
    return prod


def compute_fused_features(state: VMState, cfg: VMConfig, coords,
                           d_mats=None, c_mats=None,
                           stop_coord_grad: bool = False):
    """Density + appearance features from ONE fused gather per corner.

    Density and appearance are sampled at the same coordinates
    (tensorBase.py:763/776 — app on a subset, here dense), so the factor
    grids are concatenated channel-wise ([H, W, Rd+Ra]) and gathered once.
    On TPU this matters enormously: a 64-wide f32 row gather measured ~2600x
    faster than separate 16- and 48-wide gathers (scripts/gather_experiments).

    Blur matrices are applied per-part before fusing (density and color use
    different kernels, batBase.py:94-98).  Only valid for the plain VM path
    (no per-component activations / positive-only variants) — callers fall
    back to the separate path otherwise.

    Returns (sigma_feature [N], app_feature [N, app_dim]).
    """
    assert cfg.decomposition == "VM"
    assert not (cfg.component_wise_feature2density or cfg.plane_feature2density
                or cfg.abs_components or cfg.convolve_positive_only)
    cs = coord_axes(coords)
    if stop_coord_grad:
        cs = _stop(cs)
    Rd = cfg.density_n_comp
    sigma = jnp.zeros(cs[0].shape, dtype=cs[0].dtype)
    app_parts = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        den_p, app_p = state.density_planes[i], state.app_planes[i]
        den_l, app_l = state.density_lines[i], state.app_lines[i]
        if d_mats is not None:
            den_p = blur_ops.blur_plane(den_p, d_mats[den_p.shape[0]],
                                        d_mats[den_p.shape[1]])
            if not cfg.convolve_plane_only:
                den_l = blur_ops.blur_line(den_l, d_mats[den_l.shape[0]])
        if c_mats is not None:
            app_p = blur_ops.blur_plane(app_p, c_mats[app_p.shape[0]],
                                        c_mats[app_p.shape[1]])
            app_l = blur_ops.blur_line(app_l, c_mats[app_l.shape[0]])
        plane = jnp.concatenate([den_p, app_p], axis=-1)
        line = jnp.concatenate([den_l, app_l], axis=-1)
        # fused product with hand-written VJP: tiny residuals (no remat
        # needed) + single packed row-scatters (sampling.py docstring)
        prod = sample_planeline_prod(plane, line, cs[m0], cs[m1],
                                     cs[VEC_MODE[i]])
        sigma = sigma + jnp.sum(prod[:, :Rd[i]], axis=-1)
        app_parts.append(prod[:, Rd[i]:])
    app = jnp.concatenate(app_parts, axis=-1) @ state.basis
    return sigma, app


def can_fuse_features(cfg: VMConfig) -> bool:
    return (cfg.decomposition == "VM"
            and not cfg.component_wise_feature2density
            and not cfg.plane_feature2density
            and not cfg.abs_components
            and not cfg.convolve_positive_only)


def can_densify(cfg: VMConfig) -> bool:
    """Whether density can be evaluated via the dense-grid expansion.

    Every per-component transform (activation variants, blur) happens on
    the factor grids BEFORE interpolation, so it commutes with the dense
    expansion; only convolve_positive_only mixes blurred/sharp factors
    per *sample* (bateRF.py:83-89) and needs the factored path.
    """
    return not cfg.convolve_positive_only


def compute_density_grid(state: VMState, cfg: VMConfig, blur_mats=None):
    """Dense density-feature grid G [X, Y, Z]: the full rank expansion.

    Exactly equivalent to compute_density_feature at every point when
    sampled trilinearly (ops/densify.py — trilinear weights factorize),
    but evaluated with MXU einsums instead of per-sample gathers.
    Cost: O(XYZ * R) FLOPs + O(XYZ) HBM writes per call, independent of
    the number of samples.
    """
    hi = jax.lax.Precision.HIGHEST
    if cfg.decomposition == "CP":
        G = None
        lines = []
        for i in range(3):
            line = state.density_lines[i]
            if cfg.component_wise_feature2density:
                line = feature2density(cfg, line)
            if blur_mats is not None:
                line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
            lines.append(line)
        # lines[i] is along axis VEC_MODE[i] = (z, y, x)
        G = jnp.einsum("xr,yr,zr->xyz", lines[2].astype(jnp.float32),
                       lines[1], lines[0], precision=hi)
        return G

    spec = ("yxr,zr->xyz", "zxr,yr->xyz", "zyr,xr->xyz")
    G = None
    for i in range(3):
        plane = state.density_planes[i]
        line = state.density_lines[i]
        if cfg.component_wise_feature2density:
            plane = feature2density(cfg, plane)
            line = feature2density(cfg, line)
        elif cfg.plane_feature2density:
            plane = feature2density(cfg, plane)
        elif cfg.abs_components:
            plane = jnp.abs(plane)
            line = jnp.abs(line)
        if blur_mats is not None:
            plane = blur_ops.blur_plane(plane, blur_mats[plane.shape[0]],
                                        blur_mats[plane.shape[1]])
            if not cfg.convolve_plane_only:
                line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
        term = jnp.einsum(spec[i], plane, line.astype(jnp.float32),
                          precision=hi)
        G = term if G is None else G + term
    return G


def compute_lane_density_grid(state: VMState, cfg: VMConfig,
                              blur_mats=None):
    """Lane-packed density grid [X, Y, Zb, 128] (ops/lane_grid.py).

    NOT on the hot path: the direct factor->G128 build measured strictly
    slower in the full step than G-then-pack (see
    lane_grid.build_lane_grid_vm STATUS); the renderer uses
    pack_lane_grid(compute_density_grid(...)).  Kept (with
    tests/test_lane_grid.py exactness pins) as the reference
    implementation of the direct-build design.
    """
    from ..ops import lane_grid

    if cfg.decomposition != "VM":
        return lane_grid.pack_lane_grid(
            compute_density_grid(state, cfg, blur_mats=blur_mats))
    planes, lines = [], []
    for i in range(3):
        plane = state.density_planes[i]
        line = state.density_lines[i]
        if cfg.component_wise_feature2density:
            plane = feature2density(cfg, plane)
            line = feature2density(cfg, line)
        elif cfg.plane_feature2density:
            plane = feature2density(cfg, plane)
        elif cfg.abs_components:
            plane = jnp.abs(plane)
            line = jnp.abs(line)
        if blur_mats is not None:
            plane = blur_ops.blur_plane(plane, blur_mats[plane.shape[0]],
                                        blur_mats[plane.shape[1]])
            if not cfg.convolve_plane_only:
                line = blur_ops.blur_line(line, blur_mats[line.shape[0]])
        planes.append(plane.astype(jnp.float32))
        lines.append(line.astype(jnp.float32))
    return lane_grid.build_lane_grid_vm(planes, lines)


# ------------------------------------------------------------- regularizers
def density_L1(state: VMState):
    """Mean-abs sparsity on density factors (tensoRF.py:212-216 — planes and
    lines for VM; lines for CP (tensoRF.py:457-461))."""
    total = 0.0
    for p in state.density_planes:
        total = total + jnp.mean(jnp.abs(p))
    for l in state.density_lines:
        total = total + jnp.mean(jnp.abs(l))
    return total


def _vector_diffs(lines):
    """Mean |off-diagonal| of the line-factor Gram matrices — the component
    orthogonality diagnostic (tensoRF.py:198-207; defined on both
    TensorVMSplit and the legacy fused TensorVM, referenced by no config —
    provided for API parity)."""
    total = 0.0
    for l in lines:                       # [D, R]
        gram = l.astype(jnp.float32).T @ l.astype(jnp.float32)
        R = gram.shape[0]
        off = gram * (1.0 - jnp.eye(R, dtype=gram.dtype))
        total = total + jnp.sum(jnp.abs(off)) / (R * (R - 1))
    return total


def vector_comp_diffs(state: VMState):
    """tensoRF.py:209-210: density + appearance line orthogonality."""
    return _vector_diffs(state.density_lines) + _vector_diffs(state.app_lines)


def _tv_plane(p):
    """TV of a [H,W,R] plane, matching the reference TVLoss on [1,R,H,W]
    (tensorBase.py:16-41): 2*(mean dh^2 + mean dw^2), batch=1."""
    h_tv = jnp.mean((p[1:, :, :] - p[:-1, :, :]) ** 2)
    w_tv = jnp.mean((p[:, 1:, :] - p[:, :-1, :]) ** 2)
    return 2.0 * (h_tv + w_tv)


def _tv_line(l):
    return 2.0 * jnp.mean((l[1:, :] - l[:-1, :]) ** 2)


def tv_loss_density(state: VMState):
    if not state.density_planes:  # CP
        return sum(_tv_line(l) for l in state.density_lines) * 1e-3
    return sum(_tv_plane(p) for p in state.density_planes) * 1e-2


def tv_loss_app(state: VMState):
    if not state.app_planes:  # CP
        return sum(_tv_line(l) for l in state.app_lines) * 1e-3
    return sum(_tv_plane(p) for p in state.app_planes) * 1e-2


# --------------------------------------------------------- shape transitions
def upsample(state: VMState, res_target: Sequence[int]) -> VMState:
    """Align-corners bilinear upsampling of all factors (tensoRF.py:274-295)."""
    res = [int(r) for r in res_target]

    def up_planes(planes):
        out = []
        for i, p in enumerate(planes):
            m0, m1 = MAT_MODE[i]
            out.append(resample.resize_plane(p, res[m1], res[m0])
                       .astype(p.dtype))
        return out

    def up_lines(lines):
        return [resample.resize_line(l, res[VEC_MODE[i]])
                .astype(lines[i].dtype) for i, l in enumerate(lines)]

    return dataclasses.replace(
        state,
        density_planes=up_planes(state.density_planes),
        density_lines=up_lines(state.density_lines),
        app_planes=up_planes(state.app_planes),
        app_lines=up_lines(state.app_lines),
    )


def shrink(state: VMState, new_aabb) -> VMState:
    """Crop factor grids to a tightened bbox (tensoRF.py:297-334).

    Host-side (static slice bounds -> new shapes -> recompile downstream).
    """
    import numpy as np

    aabb = np.asarray(state.aabb)
    res = np.asarray(state.resolution())
    units = (aabb[1] - aabb[0]) / (res - 1)
    new_aabb = np.asarray(new_aabb).reshape(2, 3)
    t_l = np.round(np.round((new_aabb[0] - aabb[0]) / units)).astype(np.int64)
    b_r = np.round((new_aabb[1] - aabb[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, res)
    t_l = np.maximum(t_l, 0)

    # the snapped bbox corresponding to the integer crop (tensoRF.py:324-330)
    t_l_r = t_l / (res - 1)
    b_r_r = (b_r - 1) / (res - 1)
    correct = np.zeros_like(new_aabb)
    correct[0] = (1 - t_l_r) * aabb[0] + t_l_r * aabb[1]
    correct[1] = (1 - b_r_r) * aabb[0] + b_r_r * aabb[1]

    def crop_planes(planes):
        out = []
        for i, p in enumerate(planes):
            m0, m1 = MAT_MODE[i]
            out.append(p[t_l[m1]:b_r[m1], t_l[m0]:b_r[m0], :])
        return out

    def crop_lines(lines):
        return [l[t_l[VEC_MODE[i]]:b_r[VEC_MODE[i]], :]
                for i, l in enumerate(lines)]

    return dataclasses.replace(
        state,
        density_planes=crop_planes(state.density_planes),
        density_lines=crop_lines(state.density_lines),
        app_planes=crop_planes(state.app_planes),
        app_lines=crop_lines(state.app_lines),
        aabb=jnp.asarray(correct, dtype=jnp.float32),
    )
