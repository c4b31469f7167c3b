"""Lane-packed dense-grid trilinear sampling (TPU 128-lane layout).

Round-2 perf finding (scripts/densify_breakdown.py, float-synced): the
corner-packed [X,Y,Z,8] layout of ops/densify.py gathers 8-wide rows —
8/128 of a TPU vector lane — and measured ~92 ns/row (48 ms forward, 94 ms
backward at 524k samples).  Row ops pay for *rows*, so the fix is to make
each gathered row carry a full 128-lane payload:

  * pack the grid as [X, Y, Zb, 128]: each 128-lane row holds a run of
    32 z-entries x 4 xy-corner channels (c = dx*2 + dy), blocks advance
    31 z cells with 1 halo entry so any (z0, z0+1) pair lives in one row;
  * one [N, 128] row gather per sample;
  * the 8 trilinear corner values are extracted with a masked dot:
    value = sum(row * W) where W has 8 nonzero lanes built from lane-iota
    comparisons (VPU elementwise, no second gather).

Everything is plain jnp: autodiff turns the gather into one full-lane row
scatter, the masked dot into the coordinate (pose-path) gradients, and the
pack's shifted slices into the dense fold — no custom VJP needed.

Semantics are identical to ops/densify.sample_packed_grid (same clamping
conventions as ops/sampling._floor_frac); pinned in tests/test_lane_grid.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ZRUN = 31          # z cells advanced per block (32 entries incl. 1 halo)
LANES = 128        # 32 z-entries x 4 xy-corner channels


def _shift(a, axis):
    """Edge-clamped +1 shift along ``axis`` (same clamp as pack_corners)."""
    idx_main = [slice(None)] * a.ndim
    idx_last = [slice(None)] * a.ndim
    idx_main[axis] = slice(1, None)
    idx_last[axis] = slice(-1, None)
    return jnp.concatenate([a[tuple(idx_main)], a[tuple(idx_last)]],
                           axis=axis)


def n_blocks(Z: int) -> int:
    return -(-max(Z - 1, 1) // ZRUN)


def _pack_lane_grid_impl(G):
    X, Y, Z = G.shape
    Zb = n_blocks(Z)
    gy = _shift(G, 1)
    g4 = jnp.stack([G, gy, _shift(G, 0), _shift(gy, 0)], axis=-1)  # [X,Y,Z,4]
    zpad = Zb * ZRUN + 1 - Z
    if zpad > 0:
        g4 = jnp.concatenate(
            [g4, jnp.repeat(g4[:, :, -1:], zpad, axis=2)], axis=2)
    blocks = [jax.lax.slice_in_dim(g4, zb * ZRUN, zb * ZRUN + ZRUN + 1,
                                   axis=2) for zb in range(Zb)]
    out = jnp.stack(blocks, axis=2)                  # [X, Y, Zb, 32, 4]
    return out.reshape(X, Y, Zb, LANES)


@jax.custom_vjp
def pack_lane_grid(G):
    """[X, Y, Z] -> [X, Y, Zb, 128] lane-packed corner grid.

    Entry (x, y, zb, j*4 + c) = G[x+dx, y+dy, zb*31 + j] for c = dx*2+dy,
    j in 0..31 (edge-clamped; z rows beyond Z-1 clamp to the last cell).

    The VJP is hand-written: the naive autodiff fold reshapes through
    4-minor-lane intermediates and measured 300+ ms at 300^3 on v5e; this
    fold keeps every intermediate >= 32 lanes wide — per corner channel,
    an MXU lane-extraction matmul [.,128]@[128,32], a block overlap-add
    (core reshape + one strided halo add), then the shift transposes on
    the full-Z-minor grid.
    """
    return _pack_lane_grid_impl(G)


def _pack_fwd(G):
    return _pack_lane_grid_impl(G), G.shape


def _unshift_T(d, axis):
    """Transpose of the edge-clamped +1 _shift: out[i+1] += d[i] with the
    last slot clamping onto itself."""
    pad_cfg = [(0, 0)] * d.ndim
    pad_cfg[axis] = (1, 0)
    out = jnp.pad(d[tuple(
        slice(None) if a != axis else slice(0, d.shape[axis] - 1)
        for a in range(d.ndim))], pad_cfg)
    idx_last = tuple(slice(None) if a != axis else slice(-1, None)
                     for a in range(d.ndim))
    return out.at[idx_last].add(d[idx_last])


def _pack_bwd(shape, dP):
    X, Y, Z = shape
    Zb = n_blocks(Z)
    Zpad = Zb * ZRUN + 1
    flat = dP.reshape(X * Y * Zb, LANES)
    hi = jax.lax.Precision.HIGHEST

    d_g4 = []                                     # per corner: [X, Y, Zpad]
    for c in range(4):
        # lane extraction via MXU: M[l, j] = 1 iff l == j*4 + c
        M = jnp.zeros((LANES, 32), dP.dtype).at[
            jnp.arange(32) * 4 + c, jnp.arange(32)].set(1.0)
        dc = jax.lax.dot_general(flat, M, (((1,), (0,)), ((), ())),
                                 precision=hi)     # [X*Y*Zb, 32]
        dc = dc.reshape(X, Y, Zb, 32)
        # block overlap-add: entry j<=30 -> z = zb*31 + j (disjoint cores),
        # halo entry j=31 -> z = zb*31 + 31 (the next block's j=0 slot)
        core = dc[..., :ZRUN].reshape(X, Y, Zb * ZRUN)
        out = jnp.concatenate(
            [core, jnp.zeros((X, Y, 1), dP.dtype)], axis=2)  # [X, Y, Zpad]
        out = out.at[:, :, ZRUN::ZRUN].add(dc[..., 31])
        d_g4.append(out)

    # un-pad z: clamped tail rows fold onto the last real cell
    def unpad_z(d):
        if Zpad == Z:
            return d
        main = d[:, :, :Z]
        return main.at[:, :, -1].add(jnp.sum(d[:, :, Z:], axis=2))

    d_g4 = [unpad_z(d) for d in d_g4]
    # transpose of the xy corner shifts: c = dx*2 + dy over [G, Gy, Gx, Gxy]
    dG = d_g4[0]
    dG = dG + _unshift_T(d_g4[1], 1)
    dG = dG + _unshift_T(d_g4[2], 0)
    dG = dG + _unshift_T(_unshift_T(d_g4[3], 1), 0)
    return (dG,)


pack_lane_grid.defvjp(_pack_fwd, _pack_bwd)


def unpack_lane_grid_T(shape, dP):
    """Transpose of pack_lane_grid, rewritten at streaming speed (round 3).

    Same math as _pack_bwd (pinned against it in tests/test_lane_grid.py),
    restructured so every big intermediate is a full-lane stream:

      1. ONE [.,128]@[128,128] permutation matmul reorders lanes from
         (j*4 + c) to (c*32 + j) — reading the 460 MB input once instead of
         once per corner;
      2. the block overlap-add becomes a Zb-axis shift + concat (no strided
         .at[::31] updates, which materialized full-grid copies);
      3. the z un-pad and corner shift transposes are plain pad/slice adds
         XLA fuses into one output pass.

    Measured vs _pack_bwd at 300^3 in scripts/lane_fold_bench.py.
    """
    X, Y, Z = shape
    Zb = n_blocks(Z)
    Zpad = Zb * ZRUN + 1
    flat = dP.reshape(X * Y * Zb, LANES)
    hi = jax.lax.Precision.HIGHEST

    # lane permutation (j*4 + c) -> (c*32 + j) via MXU
    j = jnp.arange(32)
    c = jnp.arange(4)
    src = (j[None, :] * 4 + c[:, None]).reshape(-1)        # dst lane c*32+j
    M = jnp.zeros((LANES, LANES), dP.dtype).at[
        src, jnp.arange(LANES)].set(1.0)
    F = jax.lax.dot_general(flat, M, (((1,), (0,)), ((), ())),
                            precision=hi).reshape(X, Y, Zb, 4, 32)

    d_g4 = []
    for ci in range(4):
        Fc = F[:, :, :, ci, :]                             # [X, Y, Zb, 32]
        core = Fc[..., :ZRUN]                              # [X, Y, Zb, 31]
        halo = Fc[..., ZRUN]                               # [X, Y, Zb]
        # halo of block b lands at z = (b+1)*31 = block b+1's j=0 slot
        hp = jnp.concatenate(
            [jnp.zeros((X, Y, 1), dP.dtype), halo[:, :, :-1]], axis=2)
        core = jnp.concatenate(
            [(core[..., 0] + hp)[..., None], core[..., 1:]], axis=-1)
        dzp = jnp.concatenate(
            [core.reshape(X, Y, Zb * ZRUN), halo[:, :, -1:]], axis=2)
        # un-pad: clamped tail rows (z >= Z) fold onto the last real cell
        if Zpad > Z:
            main = dzp[:, :, :Z]
            main = main.at[:, :, -1].add(jnp.sum(dzp[:, :, Z:], axis=2))
            dzp = main
        d_g4.append(dzp)

    dG = d_g4[0]
    dG = dG + _unshift_T(d_g4[1], 1)
    dG = dG + _unshift_T(d_g4[2], 0)
    dG = dG + _unshift_T(_unshift_T(d_g4[3], 1), 0)
    return dG


def _block_z(f, Z: int):
    """[D, ...] -> [Zb, 32, ...] overlapping z windows (31 + 1 halo),
    edge-clamp padded.  Operates on FACTORS (KB-MB), so autodiff through
    the slices is cheap — unlike blocking the dense grid."""
    Zb = n_blocks(Z)
    zpad = Zb * ZRUN + 1 - Z
    if zpad > 0:
        f = jnp.concatenate([f, jnp.repeat(f[-1:], zpad, axis=0)], axis=0)
    return jnp.stack([jax.lax.slice_in_dim(f, zb * ZRUN, zb * ZRUN + 32,
                                           axis=0) for zb in range(Zb)],
                     axis=0)


def build_lane_grid_vm(planes, lines, precision=None):
    """[X, Y, Zb, 128] lane grid DIRECTLY from VM factors.

    STATUS: measured DEAD END on v5e (kept as the reference for the design
    space, like ops/binned_scatter.py): in the full train step this build
    made the dense phase 218 -> 321 ms — the three per-axis 5-D einsums
    with tiny R contractions and 460MB outputs neither fuse with each
    other nor with the consumer, while the G-then-pack path fuses well.
    Exactness (values + grads) vs pack_lane_grid(dense expansion) is
    pinned in tests/test_lane_grid.py.

    Equivalent to pack_lane_grid(sum_i plane_i (x) line_i) but never
    materializes the dense [X,Y,Z] grid or streams it through the pack:
    per axis, the corner shifts / z-blocking are applied to the SMALL
    factors and one einsum emits the packed layout — and autodiff's
    transposes are two einsum reads of d_G128 per axis plus small-tensor
    folds, instead of the big-grid fold + build transpose.

    planes/lines follow models.vm conventions (MAT_MODE/VEC_MODE; any
    activation/blur already applied): plane i [res[m1], res[m0], R_i],
    line i [res[vec_i], R_i]; the z (lane-run) axis is axis 2 of the grid.
    """
    hi = precision if precision is not None else jax.lax.Precision.HIGHEST
    # grid extents: X = res[0], Y = res[1], Z = res[2]
    Y_, X_, _ = planes[0].shape     # plane 0 is [res[1], res[0], R]
    Z_ = lines[0].shape[0]          # line 0 runs along z = res[2]
    Zb = n_blocks(Z_)

    # ---- axis 0: P[y, x, r] * L[z, r]; corner shifts live on the plane
    P = planes[0]
    Py = _shift(P, 0)               # dy -> plane axis 0 (y)
    P4 = jnp.stack([P, Py, _shift(P, 1), _shift(Py, 1)], axis=-1)
    Lb = _block_z(lines[0], Z_)     # [Zb, 32, R]
    t = jnp.einsum("yxrc,bjr->xybjc", P4, Lb,
                   precision=hi)    # [X, Y, Zb, 32, 4]
    G = t.reshape(X_, Y_, Zb, LANES)

    # ---- axis 1: P1[z, x, r] * L1[y, r]; dx on the plane, dy on the line
    P1 = planes[1]
    P1b = _block_z(jnp.stack([P1, _shift(P1, 1)], axis=-1), Z_)
    # P1b: [Zb, 32, X, R, 2(dx)]
    L1 = lines[1]
    L1s = jnp.stack([L1, _shift(L1, 0)], axis=-1)    # [Y, R, 2(dy)]
    t = jnp.einsum("bjxrd,yre->xybjde", P1b, L1s, precision=hi)
    G = G + t.reshape(X_, Y_, Zb, LANES)

    # ---- axis 2: P2[z, y, r] * L2[x, r]; dy on the plane, dx on the line
    P2 = planes[2]
    P2b = _block_z(jnp.stack([P2, _shift(P2, 1)], axis=-1), Z_)
    # P2b: [Zb, 32, Y, R, 2(dy)]
    L2 = lines[2]
    L2s = jnp.stack([L2, _shift(L2, 0)], axis=-1)    # [X, R, 2(dx)]
    t = jnp.einsum("bjyre,xrd->xybjde", P2b, L2s, precision=hi)
    return G + t.reshape(X_, Y_, Zb, LANES)


def _pix(coord, size: int):
    return jnp.clip((coord + 1.0) * 0.5 * (size - 1), 0.0, size - 1.0)


def _floor_frac(x, size: int):
    x0 = jnp.clip(jnp.floor(jax.lax.stop_gradient(x)), 0,
                  size - 2 if size > 1 else 0)
    frac = x - x0
    return x0.astype(jnp.int32), frac


@jax.custom_vjp
def _bf16_row_gather(Gflat, idx):
    """Row gather that READS bfloat16 from HBM but is float32 everywhere
    else: forward casts the grid to bf16 (one streamed pass, then every
    row fetch moves half the bytes) and upcasts the gathered rows; the
    backward scatter-add accumulates float32 cotangents straight into the
    float32 grid — bf16 scatter accumulation (the dangerous half of mixed
    precision: ~2M colliding row updates) never happens."""
    return jnp.take(Gflat.astype(jnp.bfloat16), idx,
                    axis=0).astype(jnp.float32)


def _bf16_row_gather_fwd(Gflat, idx):
    return _bf16_row_gather(Gflat, idx), (idx, Gflat.shape)


def _bf16_row_gather_bwd(res, d_rows):
    idx, shape = res
    dG = jnp.zeros(shape, jnp.float32).at[idx].add(
        d_rows.astype(jnp.float32))
    return dG, None


_bf16_row_gather.defvjp(_bf16_row_gather_fwd, _bf16_row_gather_bwd)


def sample_lane_grid(G128, coords, Z: int, row_dtype: str = "float32"):
    """Trilinear sample via ONE full-lane row gather per point.

    G128: [X, Y, Zb, 128] from pack_lane_grid; coords: [N, 3] normalized to
    [-1, 1] per axis (x -> X, the normalize_coord convention); Z: the
    unpacked z extent (static) -> [N].

    row_dtype "bfloat16" halves the gather's HBM bytes (the dominant
    dense-phase cost) via _bf16_row_gather; the trilinear dot, the
    coordinate (pose-path) gradients, and the backward scatter stay
    float32.  Grid values quantize to 8 mantissa bits — exactness vs
    float32 is pinned to ~1e-2 relative in tests/test_lane_grid.py and
    the end-to-end quality delta is measured in docs/PARITY.md.
    """
    X, Y, Zb, _ = G128.shape
    if isinstance(coords, (tuple, list)):
        cx, cy, cz = coords            # per-axis [N] (lane-friendly)
    else:
        cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]
    x0, fx = _floor_frac(_pix(cx, X), X)
    y0, fy = _floor_frac(_pix(cy, Y), Y)
    z0, fz = _floor_frac(_pix(cz, Z), Z)
    zb = z0 // ZRUN
    zl = z0 - zb * ZRUN                                # 0..30

    idx = (x0 * Y + y0) * Zb + zb
    if row_dtype == "bfloat16":
        rows = _bf16_row_gather(G128.reshape(X * Y * Zb, LANES), idx)
    else:
        rows = jnp.take(G128.reshape(X * Y * Zb, LANES), idx,
                        axis=0)                        # [N, 128]

    # masked-dot extraction: lane j = z_local*4 + c carries corner
    # c = dx*2 + dy at z offset (j>>2) - zl in {0, 1}.  The trilinear
    # weight factorizes per lane — W[j] = Wz[j>>2] * wx[c>>1] * wy[c&1] —
    # so 4 selects + 2 multiplies build W instead of round-3's 8 one-hot
    # selects + 7 adds (same products bitwise: IEEE multiplication is
    # commutative; ~40% less VPU work on the [N, 128] stream, measured in
    # the round-4 dense-phase profile).
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    zslot = iota >> 2                                  # 0..31 per lane
    zl_c = zl[:, None]
    fx_c, fy_c, fz_c = fx[:, None], fy[:, None], fz[:, None]
    zero = jnp.zeros((), G128.dtype)
    Wz = (jnp.where(zslot == zl_c, 1.0 - fz_c, zero)
          + jnp.where(zslot == zl_c + 1, fz_c, zero))
    Wxy = (jnp.where((iota & 2) != 0, fx_c, 1.0 - fx_c)
           * jnp.where((iota & 1) != 0, fy_c, 1.0 - fy_c))
    W = Wz * Wxy
    return jnp.sum(rows * W, axis=-1)
