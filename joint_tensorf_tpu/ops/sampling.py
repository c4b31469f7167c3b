"""Bilinear plane / linear line sampling of factor grids.

Equivalent of F.grid_sample(align_corners=True) on the VM factor grids
(reference tensoRF.py:230-270), channels-last and differentiable w.r.t. the
sampling coordinates — the coordinate derivative of the bilinear weights is
exactly the path pose gradients take (SURVEY.md §3.5).

Out-of-range coordinates are clamped to the border; callers mask those
samples out (the reference zero-pads instead, but also masks them via
ray_valid, so inside-the-volume results are identical).

The production hot path builds on this contract via the packed-row custom
VJPs below (sample_planeline_prod / corner-packed gathers); see
docs/DESIGN_NOTES.md for the measured alternatives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pix(coord, size: int):
    """Normalized [-1,1] -> continuous pixel index [0, size-1] (align corners)."""
    return jnp.clip((coord + 1.0) * 0.5 * (size - 1), 0.0, size - 1.0)


def _floor_frac(x, size: int):
    x0 = jnp.clip(jnp.floor(jax.lax.stop_gradient(x)), 0, size - 2 if size > 1 else 0)
    frac = x - x0
    return x0.astype(jnp.int32), frac


def sample_line(line, w):
    """line: [D, R]; w: [N] normalized coord along the line axis -> [N, R]."""
    D, R = line.shape
    x = _pix(w, D)
    i0, fx = _floor_frac(x, D)
    i1 = jnp.minimum(i0 + 1, D - 1)
    f0 = jnp.take(line, i0, axis=0)
    f1 = jnp.take(line, i1, axis=0)
    return f0 * (1.0 - fx)[:, None] + f1 * fx[:, None]


def sample_plane(plane, u, v):
    """plane: [H, W, R]; u (->W axis), v (->H axis): [N] in [-1,1] -> [N, R]."""
    H, W, R = plane.shape
    x = _pix(u, W)
    y = _pix(v, H)
    x0, fx = _floor_frac(x, W)
    y0, fy = _floor_frac(y, H)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = plane.reshape(H * W, R)
    f00 = jnp.take(flat, y0 * W + x0, axis=0)
    f01 = jnp.take(flat, y0 * W + x1, axis=0)
    f10 = jnp.take(flat, y1 * W + x0, axis=0)
    f11 = jnp.take(flat, y1 * W + x1, axis=0)

    w00 = ((1 - fy) * (1 - fx))[:, None]
    w01 = ((1 - fy) * fx)[:, None]
    w10 = (fy * (1 - fx))[:, None]
    w11 = (fy * fx)[:, None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def pack_plane(plane):
    """[H, W, R] -> [H, W, 4R]: (self, x+1, y+1, x+1&y+1), edge-clamped.

    Corner-packing the 2x2 bilinear neighborhood channel-wise turns the
    four 64-wide corner gathers (and their four backward row-scatters)
    into ONE 4x-wider row op.  On TPU the row-op count, not bytes, is
    what gathers/scatters pay for (~23 ns/row measured on v5e,
    scripts/packed_gather_bench.py: plane VJP 177 ms -> 84 ms at 2M
    samples).  Same trick as models/alpha_mask.pack_neighborhoods.
    """
    px = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    py = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    pxy = jnp.concatenate([py[:, 1:], py[:, -1:]], axis=1)
    return jnp.concatenate([plane, px, py, pxy], axis=-1)


def sample_plane_packed(plane, u, v):
    """sample_plane via one corner-packed row gather (bitwise identical)."""
    H, W, R = plane.shape
    packed = pack_plane(plane).reshape(H * W, 4 * R)
    x = _pix(u, W)
    y = _pix(v, H)
    x0, fx = _floor_frac(x, W)
    y0, fy = _floor_frac(y, H)
    rows = jnp.take(packed, y0 * W + x0, axis=0)             # [N, 4R]
    w00 = ((1 - fy) * (1 - fx))[:, None]
    w01 = ((1 - fy) * fx)[:, None]
    w10 = (fy * (1 - fx))[:, None]
    w11 = (fy * fx)[:, None]
    return (rows[:, :R] * w00 + rows[:, R:2 * R] * w01
            + rows[:, 2 * R:3 * R] * w10 + rows[:, 3 * R:] * w11)


def pack_line(line):
    """[D, R] -> [D, 2R]: (self, next), edge-clamped (see pack_plane)."""
    nxt = jnp.concatenate([line[1:], line[-1:]], axis=0)
    return jnp.concatenate([line, nxt], axis=-1)


def sample_line_packed(line, w):
    """sample_line via one packed row gather (bitwise identical)."""
    D, R = line.shape
    packed = pack_line(line)
    x = _pix(w, D)
    i0, fx = _floor_frac(x, D)
    rows = jnp.take(packed, i0, axis=0)                      # [N, 2R]
    return rows[:, :R] * (1.0 - fx)[:, None] + rows[:, R:] * fx[:, None]


@jax.custom_vjp
def sample_plane_hybrid(plane, u, v):
    """4-corner gather forward + corner-packed single-scatter backward.

    Forward reads only the 4 needed corners (1x bytes); the backward
    transpose writes ONE [N, 4R] row-scatter into a packed grad buffer
    and folds the shifts densely — instead of XLA's four row-scatters.
    Row-op count is what TPU scatters pay for; measured ~2x on the plane
    VJP (scripts/packed_gather_bench.py).
    """
    return sample_plane(plane, u, v)


def _plane_hybrid_fwd(plane, u, v):
    return sample_plane(plane, u, v), (plane, u, v)


def _plane_hybrid_bwd(res, g):
    plane, u, v = res
    H, W, R = plane.shape
    x = _pix(u, W)
    y = _pix(v, H)
    x0, fx = _floor_frac(x, W)
    y0, fy = _floor_frac(y, H)
    w00 = ((1 - fy) * (1 - fx))[:, None]
    w01 = ((1 - fy) * fx)[:, None]
    w10 = (fy * (1 - fx))[:, None]
    w11 = (fy * fx)[:, None]
    g4 = jnp.concatenate([g * w00, g * w01, g * w10, g * w11], axis=-1)
    d_packed = jnp.zeros((H * W, 4 * R), g.dtype).at[y0 * W + x0].add(g4)
    dp = d_packed.reshape(H, W, 4 * R)
    # transpose of pack_plane's clamped shifts
    d_plane = dp[..., :R]
    dx = dp[..., R:2 * R]
    d_plane = d_plane.at[:, 1:].add(dx[:, :-1]).at[:, -1].add(dx[:, -1])
    dy = dp[..., 2 * R:3 * R]
    d_plane = d_plane.at[1:].add(dy[:-1]).at[-1].add(dy[-1])
    dxy = dp[..., 3 * R:]
    dxy = jnp.pad(dxy[:, :-1], ((0, 0), (1, 0), (0, 0))).at[:, -1].add(
        dxy[:, -1])
    d_plane = d_plane.at[1:].add(dxy[:-1]).at[-1].add(dxy[-1])
    # coordinate grads: vjp of the gather-only closure (plane held constant)
    _, pull = jax.vjp(
        lambda uu, vv: sample_plane(jax.lax.stop_gradient(plane), uu, vv),
        u, v)
    d_u, d_v = pull(g)
    return d_plane.astype(plane.dtype), d_u, d_v


sample_plane_hybrid.defvjp(_plane_hybrid_fwd, _plane_hybrid_bwd)


@jax.custom_vjp
def sample_line_hybrid(line, w):
    """2-point gather forward + packed single-scatter backward."""
    return sample_line(line, w)


def _line_hybrid_fwd(line, w):
    return sample_line(line, w), (line, w)


def _line_hybrid_bwd(res, g):
    line, w = res
    D, R = line.shape
    x = _pix(w, D)
    i0, fx = _floor_frac(x, D)
    g2 = jnp.concatenate([g * (1.0 - fx)[:, None], g * fx[:, None]], axis=-1)
    d_packed = jnp.zeros((D, 2 * R), g.dtype).at[i0].add(g2)
    d_line = d_packed[:, :R]
    dn = d_packed[:, R:]
    d_line = d_line.at[1:].add(dn[:-1]).at[-1].add(dn[-1])
    _, pull = jax.vjp(
        lambda ww: sample_line(jax.lax.stop_gradient(line), ww), w)
    (d_w,) = pull(g)
    return d_line.astype(line.dtype), d_w


sample_line_hybrid.defvjp(_line_hybrid_fwd, _line_hybrid_bwd)


def _plane_fold(d_packed, H, W, R):
    """Transpose of pack_plane's clamped shifts: [H*W, 4R] -> [H, W, R]."""
    dp = d_packed.reshape(H, W, 4 * R)
    d_plane = dp[..., :R]
    dx = dp[..., R:2 * R]
    d_plane = d_plane.at[:, 1:].add(dx[:, :-1]).at[:, -1].add(dx[:, -1])
    dy = dp[..., 2 * R:3 * R]
    d_plane = d_plane.at[1:].add(dy[:-1]).at[-1].add(dy[-1])
    dxy = dp[..., 3 * R:]
    dxy = jnp.pad(dxy[:, :-1], ((0, 0), (1, 0), (0, 0))).at[:, -1].add(
        dxy[:, -1])
    d_plane = d_plane.at[1:].add(dxy[:-1]).at[-1].add(dxy[-1])
    return d_plane


def _line_fold(d_packed, D, R):
    """Transpose of pack_line's clamped shift: [D, 2R] -> [D, R]."""
    d_line = d_packed[:, :R]
    dn = d_packed[:, R:]
    return d_line.at[1:].add(dn[:-1]).at[-1].add(dn[-1])


@jax.custom_vjp
def sample_planeline_prod(plane, line, u, v, w):
    """Fused bilinear-plane x linear-line sample: returns p(u,v) * l(w).

    The VM factor product (tensoRF.py:240-249) with a hand-written VJP
    built for TPU row-op economics (scripts/packed_gather_bench.py,
    docs/DESIGN_NOTES.md):

      * forward: plain 4-corner + 2-point gathers (1x bytes);
      * backward: ONE corner-packed row gather recovers all corner values
        (for the coordinate/pose grads AND the p/l values the product
        rule needs), then ONE [N,4R] row scatter for d_plane and one
        [N,2R] for d_line, folded densely.

    Residuals are just (plane, line, u, v, w) — no [N,R] intermediates —
    so the renderer needs no rematerialization around feature gathers.
    """
    return sample_plane(plane, u, v) * sample_line(line, w)


def _prod_fwd(plane, line, u, v, w):
    # Packed single-row gathers: the 4 corner + 2 line takes cost one row op
    # each here instead of six narrow ones (round-3 profile: the narrow
    # forward takes were ~17 ms of the compacted step — row ops, not bytes,
    # are what gathers pay for).  The pack_plane/pack_line builds are CSE'd
    # with the backward's identical packs inside one jit.
    out = sample_plane_packed(plane, u, v) * sample_line_packed(line, w)
    return out, (plane, line, u, v, w)


# Backward transients ([chunk, 4R] packed updates) are bounded by chunking.
# Round-2 profiling (docs/DESIGN_NOTES.md): at N=524k the 2-chunk fori_loop
# dominated the whole compacted step — slice-start DMAs + loop copies cost
# ~3x the scatters they fed.  The threshold is therefore set so every
# production shape (compacted density <=786k, app_k appearance <=131k) runs
# the unchunked single-scatter branch; the loop remains as an OOM guard for
# pathological sample counts (transient at the threshold: 1M x 64ch = 256MB).
_PROD_BWD_CHUNK = 1 << 20

# Plane-gradient scatter implementation: "xla" (scatter-add) or "segsum"
# (the sorted segment-sum Pallas kernel, ops/segment_scatter.py).  Module
# global read at trace time; set_plane_scatter_impl flips it (trainer wires
# it from tpu.plane_scatter).
_PLANE_SCATTER_IMPL = "xla"


def set_plane_scatter_impl(impl: str):
    global _PLANE_SCATTER_IMPL
    assert impl in ("xla", "segsum", "runsum"), impl
    _PLANE_SCATTER_IMPL = impl


def _run_compress(idx, g, levels: int = 2):
    """March-order run compression for scatter-add updates (round 4).

    Samples arrive in march order, so consecutive updates often target the
    same destination row (measured mean run length ~2.2 per plane at the
    compacted geometry, scripts/scatter_probe.py docstring).  This
    pre-sums each run in windows of W = 2**levels via a segmented
    Hillis-Steele scan (rid is nondecreasing, so rid equality at a span's
    endpoints implies the whole span is one run), then marks every
    non-emission row out-of-bounds — XLA drops OOB scatter rows, so IF
    the emit loop skips them cheaply (the scatter_probe.py measurement)
    the effective row count falls to ~runs + overflow ≈ 0.5N.

    Exact up to f32 re-association (scatter-add order is unspecified
    anyway): each element lands in exactly one emitted window (windows
    are W-aligned within their run; emission at window-ends and run-ends
    tiles the run).
    """
    N, C = g.shape
    W = 1 << levels
    pos = jnp.arange(N, dtype=jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), idx[1:] != idx[:-1]])
    rid = jnp.cumsum(seg_start.astype(jnp.int32))
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg_start, pos, -1))
    local = pos - run_start
    wid = local >> levels                    # window id within the run
    s = g
    for k in range(levels):
        sh = 1 << k
        same = (rid[sh:] == rid[:-sh]) & (wid[sh:] == wid[:-sh])
        mask = jnp.concatenate([jnp.zeros((sh,), bool), same])
        shifted = jnp.concatenate([jnp.zeros((sh, C), g.dtype), s[:-sh]])
        s = s + jnp.where(mask[:, None], shifted, 0.0)
    run_end = jnp.concatenate([idx[1:] != idx[:-1],
                               jnp.ones((1,), bool)])
    emit = run_end | ((local & (W - 1)) == (W - 1))
    return jnp.where(emit, idx, jnp.int32(2**30)), s


def _scatter_plane_rows(idx, g4, n_rows: int):
    if _PLANE_SCATTER_IMPL == "segsum":
        from .segment_scatter import scatter_add_rows

        return scatter_add_rows(idx, g4, n_rows)
    if _PLANE_SCATTER_IMPL == "runsum":
        idx2, g2 = _run_compress(idx, g4)
        return jnp.zeros((n_rows, g4.shape[-1]), g4.dtype).at[idx2].add(
            g2, mode="drop")
    return jnp.zeros((n_rows, g4.shape[-1]), g4.dtype).at[idx].add(g4)


def _scatter_rows_matmul(idx, updates, n_rows: int):
    """Row scatter-add with a TINY destination, as one MXU matmul.

    zeros([n_rows, C]).at[idx].add(updates) for n_rows ~ a few hundred
    (the VM line factors): XLA's scatter pays ~45 ns per update ROW
    regardless of destination size (round-3 profile: 3.7 ms per 524k-row
    line scatter), while onehot(idx)^T @ updates is one [N, n_rows] f32
    materialization + a small-N-contraction matmul (~2 ms).  f32 one-hot
    keeps the products exact; only the summation order differs from the
    scatter.
    """
    N = idx.shape[0]
    # NOTE (round 4): the one-hot materializes with a transposed layout
    # (~20 ms at the dense phase's 128k appearance samples, phase_profile
    # fusion "transpose(jvp)/eq"); all three contraction orientations
    # (onehot^T@upd, pre-transposed onehot, upd^T@onehot + small-result
    # transpose) measured IDENTICAL — XLA canonicalizes them to the same
    # program, so the cost is the one-hot stream itself, not a fixable
    # layout choice.  Kept because it still beats the XLA scatter 3x at
    # the compacted shapes (round-3 measurement).
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (N, n_rows), 1)
              == idx[:, None]).astype(updates.dtype)
    return jax.lax.dot_general(
        onehot, updates, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(updates.dtype)


def _prod_bwd(res, g):
    plane, line, u, v, w = res
    H, W, R = plane.shape
    D = line.shape[0]
    N = u.shape[0]
    ck = max(1, min(_PROD_BWD_CHUNK, N))
    n_chunks = -(-N // ck)
    pad = n_chunks * ck - N
    up = jnp.pad(u, (0, pad))
    vp = jnp.pad(v, (0, pad))
    wp = jnp.pad(w, (0, pad))
    gpad = jnp.pad(g, ((0, pad), (0, 0)))     # zero rows: pad contributes 0
    packed_plane = pack_plane(plane).reshape(H * W, 4 * R)
    packed_line = pack_line(line)

    def chunk_grads(uu, vv, ww, gg):
        x_raw = (uu + 1.0) * 0.5 * (W - 1)
        y_raw = (vv + 1.0) * 0.5 * (H - 1)
        z_raw = (ww + 1.0) * 0.5 * (D - 1)
        x0, fx = _floor_frac(jnp.clip(x_raw, 0.0, W - 1.0), W)
        y0, fy = _floor_frac(jnp.clip(y_raw, 0.0, H - 1.0), H)
        i0, fz = _floor_frac(jnp.clip(z_raw, 0.0, D - 1.0), D)
        rows = jnp.take(packed_plane, y0 * W + x0, axis=0)    # [ck, 4R]
        f00, f01, f10, f11 = (rows[:, :R], rows[:, R:2 * R],
                              rows[:, 2 * R:3 * R], rows[:, 3 * R:])
        lrows = jnp.take(packed_line, i0, axis=0)             # [ck, 2R]
        l0, l1 = lrows[:, :R], lrows[:, R:]
        w00 = ((1 - fy) * (1 - fx))[:, None]
        w01 = ((1 - fy) * fx)[:, None]
        w10 = (fy * (1 - fx))[:, None]
        w11 = (fy * fx)[:, None]
        p = f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11
        l = l0 * (1.0 - fz)[:, None] + l1 * fz[:, None]
        gl = gg * l
        gp = gg * p
        g4 = jnp.concatenate([gl * w00, gl * w01, gl * w10, gl * w11], -1)
        g2 = jnp.concatenate([gp * (1.0 - fz)[:, None], gp * fz[:, None]], -1)
        dp_dx = (f01 - f00) * (1 - fy)[:, None] + (f11 - f10) * fy[:, None]
        dp_dy = (f10 - f00) * (1 - fx)[:, None] + (f11 - f01) * fx[:, None]
        mx = ((x_raw > 0) & (x_raw < W - 1)).astype(gg.dtype)
        my = ((y_raw > 0) & (y_raw < H - 1)).astype(gg.dtype)
        mz = ((z_raw > 0) & (z_raw < D - 1)).astype(gg.dtype)
        d_u = jnp.sum(gl * dp_dx, -1) * (0.5 * (W - 1)) * mx
        d_v = jnp.sum(gl * dp_dy, -1) * (0.5 * (H - 1)) * my
        d_w = jnp.sum(gp * (l1 - l0), -1) * (0.5 * (D - 1)) * mz
        return y0 * W + x0, g4, i0, g2, d_u, d_v, d_w

    if n_chunks == 1:
        idx, g4, i0, g2, d_u, d_v, d_w = chunk_grads(up, vp, wp, gpad)
        d_pk = _scatter_plane_rows(idx, g4, H * W)
        d_lk = _scatter_rows_matmul(i0, g2, D)
    else:
        def body(i, carry):
            d_pk, d_lk, d_u, d_v, d_w = carry
            s = i * ck
            uu = jax.lax.dynamic_slice(up, (s,), (ck,))
            vv = jax.lax.dynamic_slice(vp, (s,), (ck,))
            ww = jax.lax.dynamic_slice(wp, (s,), (ck,))
            gg = jax.lax.dynamic_slice(gpad, (s, 0), (ck, R))
            idx, g4, i0, g2, du, dv, dw = chunk_grads(uu, vv, ww, gg)
            return (d_pk.at[idx].add(g4), d_lk.at[i0].add(g2),
                    jax.lax.dynamic_update_slice(d_u, du, (s,)),
                    jax.lax.dynamic_update_slice(d_v, dv, (s,)),
                    jax.lax.dynamic_update_slice(d_w, dw, (s,)))

        init = (jnp.zeros((H * W, 4 * R), g.dtype),
                jnp.zeros((D, 2 * R), g.dtype),
                jnp.zeros_like(up), jnp.zeros_like(vp), jnp.zeros_like(wp))
        d_pk, d_lk, d_u, d_v, d_w = jax.lax.fori_loop(0, n_chunks, body, init)

    return (_plane_fold(d_pk, H, W, R).astype(plane.dtype),
            _line_fold(d_lk, D, R).astype(line.dtype),
            d_u[:N], d_v[:N], d_w[:N])


sample_planeline_prod.defvjp(_prod_fwd, _prod_bwd)


def sample_image(img, coords, mode: str = "bilinear"):
    """grid_sample(align_corners=False, padding=zeros) on an image.

    img: [C, H, W]; coords: [N, 2] (x, y) in [-1,1] -> [N, C].
    Used by the planar pipeline (planar.py:129, planar_svd.py:344).
    """
    C, H, W = img.shape
    x = (coords[:, 0] + 1.0) * W / 2.0 - 0.5
    y = (coords[:, 1] + 1.0) * H / 2.0 - 0.5
    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = img.reshape(C, H * W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        out = jnp.take(flat, idx, axis=1).T
        return out * inb[:, None]
    x0f = jnp.floor(jax.lax.stop_gradient(x))
    y0f = jnp.floor(jax.lax.stop_gradient(y))
    fx = x - x0f
    fy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    flat = img.reshape(C, H * W)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=1).T        # [N, C]
        return vals * (w * inb)[:, None]

    return (corner(x0, y0, (1 - fx) * (1 - fy))
            + corner(x0 + 1, y0, fx * (1 - fy))
            + corner(x0, y0 + 1, (1 - fx) * fy)
            + corner(x0 + 1, y0 + 1, fx * fy))


def sample_grid3d(grid, xyz):
    """Trilinear sample of a dense 3D grid (the alpha mask).

    grid: [X, Y, Z]; xyz: [N, 3] normalized to [-1,1] per axis -> [N].
    Matches AlphaGridMask.sample_alpha (tensorBase.py:91-95) which uses
    grid_sample on a volume laid out [D=Z, H=Y, W=X] with coords (x, y, z).
    """
    X, Y, Z = grid.shape
    x = _pix(xyz[:, 0], X)
    y = _pix(xyz[:, 1], Y)
    z = _pix(xyz[:, 2], Z)
    x0, fx = _floor_frac(x, X)
    y0, fy = _floor_frac(y, Y)
    z0, fz = _floor_frac(z, Z)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)

    flat = grid.reshape(-1)

    def gat(xi, yi, zi):
        return jnp.take(flat, (xi * Y + yi) * Z + zi)

    c000 = gat(x0, y0, z0)
    c001 = gat(x0, y0, z1)
    c010 = gat(x0, y1, z0)
    c011 = gat(x0, y1, z1)
    c100 = gat(x1, y0, z0)
    c101 = gat(x1, y0, z1)
    c110 = gat(x1, y1, z0)
    c111 = gat(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx
