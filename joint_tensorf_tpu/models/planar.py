"""Planar (2D) neural-image models for the alignment sanity pipeline.

Three image parameterizations with the same forward contract
``apply(params, coords [B,N,2], progress, ...) -> rgb [B,N,3]``:

  * SVDImage  — rank-R separable factors with scheduled rank + scheduled
    component-wise 1D Gaussian blur (reference planar_svd.py:236-349, the
    paper's 2D analogue of the 3D method).  The rank schedule is realized
    as a component *mask* (zeroing components >= cur_rank) so shapes stay
    static under jit — numerically identical to the reference's slicing
    because components enter as a sum of outer products.
  * FFTImage  — PREF-style Fourier line factors with Parseval regularizer
    (reference planar_fft.py:47-126).
  * MLPImage  — BARF's coordinate-MLP with c2f positional-encoding masking
    (reference planar.py:282-337).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blur as blur_ops
from ..ops.sampling import sample_image


# --------------------------------------------------------------- SVD image
def init_svd_image(key, max_ranks: int, W: int, H: int, scale: float = 0.1):
    """rank1: [3, R, W] (x-factors), rank2: [3, R, H] (y-factors)
    (planar_svd.py:290-297)."""
    k1, k2 = jax.random.split(key)
    return {
        "rank1": scale * jax.random.normal(k1, (3, max_ranks, W)),
        "rank2": scale * jax.random.normal(k2, (3, max_ranks, H)),
    }


def svd_image_forward(params, coords, kernel=None, cur_rank=None,
                      interp_before_product: bool = True,
                      mode: str = "bilinear"):
    """coords: [B, N, 2] -> rgb [B, N, 3].

    kernel: optional [taps] 1D blur kernel applied per component (zero
    padding, matching conv1d padding="same", planar_svd.py:318-321).
    cur_rank: traced scalar; components >= cur_rank are masked to zero.
    """
    r1, r2 = params["rank1"], params["rank2"]       # [3,R,W], [3,R,H]
    R = r1.shape[1]
    W, H = r1.shape[2], r2.shape[2]
    if cur_rank is not None:
        mask = (jnp.arange(R) < cur_rank).astype(r1.dtype)[None, :, None]
        r1 = r1 * mask
        r2 = r2 * mask
    if kernel is not None:
        Bw = blur_ops.blur_matrix(kernel, W, padding="zero")
        Bh = blur_ops.blur_matrix(kernel, H, padding="zero")
        r1 = jnp.einsum("crw,vw->crv", r1, Bw)
        r2 = jnp.einsum("crh,vh->crv", r2, Bh)

    B, N = coords.shape[0], coords.shape[1]
    if interp_before_product:
        # sample each 1D factor at the warped coordinate then contract
        # (planar_svd.py:326-334)
        def per_batch(c):
            x = (c[:, 0] + 1.0) * W / 2.0 - 0.5
            y = (c[:, 1] + 1.0) * H / 2.0 - 0.5
            xs = _sample_lines(r1, x, mode)          # [3, R, N]
            ys = _sample_lines(r2, y, mode)
            return jnp.sum(xs * ys, axis=1).T        # [N, 3]

        return jax.vmap(per_batch)(coords)
    # reconstruct the full image then bilinear-sample (planar_svd.py:338-344)
    img = jnp.einsum("crh,crw->chw", r2, r1)         # [3, H, W]

    def per_batch(c):
        return sample_image(img, c, mode=mode)

    return jax.vmap(per_batch)(coords)


def _sample_lines(lines, pix, mode):
    """lines: [3, R, L]; pix: [N] continuous pixel coords (align_corners=False
    convention, zero padding) -> [3, R, N]."""
    L = lines.shape[-1]
    if mode == "nearest":
        xi = jnp.round(pix).astype(jnp.int32)
        inb = (xi >= 0) & (xi < L)
        out = jnp.take(lines, jnp.clip(xi, 0, L - 1), axis=2)
        return out * inb[None, None, :]
    x0f = jnp.floor(jax.lax.stop_gradient(pix))
    fx = pix - x0f
    x0 = x0f.astype(jnp.int32)

    def corner(xi, w):
        inb = (xi >= 0) & (xi < L)
        vals = jnp.take(lines, jnp.clip(xi, 0, L - 1), axis=2)
        return vals * (w * inb)[None, None, :]

    return corner(x0, 1 - fx) + corner(x0 + 1, fx)


def svd_tv_loss(params, max_ranks: int):
    """planar_svd.py:220-233."""
    r1, r2 = params["rank1"], params["rank2"]
    N1 = r1.shape[2] * max_ranks
    N2 = r2.shape[2] * max_ranks
    tv1 = jnp.sum((r1[..., 1:] - r1[..., :-1]) ** 2) / N1
    tv2 = jnp.sum((r2[..., 1:] - r2[..., :-1]) ** 2) / N2
    return tv1 + tv2


# --------------------------------------------------------------- FFT image
def init_fft_image(W: int, H: int):
    """Complex Fourier line factors (planar_fft.py:73-81): rank1 holds
    [3, W//5, H] coefficients (x-frequency lines varying along y)."""
    max_r1, max_r2 = W // 5, H // 5
    return {
        "rank1": jnp.zeros((3, max_r1, H), jnp.complex64),
        "rank2": jnp.zeros((3, max_r2, W), jnp.complex64),
    }


def fft_image_reconstruct(params, cur_rank=None, kernel=None):
    """-> [3, H, W] real image = Re(ifft lines x Fourier basis) summed
    (planar_fft.py:83-106)."""
    r1, r2 = params["rank1"], params["rank2"]
    R1, H = r1.shape[1], r1.shape[2]
    R2, W = r2.shape[1], r2.shape[2]
    if cur_rank is not None:
        m1 = (jnp.arange(R1) < cur_rank)[None, :, None]
        m2 = (jnp.arange(R2) < cur_rank)[None, :, None]
        r1 = r1 * m1
        r2 = r2 * m2
    r1_i = jnp.fft.ifft(r1, axis=2, norm="forward")
    r2_i = jnp.fft.ifft(r2, axis=2, norm="forward")
    if kernel is not None:
        Bh = blur_ops.blur_matrix(kernel, H, padding="zero")
        Bw = blur_ops.blur_matrix(kernel, W, padding="zero")
        r1_i = jnp.einsum("crh,vh->crv", r1_i, Bh.astype(r1_i.dtype))
        r2_i = jnp.einsum("crw,vw->crv", r2_i, Bw.astype(r2_i.dtype))
    # the reference's broadcasting (planar_fft.py:101-104) is only coherent
    # for square images; keep that constraint
    assert H == W, "FFT planar image requires square resolution"
    basis_h = jnp.exp(2j * np.pi * jnp.arange(R1)[:, None] / H *
                      jnp.arange(H)[None, :]).astype(jnp.complex64)  # [R1,H]
    basis_w = jnp.exp(2j * np.pi * jnp.arange(R2)[:, None] / W *
                      jnp.arange(W)[None, :]).astype(jnp.complex64)  # [R2,W]
    # img1[c,a,b] = sum_r basis_h[r,a] * r1_i[c,r,b]  (planar_fft.py:101)
    # img2[c,a,b] = sum_r r2_i[c,r,a] * basis_w[r,b]  (planar_fft.py:102)
    img1 = jnp.einsum("ra,crb->cab", basis_h, r1_i)
    img2 = jnp.einsum("cra,rb->cab", r2_i, basis_w)
    return jnp.real(img1) + jnp.real(img2)


def fft_image_forward(params, coords, cur_rank=None, kernel=None,
                      mode: str = "bilinear"):
    img = fft_image_reconstruct(params, cur_rank, kernel)

    def per_batch(c):
        return sample_image(img, c, mode=mode)

    return jax.vmap(per_batch)(coords)


def _safe_norm(r):
    """L2 norm with a zero (not NaN) gradient at r=0.

    torch.linalg.norm special-cases the subgradient at the origin to 0; jnp's
    x/||x|| form yields NaN there — and the FFT image initializes its
    coefficients to exactly zero (planar_fft.py:74-79), so the very first
    Parseval gradient hits that point.
    """
    s = jnp.sum(jnp.real(r * jnp.conj(r)))
    nonzero = s > 0
    return jnp.sqrt(jnp.where(nonzero, s, 1.0)) * nonzero


def fft_parseval_loss(params):
    """planar_fft.py:119-126."""
    r1, r2 = params["rank1"], params["rank2"]
    R1, H = r1.shape[1], r1.shape[2]
    R2, W = r2.shape[1], r2.shape[2]
    r1_v = jnp.arange(H)[None, None, :] * r1
    r1_u = jnp.arange(R1)[None, :, None] * r1
    r2_v = jnp.arange(W)[None, None, :] * r2
    r2_u = jnp.arange(R2)[None, :, None] * r2
    return sum(_safe_norm(r) for r in [r1_v, r1_u, r2_v, r2_u])


# --------------------------------------------------------------- MLP image
def init_mlp_image(key, layers, L_2D: int, skip=(), barf_c2f=None):
    """BARF planar MLP (planar.py:289-303)."""
    import math

    input_dim = 2 + 4 * L_2D
    dims = [input_dim] + list(layers)
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for li in range(len(dims) - 1):
        k_in = dims[li]
        if li in skip:
            k_in += input_dim
        bound = 1.0 / math.sqrt(k_in)
        kw, kb = jax.random.split(keys[li])
        w = jax.random.uniform(kw, (k_in, dims[li + 1]), minval=-bound,
                               maxval=bound)
        b = jax.random.uniform(kb, (dims[li + 1],), minval=-bound,
                               maxval=bound)
        if barf_c2f is not None and li == 0:
            s = math.sqrt(input_dim / 2.0)
            w, b = w * s, b * s
        params.append({"w": w, "b": b})
    return params


def mlp_image_forward(params, coords, L_2D: int, skip=(), barf_c2f=None,
                      progress=1.0):
    """coords [B,N,2] -> rgb [B,N,3] with BARF c2f PE masking
    (planar.py:305-337)."""
    freq = 2.0 ** jnp.arange(L_2D) * np.pi
    spectrum = coords[..., None] * freq                       # [B,N,2,L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], -2)  # [B,N,2,2,L]
    enc = enc.reshape(coords.shape[:-1] + (4 * L_2D,))
    if barf_c2f is not None:
        start, end = barf_c2f
        alpha = (progress - start) / (end - start) * L_2D
        k = jnp.arange(L_2D, dtype=jnp.float32)
        weight = (1 - jnp.cos(jnp.clip(alpha - k, 0, 1) * np.pi)) / 2
        shape = enc.shape
        enc = (enc.reshape(-1, L_2D) * weight).reshape(shape)
    feat = jnp.concatenate([coords, enc], axis=-1)
    inp = feat
    for li, layer in enumerate(params):
        if li in skip:
            feat = jnp.concatenate([feat, inp], axis=-1)
        feat = feat @ layer["w"] + layer["b"]
        if li != len(params) - 1:
            feat = jax.nn.relu(feat)
    return jax.nn.sigmoid(feat)
