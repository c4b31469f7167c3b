"""Coordinate-MLP NeRF with BARF's coarse-to-fine positional encoding.

Functional re-design of the reference's nerf.NeRF module (nerf.py:775-886)
and barf.NeRF's c2f PE masking (barf.py:280-292):

  * 8-layer feature MLP with a skip connection, density emitted from the
    last feature layer's first channel; 2-layer RGB head conditioned on the
    view direction encoding;
  * TensorFlow-style Xavier init (tf_init, nerf.py:807-817);
  * BARF c2f: per-frequency-band cosine-smooth weights driven by progress;
  * NeRF quadrature compositing with the 1e10 last interval and
    T = exp(-cumsum(sigma*delta)) formulation (nerf.py:861-877).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NerfMLPConfig:
    layers_feat: tuple = (256, 256, 256, 256, 256, 256, 256, 256)
    layers_rgb: tuple = (128, 3)
    skip: tuple = (4,)
    L_3D: int = 10
    L_view: int = 4
    posenc: bool = True
    view_dep: bool = True
    density_activ: str = "softplus"   # relu / softplus / abs / sigmoid / exp
    tf_init: bool = True
    barf_c2f: tuple | None = None     # (start, end) progress range or None

    @property
    def input_3d_dim(self):
        return 3 + 6 * self.L_3D if self.posenc else 3

    @property
    def input_view_dim(self):
        return 3 + 6 * self.L_view if self.posenc else 3


def _xavier_uniform(key, shape, gain=1.0):
    fan_in, fan_out = shape
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a)


def _init_linear(key, k_in, k_out, cfg: NerfMLPConfig, out=None):
    """tf_init semantics (nerf.py:807-817): Xavier, relu gain sqrt(2) except
    output layers; density channel (out='first') gets gain 1."""
    relu_gain = math.sqrt(2.0)
    if not cfg.tf_init:
        bound = 1.0 / math.sqrt(k_in)
        kw, kb = jax.random.split(key)
        return {"w": jax.random.uniform(kw, (k_in, k_out), minval=-bound,
                                        maxval=bound),
                "b": jax.random.uniform(kb, (k_out,), minval=-bound,
                                        maxval=bound)}
    if out == "all":
        w = _xavier_uniform(key, (k_in, k_out))
    elif out == "first":
        k1, k2 = jax.random.split(key)
        w_first = _xavier_uniform(k1, (k_in, 1))
        w_rest = _xavier_uniform(k2, (k_in, k_out - 1), gain=relu_gain)
        w = jnp.concatenate([w_first, w_rest], axis=1)
    else:
        w = _xavier_uniform(key, (k_in, k_out), gain=relu_gain)
    return {"w": w, "b": jnp.zeros((k_out,))}


def init_nerf_mlp(key, cfg: NerfMLPConfig):
    params = {"feat": [], "rgb": []}
    dims = [cfg.input_3d_dim] + list(cfg.layers_feat)
    keys = jax.random.split(key, len(dims) + len(cfg.layers_rgb) + 2)
    ki = 0
    for li in range(len(dims) - 1):
        k_in, k_out = dims[li], dims[li + 1]
        if li in cfg.skip:
            k_in += cfg.input_3d_dim
        if li == len(dims) - 2:
            k_out += 1  # density channel
        params["feat"].append(_init_linear(
            keys[ki], k_in, k_out, cfg,
            out="first" if li == len(dims) - 2 else None))
        ki += 1
    feat_dim = cfg.layers_feat[-1]
    rdims = [feat_dim + (cfg.input_view_dim if cfg.view_dep else 0)] + \
        list(cfg.layers_rgb)
    for li in range(len(rdims) - 1):
        params["rgb"].append(_init_linear(
            keys[ki], rdims[li], rdims[li + 1], cfg,
            out="all" if li == len(rdims) - 2 else None))
        ki += 1
    return params


def positional_encoding(cfg: NerfMLPConfig, x, L: int, progress=1.0):
    """[..., D] -> [..., 2*D*L] with optional BARF c2f masking."""
    freq = 2.0 ** jnp.arange(L) * np.pi
    spectrum = x[..., None] * freq                       # [..., D, L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)
    enc = enc.reshape(x.shape[:-1] + (2 * x.shape[-1] * L,))
    if cfg.barf_c2f is not None:
        start, end = cfg.barf_c2f
        alpha = (progress - start) / (end - start) * L
        k = jnp.arange(L, dtype=jnp.float32)
        weight = (1 - jnp.cos(jnp.clip(alpha - k, 0, 1) * np.pi)) / 2
        shape = enc.shape
        enc = (enc.reshape(-1, L) * weight).reshape(shape)
    return enc


def apply_nerf_mlp(params, cfg: NerfMLPConfig, points_3d, ray_unit=None,
                   progress=1.0, density_noise=0.0, rng=None):
    """points_3d: [..., 3]; ray_unit: [..., 3] -> (rgb [..., 3], density [...])."""
    if cfg.posenc:
        enc = positional_encoding(cfg, points_3d, cfg.L_3D, progress)
        points_enc = jnp.concatenate([points_3d, enc], axis=-1)
    else:
        points_enc = points_3d
    feat = points_enc
    n_layers = len(params["feat"])
    density = None
    for li, layer in enumerate(params["feat"]):
        if li in cfg.skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1)
        feat = feat @ layer["w"] + layer["b"]
        if li == n_layers - 1:
            density = feat[..., 0]
            if density_noise and rng is not None:
                density = density + jax.random.normal(
                    rng, density.shape) * density_noise
            if cfg.density_activ == "softplus":
                density = jax.nn.softplus(density)
            elif cfg.density_activ == "relu":
                density = jax.nn.relu(density)
            elif cfg.density_activ == "abs":
                density = jnp.abs(density)
            elif cfg.density_activ == "sigmoid":
                density = jax.nn.sigmoid(density)
            elif cfg.density_activ == "exp":
                density = jnp.exp(density)
            feat = feat[..., 1:]
        feat = jax.nn.relu(feat)
    if cfg.view_dep:
        assert ray_unit is not None
        if cfg.posenc:
            ray_enc = positional_encoding(cfg, ray_unit, cfg.L_view, progress)
            ray_enc = jnp.concatenate([ray_unit, ray_enc], axis=-1)
        else:
            ray_enc = ray_unit
        feat = jnp.concatenate([feat, ray_enc], axis=-1)
    for li, layer in enumerate(params["rgb"]):
        feat = feat @ layer["w"] + layer["b"]
        if li != len(params["rgb"]) - 1:
            feat = jax.nn.relu(feat)
    rgb = jax.nn.sigmoid(feat)
    return rgb, density


def sample_depth(rng, n_rays: int, n_samples: int, depth_range,
                 stratified: bool, param: str = "metric"):
    """[N, S] depth samples (nerf.py:742-752): per-sample stratified."""
    dmin, dmax = depth_range[0], depth_range[1]
    if stratified:
        rand = jax.random.uniform(rng, (n_rays, n_samples))
    else:
        rand = 0.5
    steps = (rand + jnp.arange(n_samples)[None, :]) / n_samples
    depth = steps * (dmax - dmin) + dmin
    if param == "inverse":
        depth = 1.0 / (depth + 1e-8)
    return depth


def sample_depth_from_pdf(rng, pdf, depth_range, n_samples_fine: int):
    """Hierarchical inverse-CDF sampling (nerf.py:754-773).

    pdf: [N, S] sample weights -> [N, Sf] fine depths.
    """
    dmin, dmax = depth_range[0], depth_range[1]
    S = pdf.shape[-1]
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    grid = jnp.linspace(0, 1, n_samples_fine + 1)
    unif = 0.5 * (grid[:-1] + grid[1:])
    unif = jnp.broadcast_to(unif, cdf.shape[:-1] + (n_samples_fine,))
    idx = jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"))(cdf, unif)
    depth_bin = jnp.linspace(dmin, dmax, S + 1)
    low = jnp.clip(idx - 1, 0, S)
    high = jnp.clip(idx, 0, S)
    depth_low = depth_bin[low]
    depth_high = depth_bin[high]
    cdf_low = jnp.take_along_axis(cdf, low, axis=-1)
    cdf_high = jnp.take_along_axis(cdf, high, axis=-1)
    t = (unif - cdf_low) / (cdf_high - cdf_low + 1e-8)
    return depth_low + t * (depth_high - depth_low)


def composite(cfg: NerfMLPConfig, ray, rgb_samples, density_samples,
              depth_samples, setbg_opaque: bool, bgcolor: float = 1.0):
    """NeRF quadrature (nerf.py:861-877).

    ray: [N,3]; rgb: [N,S,3]; density/depth: [N,S].
    Returns (rgb [N,3], depth [N], opacity [N], prob [N,S]).
    """
    ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)      # [N,1]
    intv = depth_samples[..., 1:] - depth_samples[..., :-1]
    intv = jnp.concatenate([intv, jnp.full_like(intv[..., :1], 1e10)], -1)
    dist = intv * ray_length
    sigma_delta = density_samples * dist
    alpha = 1 - jnp.exp(-sigma_delta)
    T = jnp.exp(-jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(sigma_delta[..., :1]),
                         sigma_delta[..., :-1]], -1), axis=-1))
    prob = T * alpha                                               # [N,S]
    depth = jnp.sum(depth_samples * prob, axis=-1)
    rgb = jnp.sum(rgb_samples * prob[..., None], axis=-2)
    opacity = jnp.sum(prob, axis=-1)
    if setbg_opaque:
        rgb = rgb + bgcolor * (1 - opacity[..., None])
    return rgb, depth, opacity, prob
