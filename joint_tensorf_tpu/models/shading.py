"""Shading heads: appearance features (+ viewdirs) -> RGB.

Functional pytree re-designs of the reference's renderModule zoo
(tensorBase.py:68-370).  Each head is (init_fn, apply_fn) over a plain dict
of arrays; apply signatures are
    apply(params, pts, viewdirs, features, view_pe_progress, fea_pe_progress)
returning rgb [N,3] (heads that also predict density return (rgb, sigma_fea)).

Heads provided (reference name -> here):
  MLPRender_Fea            -> "MLP_Fea"        (Blender default)
  MLPRender_Fea4           -> "MLP_Fea4"
  MLPRender_Fea_WeakView   -> "MLP_Fea_WeakView" (LLFF default)
  MLPRender_Fea_WeakView_Density -> "MLP_Fea_WeakView_Density"
  MLPRender_PE             -> "MLP_PE"
  MLPRender                -> "MLP"
  MLP_Albedo               -> "MLP_Albedo"
  GaRF_Render              -> "GaRF"
  SHRender                 -> "SH"
  RGBRender                -> "RGB"

The MLPs run over [N, C] batches — on TPU these are MXU matmuls; all masking
is applied by the renderer afterwards (dense compute, no boolean gathers).
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sh import eval_sh_bases


def positional_encoding(positions, freqs: int, progress=1.0):
    """Frequency encoding with linear coarse-to-fine annealing.

    Reference tensorBase.py:43-55: mask_l = clip(progress*F - l, 0, 1);
    output layout [..., D*2F] = concat(sin, cos) over (D, F).
    """
    levels = jnp.arange(freqs, dtype=positions.dtype)
    freq_bands = 2.0**levels
    mask = jnp.clip(progress * freqs - levels, 0.0, 1.0)
    pts = positions[..., None] * freq_bands          # [..., D, F]
    enc = jnp.concatenate([jnp.sin(pts) * mask, jnp.cos(pts) * mask], axis=-1)
    return enc.reshape(positions.shape[:-1] + (freqs * 2 * positions.shape[-1],))


def _linear_init(key, fan_in: int, fan_out: int, bias: bool = True,
                 zero_bias: bool = False):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    p = {"w": jax.random.uniform(k_w, (fan_in, fan_out), minval=-bound, maxval=bound)}
    if bias:
        if zero_bias:
            p["b"] = jnp.zeros((fan_out,))
        else:
            p["b"] = jax.random.uniform(k_b, (fan_out,), minval=-bound, maxval=bound)
    return p


def _linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


class ShadingHead(NamedTuple):
    init: Callable
    apply: Callable
    predicts_density: bool = False


# ------------------------------------------------------------------ MLP_Fea
def make_mlp_fea(app_dim: int, view_pe: int = 6, fea_pe: int = 6,
                 hidden: int = 128, n_layers: int = 3) -> ShadingHead:
    """MLPRender_Fea (tensorBase.py:101-126); n_layers=4 gives MLP_Fea4."""
    in_dim = 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim

    def init(key):
        keys = jax.random.split(key, n_layers)
        dims = [in_dim] + [hidden] * (n_layers - 1) + [3]
        layers = []
        for i in range(n_layers):
            layers.append(
                _linear_init(keys[i], dims[i], dims[i + 1],
                             zero_bias=(i == n_layers - 1))
            )
        return {"layers": layers}

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = [features, viewdirs]
        if fea_pe > 0:
            indata.append(positional_encoding(features, fea_pe, fea_pe_progress))
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe, view_pe_progress))
        x = jnp.concatenate(indata, axis=-1)
        for i, layer in enumerate(params["layers"]):
            x = _linear(layer, x)
            if i + 1 < len(params["layers"]):
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x)

    return ShadingHead(init, apply)


# ------------------------------------------------------- MLP_Fea_WeakView
def make_mlp_fea_weakview(app_dim: int, view_pe: int = 6, fea_pe: int = 6,
                          hidden: int = 128,
                          predict_density: bool = False) -> ShadingHead:
    """View PE injected only at the last layer (tensorBase.py:180-214).

    predict_density=True gives MLP_Fea_WeakView_Density (tensorBase.py:271-309):
    layer2 emits hidden+1 features, the extra one is the density feature.
    """
    in_dim = (2 * fea_pe + 1) * app_dim
    mid_dim = 2 * view_pe * 3

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "layer1": _linear_init(k1, in_dim, hidden),
            "layer2": _linear_init(k2, hidden, hidden + (1 if predict_density else 0)),
            "layer3": _linear_init(k3, hidden + mid_dim, 3, zero_bias=True),
        }

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = [features]
        if fea_pe > 0:
            indata.append(positional_encoding(features, fea_pe, fea_pe_progress))
        x = jnp.concatenate(indata, axis=-1)
        x = jax.nn.relu(_linear(params["layer1"], x))
        x = _linear(params["layer2"], x)
        if predict_density:
            sigma_fea, x = x[..., -1], x[..., :-1]
        x = jax.nn.relu(x)
        middata = []
        if view_pe > 0:
            middata.append(positional_encoding(viewdirs, view_pe, view_pe_progress))
        middata.append(x)
        rgb = jax.nn.sigmoid(_linear(params["layer3"], jnp.concatenate(middata, -1)))
        if predict_density:
            return rgb, sigma_fea
        return rgb

    return ShadingHead(init, apply, predicts_density=predict_density)


# ------------------------------------------------------------------ MLP_PE
def make_mlp_pe(app_dim: int, view_pe: int = 6, pos_pe: int = 6,
                hidden: int = 128) -> ShadingHead:
    """MLPRender_PE (tensorBase.py:316-346)."""
    in_dim = (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "layer1": _linear_init(k1, in_dim, hidden),
            "layer2": _linear_init(k2, hidden, hidden),
            "layer3": _linear_init(k3, hidden, 3, zero_bias=True),
        }

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = [features, viewdirs, pts]
        if pos_pe > 0:
            indata.append(positional_encoding(pts, pos_pe))
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe))
        x = jnp.concatenate(indata, axis=-1)
        x = jax.nn.relu(_linear(params["layer1"], x))
        x = jax.nn.relu(_linear(params["layer2"], x))
        return jax.nn.sigmoid(_linear(params["layer3"], x))

    return ShadingHead(init, apply)


# --------------------------------------------------------------------- MLP
def make_mlp(app_dim: int, view_pe: int = 6, hidden: int = 128) -> ShadingHead:
    """MLPRender (tensorBase.py:348-370)."""
    in_dim = (3 + 2 * view_pe * 3) + app_dim

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "layer1": _linear_init(k1, in_dim, hidden),
            "layer2": _linear_init(k2, hidden, hidden),
            "layer3": _linear_init(k3, hidden, 3, zero_bias=True),
        }

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = [features, viewdirs]
        if view_pe > 0:
            indata.append(positional_encoding(viewdirs, view_pe))
        x = jnp.concatenate(indata, axis=-1)
        x = jax.nn.relu(_linear(params["layer1"], x))
        x = jax.nn.relu(_linear(params["layer2"], x))
        return jax.nn.sigmoid(_linear(params["layer3"], x))

    return ShadingHead(init, apply)


# -------------------------------------------------------------- MLP_Albedo
def make_mlp_albedo(app_dim: int, fea_pe: int = 6, hidden: int = 128) -> ShadingHead:
    """MLP_Albedo — no view dependence (tensorBase.py:156-178)."""
    in_dim = 2 * fea_pe * app_dim + app_dim

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "layer1": _linear_init(k1, in_dim, hidden),
            "layer2": _linear_init(k2, hidden, hidden),
            "layer3": _linear_init(k3, hidden, 3, zero_bias=True),
        }

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = [features]
        if fea_pe > 0:
            indata.append(positional_encoding(features, fea_pe))
        x = jnp.concatenate(indata, axis=-1)
        x = jax.nn.relu(_linear(params["layer1"], x))
        x = jax.nn.relu(_linear(params["layer2"], x))
        return jax.nn.sigmoid(_linear(params["layer3"], x))

    return ShadingHead(init, apply)


# -------------------------------------------------------------------- GaRF
def make_garf(app_dim: int, hidden: int = 128, sigma: float = 0.1,
              init_range: float = 0.1) -> ShadingHead:
    """Gaussian-activated head (tensorBase.py:217-269)."""

    def init(key):
        ks = jax.random.split(key, 5)

        def uniform(k, fan_in, fan_out):
            p = _linear_init(k, fan_in, fan_out)
            p["w"] = jax.random.uniform(k, (fan_in, fan_out),
                                        minval=-init_range, maxval=init_range)
            return p

        return {
            "fea_gauss": uniform(ks[0], app_dim, hidden),
            "view_gauss": uniform(ks[1], 3, hidden),
            "layer1": uniform(ks[2], hidden, hidden),
            "layer2": uniform(ks[3], 2 * hidden, hidden),
            "layer3": uniform(ks[4], hidden, 3),
        }

    def gauss_centered(x):
        mu = x.mean(axis=-1, keepdims=True)
        return jnp.exp(-0.5 * (x - mu) ** 2 / sigma**2)

    def gauss(x):
        return jnp.exp(-0.5 * x**2 / sigma**2)

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        indata = gauss_centered(_linear(params["fea_gauss"], features))
        view = gauss_centered(_linear(params["view_gauss"], viewdirs))
        x = gauss(_linear(params["layer1"], indata))
        x = jnp.concatenate([view, x], axis=-1)
        x = gauss(_linear(params["layer2"], x))
        return jax.nn.sigmoid(_linear(params["layer3"], x))

    return ShadingHead(init, apply)


# ---------------------------------------------------------------- SH / RGB
def make_sh(app_dim: int = 27, deg: int = 2) -> ShadingHead:
    """SHRender (tensorBase.py:68-72): features are SH coefficients."""

    def init(key):
        return {}

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        sh_mult = eval_sh_bases(deg, viewdirs)[:, None]    # [N,1,B]
        rgb_sh = features.reshape(-1, 3, sh_mult.shape[-1])
        return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)

    return ShadingHead(init, apply)


def make_rgb(app_dim: int = 3) -> ShadingHead:
    """RGBRender (tensorBase.py:75-78): features are the color."""

    def init(key):
        return {}

    def apply(params, pts, viewdirs, features, view_pe_progress=1.0,
              fea_pe_progress=1.0):
        return features

    return ShadingHead(init, apply)


def make_shading_head(name: str, app_dim: int, view_pe: int, pos_pe: int,
                      fea_pe: int, hidden: int) -> ShadingHead:
    """Dispatch by the reference's shadingMode names (tensorBase.py:450-473)."""
    if name == "MLP_Fea":
        return make_mlp_fea(app_dim, view_pe, fea_pe, hidden)
    if name == "MLP_Fea4":
        return make_mlp_fea(app_dim, view_pe, fea_pe, hidden, n_layers=4)
    if name == "MLP_Fea_WeakView":
        return make_mlp_fea_weakview(app_dim, view_pe, fea_pe, hidden)
    if name == "MLP_Fea_WeakView_Density":
        return make_mlp_fea_weakview(app_dim, view_pe, fea_pe, hidden,
                                     predict_density=True)
    if name == "MLP_PE":
        return make_mlp_pe(app_dim, view_pe, pos_pe, hidden)
    if name == "MLP":
        return make_mlp(app_dim, view_pe, hidden)
    if name == "MLP_Albedo":
        return make_mlp_albedo(app_dim, fea_pe, hidden)
    if name == "GaRF":
        return make_garf(app_dim, hidden)
    if name == "SH":
        return make_sh(app_dim)
    if name == "RGB":
        assert app_dim == 3
        return make_rgb(app_dim)
    raise ValueError(f"Unrecognized shading head {name!r}")
