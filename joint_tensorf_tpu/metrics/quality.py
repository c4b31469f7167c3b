"""Image quality metrics: PSNR, SSIM (jnp), optional LPIPS.

SSIM matches the pohsun_ssim/pytorch-ssim semantics the reference evaluates
with (nerf.py:550): 11x11 Gaussian window, sigma=1.5, per-channel, averaged;
C1=(0.01)^2, C2=(0.03)^2 on [0,1] images.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def _filter2d(img, window):
    """img: [C,H,W]; valid-mode 2D correlation with an 11x11 window,
    padded like conv2d(padding=window//2) (pytorch-ssim semantics)."""
    k = window.shape[0]
    pad = k // 2
    padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)))
    H, W = img.shape[-2:]
    out = jnp.zeros_like(img)
    for dy in range(k):
        for dx in range(k):
            out = out + window[dy, dx] * padded[:, dy:dy + H, dx:dx + W]
    return out


def ssim(pred, target, window_size: int = 11):
    """pred/target: [C,H,W] or [H,W,C] in [0,1] -> scalar mean SSIM."""
    if pred.ndim == 3 and pred.shape[-1] in (1, 3):
        pred = jnp.moveaxis(pred, -1, 0)
        target = jnp.moveaxis(target, -1, 0)
    window = _gaussian_window(window_size)
    mu1 = _filter2d(pred, window)
    mu2 = _filter2d(target, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(pred * pred, window) - mu1_sq
    sigma2_sq = _filter2d(target * target, window) - mu2_sq
    sigma12 = _filter2d(pred * target, window) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def lpips_fn():
    """Optional LPIPS(AlexNet) via torch-cpu if the lpips package and its
    weights are available; returns None otherwise (the metric is then
    reported as null, matching the 'optional torch-free port or skip with
    flag' plan in SURVEY.md §7)."""
    try:
        import lpips  # type: ignore
        import torch

        net = lpips.LPIPS(net="alex")

        def compute(pred, target):
            """pred/target: [H,W,3] numpy in [0,1]."""
            p = torch.tensor(np.asarray(pred)).permute(2, 0, 1)[None] * 2 - 1
            t = torch.tensor(np.asarray(target)).permute(2, 0, 1)[None] * 2 - 1
            with torch.no_grad():
                return float(net(p.float(), t.float()))

        return compute
    except Exception as e:
        # loud, not silent: quant files will carry no lpips rows and the
        # summary must say why (VERDICT round-1 "weak" #6)
        import sys
        print(f"[metrics] LPIPS UNAVAILABLE ({type(e).__name__}: {e}) — "
              "lpips will be omitted from quant outputs", file=sys.stderr)
        return None
