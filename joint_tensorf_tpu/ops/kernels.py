"""1D blur-kernel generators for the coarse-to-fine schedules.

Semantics follow reference model/kernels.py:
  * ``gaussian_kernel``: sampled Gaussian with sigma clamped at 1e-4 and the
    kernel values clamped at 1.0, so t -> 0 degenerates to a discrete impulse
    (kernels.py:16-22).  Differentiable w.r.t. t (not used for learning in the
    main path, but traced under jit so the schedule value is a runtime input
    and does not trigger recompilation).
  * ``average_kernel``: linearly-interpolated box kernel (kernels.py:24-41).

Note on sizes: a requested ``kernel_size`` of K yields K//2*2+1 taps
(arange(-(K//2), K//2+1)), matching the reference (65 taps for K=64,
201 taps for K=201).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def num_taps(kernel_size: int) -> int:
    return (kernel_size // 2) * 2 + 1


def gaussian_kernel(t, kernel_size: int):
    """[num_taps] sampled Gaussian; impulse at t=0.  ``t`` may be traced."""
    t = jnp.clip(jnp.asarray(t, dtype=jnp.float32), min=1e-4)
    ns = jnp.arange(-(kernel_size // 2), kernel_size // 2 + 1, dtype=jnp.float32)
    exponent = -0.5 * (ns / t) ** 2
    kernel = 1.0 / (t * math.sqrt(2 * math.pi)) * jnp.exp(exponent)
    return jnp.clip(kernel, max=1.0)


def average_kernel(t, kernel_size: int):
    """[num_taps] interpolated box kernel; impulse at t=0.  ``t`` traced OK."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    half = kernel_size // 2
    t = jnp.asarray(t, dtype=jnp.float32)
    ns = jnp.abs(jnp.arange(-half, half + 1, dtype=jnp.float32))
    t0 = jnp.minimum(jnp.floor(t), half)
    t1 = jnp.minimum(jnp.ceil(t), half)
    k0 = (ns <= t0) / (t0 * 2 + 1)
    k1 = (ns <= t1) / (t1 * 2 + 1)
    frac = jnp.mod(t, 1.0)
    return frac * k1 + (1 - frac) * k0


def batch_gaussian_kernel(sigmas, kernel_size: int):
    """Per-component kernels: sigmas [C] -> [C, num_taps] (kernels.py:59-75)."""
    sig = jnp.clip(jnp.asarray(sigmas, dtype=jnp.float32), min=1e-4)[:, None]
    ns = jnp.arange(-(kernel_size // 2), kernel_size // 2 + 1, dtype=jnp.float32)[None, :]
    kernel = 1.0 / (sig * math.sqrt(2 * math.pi)) * jnp.exp(-0.5 * (ns / sig) ** 2)
    return jnp.clip(kernel, max=1.0)


def discrete_gaussian_kernel(t, kernel_size: int):
    """Exact discrete Gaussian T(n, t) = exp(-t) I_n(t) (kernels.py:6-14).

    I_n is the modified Bessel function of integer order; host-side numpy
    (like the reference's @no_grad numpy implementation — unused in the
    main training path, provided for parity).  Impulse at t=0.

    Like the reference (kernels.py:11) this requires an odd kernel_size —
    an even one would silently return kernel_size+1 taps.  Uses the
    exponentially-scaled Bessel ive(n, t) = exp(-|t|) iv(n, t) so large t
    does not overflow to inf*0 = nan.
    """
    assert kernel_size > 0 and kernel_size % 2 == 1, \
        f"discrete_gaussian_kernel needs odd kernel_size, got {kernel_size}"
    import numpy as np
    from scipy import special

    ns = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    return jnp.asarray(special.ive(ns, t), dtype=jnp.float32)
