"""Process-level JAX configuration: persistent compile cache, precision."""
from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None):
    global _DONE
    if _DONE:
        return
    import jax

    cache = cache_dir or os.environ.get(
        "JTF_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    # TPU matmuls default to bf16 inputs; the 3x3 pose compositions and ray
    # transforms then quantize ray directions by ~1e-3 (RR^T - I ~ 4e-3),
    # which silently corrupts joint pose optimization.  Keep matmuls f32 —
    # the compute-bound ops here are gathers/scatters, not matmuls.
    jax.config.update("jax_default_matmul_precision", "highest")
    # Some PJRT plugins (the axon TPU tunnel in this image) force-register
    # and ignore the JAX_PLATFORMS env var; re-assert the user's choice.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass
        if env_platforms == "cpu":
            n = os.environ.get("JTF_NUM_CPU_DEVICES")
            if n:
                jax.config.update("jax_num_cpu_devices", int(n))
    _DONE = True
