"""Test configuration: force CPU with 8 virtual devices (set BEFORE jax import).

Multi-chip sharding tests run on this virtual mesh; real-TPU behavior is
exercised by bench.py / the driver's dryrun.
"""
import os

import jax

# NOTE: the axon TPU plugin in this image force-registers itself and ignores
# the JAX_PLATFORMS env var, so the platform must be pinned programmatically
# before first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# On this 4-core host every fresh XLA compile costs tens of seconds of
# wall-clock; the persistent cache makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
