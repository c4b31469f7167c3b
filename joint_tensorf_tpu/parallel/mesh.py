"""Device-mesh construction for multi-chip / multi-host runs.

The natural parallel axes of this workload (SURVEY.md §5.7-5.8):
  * ``rays`` — data parallelism over the ray batch.  Factor-grid and pose
    gradients are sums over rays, so XLA's SPMD partitioner turns the grad
    reduction into one psum over ICI per step.
  * ``comp`` — tensor parallelism over the VM component (R) axis: density is
    a sum over components and appearance concatenates components before one
    basis matmul, so component-sharded factors produce partial sums reduced
    with one psum (SURVEY.md §5.7).

Pose parameters ([N_views, 6]) are tiny and stay replicated; their per-shard
gradient contributions are psum-reduced automatically — the Schur-style
JTJ/JTr block reduction of the north star degenerates to this first-order
psum in the reference's optimizer (plain Adam on J^T r).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape=None, axes=("rays",), devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    shape=None uses all devices on the first axis.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    need = int(np.prod(shape))
    if len(devices) < need:
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {need} devices but only "
            f"{len(devices)} are visible. For CPU validation set "
            f"JAX_PLATFORMS=cpu JTF_NUM_CPU_DEVICES={need} (or "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={need}); "
            f"on hardware unset tpu.mesh_shape or match the chip count.")
    arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, axes)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (jax.distributed).  No-op when single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
