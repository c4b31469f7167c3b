"""joint_tensorf_tpu — a TPU-native (JAX/XLA/Pallas) joint pose + tensorial
radiance field framework.

Re-designed from scratch with the capabilities of Joint-TensoRF
("Improving Robustness for Joint Optimization of Camera Poses and Decomposed
Low-Rank Tensorial Radiance Fields", AAAI 2024) — see SURVEY.md for the
component inventory this framework covers.

Design principles (TPU-first, not a port):
  * all hot-path compute is pure-functional jax under ``jit`` with static
    shapes per training *phase* (voxel-upsample / bbox-shrink boundaries);
  * separable Gaussian filtering and align-corners resampling are expressed
    as banded-matrix matmuls so they run on the MXU;
  * sample culling uses dense masks (``where``), never boolean gathers;
  * multi-chip scaling via ``jax.sharding.Mesh`` + ``pjit`` (rays sharded,
    factor grids replicated, pose gradients psum-reduced by SPMD);
  * randomized coarse-to-fine schedules are driven by a host-side seeded
    generator so they are bitwise identical across hosts.
"""

__version__ = "0.1.0"
