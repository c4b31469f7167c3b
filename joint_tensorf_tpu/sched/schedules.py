"""Coarse-to-fine training schedules (pure functions of the step counter).

All schedule evaluation happens host-side so the randomized draws can come
from one seeded generator and stay bitwise identical across hosts
(SURVEY.md §5.8); the resulting scalars are fed into jitted step functions
as runtime inputs.
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def interp_schedule(x: float, schedule: Sequence[float],
                    left: float = 0.0, right: float = 1.0) -> float:
    """Piecewise-linear interpolation over evenly spaced control points.

    Reference util.py:217-225.
    """
    assert left <= x <= right, (x, left, right)
    xs = np.linspace(left, right, len(schedule))
    return float(np.interp(x, xs, schedule))


def voxel_schedule(n_voxel_init: int, n_voxel_final: int, n_upsamples: int):
    """Voxel counts per upsample step, log-linear (reference tensorf.py:304)."""
    counts = np.round(
        np.exp(np.linspace(math.log(n_voxel_init), math.log(n_voxel_final),
                           n_upsamples + 1))
    ).astype(np.int64)
    return counts.tolist()[1:]


def find_resolution(bbox, n_voxels: int, scale=(1.0, 1.0, 1.0)):
    """Per-axis grid resolution for a voxel budget (reference tensorf.py:449-456)."""
    bbox = np.asarray(bbox, dtype=np.float64).reshape(2, 3)
    extent = bbox[1] - bbox[0]
    voxel_size = (extent.prod() / n_voxels) ** (1.0 / 3.0)
    # small epsilon so an exact-cube budget yields the exact resolution
    # instead of truncating 127.999... -> 127
    res = (extent / voxel_size * np.asarray(scale) + 1e-6).astype(np.int64)
    return [int(r) for r in res]


def find_n_samples(resolution, step_ratio: float, sample_intvs: int) -> int:
    """Samples per ray from grid resolution (reference tensorf.py:458-461)."""
    auto = int(np.linalg.norm(np.asarray(resolution, dtype=np.float64)) / step_ratio)
    return min(int(sample_intvs), auto)


def lr_decay_factor(decay_target_ratio: float, decay_iters: int) -> float:
    """Per-iteration multiplicative lr decay (reference tensorf.py:287)."""
    return decay_target_ratio ** (1.0 / decay_iters)


def step_size(bbox, resolution, step_ratio: float) -> float:
    """Ray-march step length (reference tensorBase.py:477-487)."""
    bbox = np.asarray(bbox, dtype=np.float64).reshape(2, 3)
    units = (bbox[1] - bbox[0]) / (np.asarray(resolution, dtype=np.float64) - 1)
    return float(units.mean() * step_ratio)


def n_samples_from_aabb(bbox, resolution, step_ratio: float) -> int:
    """Diagonal / step + 1 (reference tensorBase.py:485-486)."""
    bbox = np.asarray(bbox, dtype=np.float64).reshape(2, 3)
    diag = float(np.linalg.norm(bbox[1] - bbox[0]))
    return int(diag / step_size(bbox, resolution, step_ratio)) + 1
