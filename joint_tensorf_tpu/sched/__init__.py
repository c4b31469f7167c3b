from .schedules import (  # noqa: F401
    interp_schedule,
    voxel_schedule,
    find_resolution,
    find_n_samples,
    lr_decay_factor,
)
