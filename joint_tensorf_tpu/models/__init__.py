from . import shading, vm, alpha_mask  # noqa: F401
