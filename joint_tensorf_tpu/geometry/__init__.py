from . import lie, poses, rays, ndc, align, warp2d  # noqa: F401
