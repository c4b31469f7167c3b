from . import poses_plot, novel_views, video  # noqa: F401
