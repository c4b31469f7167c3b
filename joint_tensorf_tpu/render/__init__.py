from .renderer import RenderConfig, BlurSpec, render_rays  # noqa: F401
