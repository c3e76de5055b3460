from . import renderer, tpose_renderer, volume_renderer  # noqa: F401  (registers plugins)
from .renderer import RenderSettings, render_rays, render_density_grid

__all__ = ["RenderSettings", "render_rays", "render_density_grid"]
