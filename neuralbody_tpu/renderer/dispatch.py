"""Render-function dispatch keyed on the static settings type.

The reference swaps renderers per experiment via file-path plugins
(ref: lib/networks/renderer/make_renderer.py:5-9). Here the renderer
*factory* registry (config-driven) produces a hashable Settings value, and
the matching pure render function is recovered from its type — so the
jitted harness steps stay family-generic: the dispatch happens at trace
time on a static argument, never inside compiled code.
"""
from __future__ import annotations


def get_render_fn(settings):
    """Map a static Settings value to its pure render function.

    All render functions share the signature
    ``render(params, batch, settings, key=None, train=False) ->
    (ret, new_bn_stats)``.
    """
    from .renderer import RenderSettings, render_rays
    from .tpose_renderer import TposeRenderSettings, render_tpose_rays
    from .volume_renderer import NerfRenderSettings, render_nerf_rays

    if isinstance(settings, NerfRenderSettings):
        return render_nerf_rays
    if isinstance(settings, TposeRenderSettings):
        return render_tpose_rays
    if isinstance(settings, RenderSettings):
        return render_rays
    raise TypeError(
        f"no render function for settings type {type(settings).__name__}")


def get_density_grid_fn(settings):
    """Map Settings to the dense-grid density evaluator used by mesh
    extraction: latent_xyzc's multi-scale-volume decode or the NeRF
    baseline's density-only trunk (ref: if_mesh_renderer.py:26-39 vs
    volume_mesh_renderer.py:84-107)."""
    from .renderer import RenderSettings, render_density_grid
    from .volume_renderer import NerfRenderSettings, render_nerf_density_grid

    if isinstance(settings, NerfRenderSettings):
        return render_nerf_density_grid
    if isinstance(settings, RenderSettings):
        return render_density_grid
    raise TypeError(
        f"no density-grid function for {type(settings).__name__}")
