from . import renderer2d
from .renderer import (Rendering, render_gaussians, render_projected,
                       render_with_heuristics, compute_depth_variance,
                       viewspace_gradient)

__all__ = [
    "renderer2d",
    "Rendering",
    "render_gaussians",
    "render_projected",
    "render_with_heuristics",
    "compute_depth_variance",
    "viewspace_gradient",
]
