"""taichi_gaussian_rasterizer_tpu — TPU-native differentiable gaussian splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
uc-vision/taichi_gaussian_rasterizer (taichi-splatting): a render pipeline
decomposed into separately-callable differentiable ops — EWA perspective
projection, spherical-harmonics shading, tile mapping, and tile-sorted
front-to-back alpha-blend rasterization — plus optimizers and training
utilities. See SURVEY.md for the structural map of the reference.
"""

__version__ = "0.1.0"

from .config import RasterConfig
from .data_types import Gaussians3D, Gaussians2D, check_packed3d, check_packed2d
from .ops import (CameraParams, project_to_image, project_points,
                  evaluate_sh_at)
from .ops.mapper import (TileMapping, map_to_tiles, pad_to_tile,
                         probe_emit_tails)
from .ops.raster import (RasterOut, probe_reduce_capacity,
                         probe_visit_chunks, rasterize, truncate_mapping, TruncationGuard,
                         rasterize_with_tiles)
from .models import (Rendering, render_gaussians, render_projected,
                     render_with_heuristics, viewspace_gradient)
from .utils import runtime  # the reference's TaichiQueue role (init/debug)

__all__ = [
    "RasterConfig",
    "Gaussians3D",
    "Gaussians2D",
    "check_packed3d",
    "check_packed2d",
    "CameraParams",
    "project_to_image",
    "project_points",
    "evaluate_sh_at",
    "TileMapping",
    "map_to_tiles",
    "probe_emit_tails",
    "pad_to_tile",
    "runtime",
    "RasterOut",
    "probe_reduce_capacity",
    "probe_visit_chunks",
    "truncate_mapping",
    "TruncationGuard",
    "rasterize",
    "rasterize_with_tiles",
    "Rendering",
    "render_gaussians",
    "render_projected",
    "render_with_heuristics",
    "viewspace_gradient",
]
