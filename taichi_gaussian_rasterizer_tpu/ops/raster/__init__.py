from .function import (RasterOut, probe_reduce_capacity,
                       probe_visit_chunks, rasterize, truncate_mapping, TruncationGuard,
                       rasterize_with_tiles)
from .forward import rasterize_tiles_pallas
from .xla_impl import rasterize_tiles_xla
from . import blend, tiles

__all__ = [
    "RasterOut",
    "probe_reduce_capacity",
    "probe_visit_chunks",
    "truncate_mapping",
    "TruncationGuard",
    "rasterize",
    "rasterize_with_tiles",
    "rasterize_tiles_pallas",
    "rasterize_tiles_xla",
    "blend",
    "tiles",
]
