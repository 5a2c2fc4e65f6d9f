"""Pure-XLA tiled rasterizer (fallback backend and test oracle).

Implements exactly the same blend semantics as the Pallas kernels (shared
math in blend.py) as straight-line jnp over whole tile bins, so `jax.grad`
differentiates it directly. Used as:

* the reference implementation the Pallas kernels are tested against
  (SURVEY.md §4 dual-implementation strategy), and
* a portable fallback backend (`impl="xla"`).

Requires a static `max_points_per_tile` bound since XLA has no per-tile
dynamic loop; memory/work scale with T * max_points_per_tile.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend, tiles


def pack_point_cols(points: jax.Array) -> jax.Array:
  """(N, 7) -> (8, N+1): transposed, padded to 8 rows, with a harmless
  padding column for the sentinel index N (alpha 0, unit axis, unit
  sigma, so sentinel bin slots are exact no-ops)."""
  n = points.shape[0]
  pad = jnp.asarray([[0, 0, 1, 0, 1, 1, 0]], points.dtype)
  pts = jnp.concatenate([points, pad], axis=0)               # (N+1, 7)
  pts = jnp.concatenate(
      [pts, jnp.zeros((n + 1, 1), points.dtype)], axis=1)    # (N+1, 8)
  return pts.T


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "config", "max_points_per_tile",
                     "compute_visibility"))
def rasterize_tiles_xla(points: jax.Array, features: jax.Array,
                        mapping: TileMapping,
                        image_size: Tuple[int, int],
                        config: RasterConfig,
                        max_points_per_tile: int,
                        compute_visibility: bool = False):
  """Rasterize with plain XLA ops.

  Returns (image (H, W, F), image_weight (H, W), visibility (N,) or None,
  bin_overflow () bool — True when any tile bin exceeds
  max_points_per_tile, i.e. overlaps were silently dropped and the caller
  should re-run with a larger bound).
  """
  n, f = features.shape
  dtype = points.dtype
  ts = config.tile_size
  th, tw = mapping.tile_shape
  p = ts * ts
  mb = max_points_per_tile

  pts_cols = pack_point_cols(points)                         # (8, N+1)
  feats_cols = jnp.concatenate(
      [features, jnp.zeros((1, f), dtype)], axis=0).T        # (F, N+1)

  otp = jnp.concatenate(
      [mapping.overlap_to_point,
       jnp.full((mb,), n, jnp.int32)])                       # slice guard
  starts = mapping.tile_ranges[:, 0]
  counts = mapping.tile_ranges[:, 1] - starts

  # tile-local pixel coordinates, matching the Pallas kernels bit-for-bit
  lin = jnp.arange(p, dtype=jnp.int32)
  px_l = ((lin % ts).astype(dtype) + 0.5)[:, None]           # (P, 1)
  py_l = ((lin // ts).astype(dtype) + 0.5)[:, None]
  t_idx = jnp.arange(th * tw, dtype=jnp.int32)
  org_x = (t_idx % tw).astype(dtype) * ts
  org_y = (t_idx // tw).astype(dtype) * ts

  def render_tile(start, count, ox, oy):
    idx = jax.lax.dynamic_slice(otp, (start,), (mb,))        # (MB,)
    # mask bin entries beyond the live range (padding is sentinel already,
    # but a too-small mb must not silently read a neighbour's bin)
    live = jnp.arange(mb) < count
    idx = jnp.where(live, idx, n)

    pts = pts_cols[:, idx]                                   # (8, MB)
    feats_t = feats_cols[:, idx]                             # (F, MB)

    if config.antialias:
      pdf = blend.chunk_pdf(pts, px_l, py_l, True, origin=(ox, oy))
      w = blend.chunk_weights(pdf, blend.point_row(pts, blend.ALPHA),
                              jnp.ones((p, 1), dtype), config,
                              blending=config.use_alpha_blending)
    else:
      # same coefficient-matmul alpha field as the Pallas kernels, so
      # threshold/clamp gates agree between implementations bit-for-bit
      coeffs = blend.quad_coeffs(pts, origin=(ox, oy))
      a_raw = jnp.exp(blend.chunk_log_alpha(blend.pixel_basis(px_l, py_l),
                                            coeffs))
      w = blend.chunk_weights_raw(a_raw, jnp.ones((p, 1), dtype), config,
                                  blending=config.use_alpha_blending)

    img = jax.lax.dot_general(feats_t, w.weight, (((1,), (1,)), ((), ())),
                              preferred_element_type=dtype,
          precision=jax.lax.Precision.HIGHEST)  # (F, P)
    if config.use_alpha_blending:
      alpha = jnp.sum(w.weight, axis=1)[None, :]             # (1, P)
    else:
      alpha = jnp.sum(w.a_eff * w.t_excl, axis=1)[None, :]
    vis = jnp.sum(w.weight, axis=0) if compute_visibility else None
    return jnp.concatenate([img, alpha], axis=0), idx, vis

  tiled, idx_all, vis_all = jax.vmap(render_tile)(starts, counts,
                                                  org_x, org_y)

  image_full = tiles.tiles_to_image(tiled, (th, tw), ts, image_size)
  image = image_full[..., :f]
  weight = image_full[..., f]
  if not config.use_alpha_blending:
    weight = (weight > 0).astype(dtype)

  visibility = None
  if compute_visibility:
    visibility = jax.ops.segment_sum(
        vis_all.reshape(-1), idx_all.reshape(-1), num_segments=n + 1)[:n]
  bin_overflow = jnp.any(counts > mb)
  return image, weight, visibility, bin_overflow
