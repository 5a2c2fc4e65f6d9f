"""Flat (tile, chunk) iteration machinery for the raster kernels.

Round-3 restructure, driven by measured TPU floors (PERF.md, round-3
probes): the per-tile Pallas grid paid ~456 ns of Mosaic step overhead
per tile (12288 tiles) and a 324 ns 2-slot DMA-latency floor per chunk,
on bins that average only ~1.6 chunks. Both kernels now run as ONE grid
step iterating a precomputed flat list of (tile, chunk) pairs:

* The iteration list has one entry per chunk-aligned slot chunk, owned
  by the tile containing its first slot, plus one extra entry per tile
  whose bin starts mid-chunk (the boundary duplicate — the same chunk is
  visited once per tile it spans, exactly like the round-2 per-tile
  supersets, but adjacent in the iteration order).
* Chunk input DMAs run on a depth-4 ring (measured 324 -> ~190 ns, fully
  hidden under the ~600 ns chunk math).
* Per-tile outputs (image block, saturation count) live in VMEM and are
  flushed by manual DMA when the iteration list moves to the next tile;
  per-chunk outputs (visibility, slot gradients) are merged across the
  boundary-duplicate pair in VMEM and flushed once per chunk — this
  deletes the round-2 HBM read-modify-write machinery entirely.
* The per-(pixel, point) quadratic-form coefficients are precomputed
  OUTSIDE the kernel in one fused XLA pass over the gathered slot buffer
  (build_combined): tile-local per slot, so the kernels need no origin
  handling and no per-chunk coefficient row math.

Replaces the shared-memory staging + per-tile thread blocks of the
reference kernels (/root/reference/taichi_splatting/rasterizer/
forward.py:45-66, backward.py:30-44) with a structure shaped by TPU DMA
and grid costs instead of CUDA block scheduling.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend


def cdiv(a, b):
  return -(-a // b)


def round_up(a, b):
  return cdiv(a, b) * b


def iteration_capacity(k_cap: int, g: int, n_tiles: int) -> int:
  """Static bound on the iteration list length: every chunk plus one
  boundary duplicate per tile."""
  return k_cap // g + n_tiles


class IterationList(NamedTuple):
  n_iter: jax.Array     # (1,) int32 number of valid entries
  iter_tile: jax.Array  # (I_cap,) int32 tile of each entry (n_tiles = pad)
  iter_off: jax.Array   # (I_cap,) int32 chunk-aligned slot offset


def build_iteration_list(mapping: TileMapping, g: int) -> IterationList:
  """Flatten the mapper's abutting bins into (tile, chunk) entries.

  Chunk j (slots [j*g, (j+1)*g)) is owned by the last tile whose bin
  starts at or before j*g; a tile whose bin starts mid-chunk gets an
  extra entry for that boundary chunk (its head lanes). Entries are
  sorted by (tile, offset), so each tile's entries are contiguous and in
  slot order, and the boundary-duplicate pair is adjacent in the list.
  """
  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  n_tiles = starts.shape[0]
  k_cap = mapping.overlap_to_point.shape[0]
  n_chunks = k_cap // g
  total = mapping.total_overlaps

  joff = jnp.arange(n_chunks, dtype=jnp.int32) * g
  owner = jnp.searchsorted(starts, joff, side="right").astype(jnp.int32) - 1
  a_valid = joff < total
  a_tile = jnp.where(a_valid, owner, n_tiles)

  b_valid = (starts % g != 0) & (starts < ends)
  b_tile = jnp.where(b_valid, jnp.arange(n_tiles, dtype=jnp.int32), n_tiles)
  b_off = jnp.where(b_valid, (starts // g) * g, 0)

  tiles_all = jnp.concatenate([a_tile, b_tile])
  offs_all = jnp.concatenate([joff, b_off])
  tiles_s, offs_s = jax.lax.sort((tiles_all, offs_all), num_keys=2)
  n_iter = (jnp.sum(a_valid) + jnp.sum(b_valid)).astype(jnp.int32)
  return IterationList(n_iter.reshape(1), tiles_s, offs_s)


# Combined per-slot buffer row layout (see build_combined):
COEFF_ROWS = slice(0, 8)    # [cxx, cyy, cxy, cx, cy, c0, 0, 0]
POINT_ROWS = slice(8, 16)   # [mx_local, my_local, ax, ay, sx, sy, alpha, 0]
FEAT_ROW0 = 16              # then F features, the ones row, zero padding


def feat_rows(f: int) -> int:
  # F features + the all-ones virtual alpha channel + one zero row that
  # aligns with the backward cotangent block's E row (the zero keeps the
  # (F_pad, P) x (F_pad, G) D contraction exact), padded to 8 sublanes
  return round_up(f + 2, 8)


def combined_rows(f: int) -> int:
  return FEAT_ROW0 + feat_rows(f)


def quad_coeffs_rows(mx, my, ax, ay, sx, sy, alpha, dtype):
  """Per-slot quadratic-form coefficients of log(alpha * pdf), on flat
  1-D columns (same math as blend.quad_coeffs; means already
  tile-local). Returns a list of 6 arrays [cxx, cyy, cxy, cx, cy, c0].
  """
  isx = 1.0 / sx
  isy = 1.0 / sy
  du = mx * ax + my * ay
  dv = my * ax - mx * ay
  axx = ax * isx
  ayx = ay * isx
  ayy = ax * isy
  axy = ay * isy
  dux = du * isx
  dvy = dv * isy

  cxx = -0.5 * (axx * axx + axy * axy)
  cyy = -0.5 * (ayx * ayx + ayy * ayy)
  cxy = -(axx * ayx - axy * ayy)
  cx = axx * dux - axy * dvy
  cy = ayx * dux + ayy * dvy
  log_pa = jnp.maximum(jnp.log(jnp.maximum(alpha, 0.0)),
                       jnp.asarray(blend.LOG_ALPHA_FLOOR, dtype))
  c0 = log_pa - 0.5 * (dux * dux + dvy * dvy)
  return [cxx, cyy, cxy, cx, cy, c0]


def build_combined(points: jax.Array, features: jax.Array,
                   mapping: TileMapping, config: RasterConfig) -> jax.Array:
  """Bin-ordered per-slot buffer (combined_rows(F), K_cap).

  One gather of the 7 + F live per-point rows by overlap_to_point (the
  only random access; ~6 ns/idx, flat in width up to 8 rows — PERF.md),
  then one fused elementwise pass derives the per-slot rows:

  * rows 0-7: quadratic-form coefficients of log(alpha * pdf) in the
    slot's TILE-LOCAL pixel frame — the kernels evaluate the whole
    (P, G) alpha field as one (P, 8) x (8, G) matmul with no origin
    handling (non-antialias path).
  * rows 8-15: tile-local point rows [mx, my, ax, ay, sx, sy, alpha, 0]
    for the backward's moment reduction and the antialias pdf.
  * rows 16+: F features, the all-ones virtual alpha channel, padding.

  Sentinel slots (point index N) gather the harmless padding column
  (alpha 0 -> c0 at the log floor, unit axis/sigma), so they are exact
  no-ops in the blend.
  """
  n, f = features.shape
  dtype = points.dtype
  ts = config.tile_size
  th, tw = mapping.tile_shape
  f_pad = feat_rows(f)
  k_cap = mapping.overlap_to_point.shape[0]

  pad7 = jnp.asarray([[0, 0, 1, 0, 1, 1, 0]], dtype)
  live = jnp.concatenate([
      jnp.concatenate([points, pad7], axis=0),               # (N+1, 7)
      jnp.concatenate([features, jnp.zeros((1, f), dtype)], axis=0),
  ], axis=1).T                                               # (7+F, N+1)
  gath = jnp.take(live, mapping.overlap_to_point, axis=1)    # (7+F, K)

  tl = jnp.minimum(mapping.overlap_to_tile, th * tw - 1)
  ox = ((tl % tw) * ts).astype(dtype)
  oy = ((tl // tw) * ts).astype(dtype)

  mx = gath[0] - ox
  my = gath[1] - oy
  ax, ay, sx, sy, alpha = gath[2], gath[3], gath[4], gath[5], gath[6]

  coeffs = quad_coeffs_rows(mx, my, ax, ay, sx, sy, alpha, dtype)
  zero = jnp.zeros((k_cap,), dtype)
  ones = jnp.ones((k_cap,), dtype)
  rows = coeffs + [zero, zero]                               # 8 coeff rows
  rows += [mx, my, ax, ay, sx, sy, alpha, zero]              # 8 point rows
  rows += [gath[7 + i] for i in range(f)]                    # F features
  rows += [ones]                                             # virtual alpha
  rows += [zero] * (f_pad - f - 1)  # incl. the E-row zero (feat_rows)
  return jnp.stack(rows, axis=0)                             # (R_in, K_cap)
