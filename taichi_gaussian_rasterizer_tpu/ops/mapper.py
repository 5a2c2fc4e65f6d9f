"""Tile mapper: bin projected 2D gaussians into depth-sorted per-tile lists.

TPU-native rebuild of /root/reference/taichi_splatting/mapper/tile_mapper.py
and the CUB device primitives it wraps (cuda_lib/). The pipeline role is the
same — count overlaps, scan, emit (tile, depth) keys, sort, find per-tile
ranges (tile_mapper.py:168-196) — but every stage is re-designed for static
shapes and XLA:

* No host round-trip for the overlap total (the reference syncs the
  `full_cumsum` grand total to the host to size buffers,
  cuda_lib/full_cumsum.cu:41-46): a static `capacity` bounds the overlap
  list, invalid slots carry sentinel keys that sort to the end, and the
  dynamic total is returned as a device scalar for overflow checks.
* No per-gaussian dynamic loops (tile_mapper.py:134): candidate tiles are
  enumerated statically. To avoid paying the worst-case footprint for
  every gaussian, gaussians are partitioned by footprint size into
  power-of-4 buckets with a counting sort, and each bucket only
  enumerates its own candidate budget (4 / 16 / 64 / 256 candidates).
* OBB/SAT culling (taichi_lib/grid_query.py:30-70) is applied per
  candidate; rejected candidates emit sentinel keys (they cost sort slots
  but never affect the image, since the rasterizer's alpha gate makes
  off-tile gaussians exact no-ops).
* CUB radix_sort_pairs (end_bit=48, tile_mapper.py:154) becomes
  `jax.lax.sort`: lexicographic (tile, depth) 32-bit keys, or a single
  packed u32 key in depth16 mode (tile_mapper.py:52-64).
* find_ranges boundary detection (tile_mapper.py:90-110) becomes a
  vectorized `searchsorted` over sorted tile ids.
* Tile ranges are re-laid out so each tile's bin starts on a
  `points_per_chunk` boundary and is padded with sentinel entries: the
  Pallas raster kernels then stream whole chunks with no bounds masking.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from . import lib

TILE_SENTINEL = jnp.iinfo(jnp.int32).max

# candidate budgets per footprint bucket (tiles per gaussian enumerated)
_BUDGETS = (4, 16, 64, 256)
# For large N, rounds 1..3 only process a static tail of the
# footprint-sorted order (gaussians beyond it get cropped + flagged);
# for small N every round covers everything — the work is negligible.
_SMALL_N = 65536
_TAIL_FRACTIONS = (1.0, 1.0 / 4, 1.0 / 32, 1.0 / 256)


def _tail_size(n: int, r: int) -> int:
  if n <= _SMALL_N:
    return n
  return min(n, int(math.ceil(n * _TAIL_FRACTIONS[r])))


def cdiv(a: int, b: int) -> int:
  return -(-a // b)


def round_up(a: int, b: int) -> int:
  return cdiv(a, b) * b


def pad_to_tile(image_size: Tuple[int, int], tile_size: int) -> Tuple[int, int]:
  """Round an image size up to whole tiles (tile_mapper.py:18-22)."""
  return tuple(round_up(int(x), tile_size) for x in image_size)


def num_tiles(image_size: Tuple[int, int], tile_size: int) -> Tuple[int, int]:
  w, h = pad_to_tile(image_size, tile_size)
  return w // tile_size, h // tile_size


def default_capacity(n: int, image_size: Tuple[int, int],
                     tile_size: int, factor: float = 8.0) -> int:
  """Heuristic static overlap capacity; callers can override and use the
  returned `total_overlaps` to resize (recompile) on overflow."""
  tw, th = num_tiles(image_size, tile_size)
  # tiny scenes (2D toys, tests) have per-gaussian footprints spanning many
  # tiles; give them a generous per-gaussian budget instead of a factor
  small = n * 64 if n <= 4096 else 0
  return int(round_up(max(int(n * factor), 4 * tw * th, small, 1024), 1024))


@dataclass(frozen=True)
class TileMapping:
  """Result of map_to_tiles.

  The overlap list layout is 'chunk-aligned padded': each tile's bin
  occupies [tile_ranges[t,0], tile_ranges[t,1]) and its start is aligned
  to `points_per_chunk`; slots outside every bin hold `point_sentinel`
  (== N), which indexes a zero-alpha padding row that rasterizer kernels
  treat as a no-op.
  """
  overlap_to_point: jax.Array  # (K_pad,) int32, point index or N (sentinel)
  tile_ranges: jax.Array       # (TH*TW, 2) int32 [start, end) per tile
  tile_shape: Tuple[int, int]  # (TH, TW) -- static
  total_overlaps: jax.Array    # () int32: true number of (gaussian, tile)
                               # pairs emitted (before sentinel padding)
  overflow: jax.Array          # () bool: capacity exceeded or footprint
                               # cropped -- results valid but incomplete
  point_sentinel: int          # == N (static)

  @property
  def tile_ranges_2d(self) -> jax.Array:
    th, tw = self.tile_shape
    return self.tile_ranges.reshape(th, tw, 2)


jax.tree_util.register_dataclass(
    TileMapping,
    data_fields=["overlap_to_point", "tile_ranges", "total_overlaps", "overflow"],
    meta_fields=["tile_shape", "point_sentinel"])


def _footprint(points: jax.Array, image_size, tile_size: int,
               alpha_threshold: float, max_span: int):
  """Per-gaussian tile-footprint and OBB data (grid_query.py:72-91).

  Returns (min_tile (N,2) i32, span (N,2) i32, inv_basis rows (N,2,2)).
  Invalid gaussians (alpha below threshold) get span 0.
  """
  mean, axis, sigma, alpha = lib.unpack_g2d(points)
  dtype = points.dtype

  valid = alpha > alpha_threshold
  gs = lib.gaussian_scale_factor(alpha, alpha_threshold)
  radii = sigma * gs[:, None]                       # (N, 2) scaled extents
  # guard: zero radii would make inv_basis inf
  safe_radii = jnp.maximum(radii, 1e-12)

  u1 = axis * radii[:, 0:1]
  u2 = lib.perp(axis) * radii[:, 1:2]
  lower, upper = lib.ellipse_bounds(mean, u1, u2)

  tw, th = num_tiles(image_size, tile_size)
  ntiles = jnp.asarray([tw, th], jnp.int32)

  min_tile = jnp.clip(jnp.floor(lower / tile_size).astype(jnp.int32),
                      0, ntiles - 1)
  max_tile = jnp.ceil(upper / tile_size).astype(jnp.int32)
  max_tile = jnp.minimum(jnp.maximum(max_tile, min_tile + 1), ntiles)

  raw_span = jnp.where(valid[:, None], max_tile - min_tile, 0)
  span = jnp.clip(raw_span, 0, max_span)
  clipped = jnp.any(raw_span > max_span)

  # image->ellipse transform rows (for the SAT test): row_i = axis_i / radius_i
  inv_basis = jnp.stack(
      [axis / safe_radii[:, 0:1], lib.perp(axis) / safe_radii[:, 1:2]], axis=1)
  return min_tile, span, inv_basis, mean, clipped


def _sat_accept(rel_lower, inv_basis, tile_size):
  """Oriented-ellipse vs tile-AABB separating-axis test
  (grid_query.py:29-43). rel_lower: (..., 2) tile lower corner relative to
  the gaussian mean; inv_basis: (..., 2, 2). True = overlaps."""
  # corners of the tile AABB relative to mean
  c00 = rel_lower
  c11 = rel_lower + tile_size
  c01 = jnp.stack([c00[..., 0], c11[..., 1]], axis=-1)
  c10 = jnp.stack([c11[..., 0], c00[..., 1]], axis=-1)
  corners = jnp.stack([c00, c01, c10, c11], axis=-2)     # (..., 4, 2)
  # project corners into ellipse space: (..., 2(row), 4(corner))
  local = jnp.einsum("...ij,...cj->...ic", inv_basis, corners)
  mn = local.min(axis=-1)
  mx = local.max(axis=-1)
  separated = jnp.any((mn > 1.0) | (mx < -1.0), axis=-1)
  return ~separated


def _partition_by_bucket(p: jax.Array):
  """Counting-sort permutation grouping gaussians by footprint bucket
  (ascending). p: (N,) footprint tile counts. Returns perm (N,) such that
  gathered arrays are bucket-contiguous."""
  bucket = jnp.sum((p[:, None] > jnp.asarray(_BUDGETS[:-1], p.dtype)),
                   axis=1).astype(jnp.int32)             # (N,) in [0,3]
  onehot = jax.nn.one_hot(bucket, 4, dtype=jnp.int32)    # (N, 4)
  within = jnp.cumsum(onehot, axis=0) - onehot           # exclusive rank
  base = jnp.concatenate(
      [jnp.zeros((1,), jnp.int32), jnp.cumsum(jnp.sum(onehot, axis=0))[:-1]])
  dst = base[bucket] + within[jnp.arange(p.shape[0]), bucket]
  perm = jnp.zeros_like(dst).at[dst].set(jnp.arange(p.shape[0], dtype=jnp.int32))
  return perm


def _emittable_budget(n: int) -> jnp.ndarray:
  """Static per-sorted-position candidate budget: position q gets budget
  _BUDGETS[r] where r is the largest round whose static tail covers q."""
  q = jnp.arange(n, dtype=jnp.int32)
  budget = jnp.full((n,), _BUDGETS[0], jnp.int32)
  for r in range(1, 4):
    budget = jnp.where(q >= n - _tail_size(n, r), _BUDGETS[r], budget)
  return budget


@partial(jax.jit, static_argnames=("image_size", "config", "capacity",
                                   "use_depth16"))
def map_to_tiles(points: jax.Array, depth: jax.Array,
                 image_size: Tuple[int, int], config: RasterConfig,
                 capacity: Optional[int] = None,
                 use_depth16: bool = False) -> TileMapping:
  """Map gaussians to tiles, depth-sorted front-to-back within each tile
  (reference mapper/tile_mapper.py:202-223).

  Args:
    points: (N, 7) packed 2D gaussians
    depth: (N,) or (N, 1) nonnegative sort depths (NDC or camera z);
      depth16 mode additionally assumes depth in [0, 1]
    image_size: (width, height) -- static
    config: RasterConfig -- static
    capacity: static overlap-list capacity; None -> heuristic
    use_depth16: quantize depth to 16 bits and sort a single packed u32
      key (the reference's halved-sort-cost mode, tile_mapper.py:47-64)

  Returns:
    TileMapping (chunk-aligned padded layout; see class docstring).
  """
  n = points.shape[0]
  if depth.ndim == 2:
    depth = depth[:, 0]
  tile_size = config.tile_size
  chunk = config.points_per_chunk
  tw, th = num_tiles(image_size, tile_size)
  n_tiles = tw * th
  assert n_tiles < 65536, (
      f"tile grid {th}x{tw} exceeds 16-bit tile ids; increase tile_size")
  if capacity is None:
    capacity = default_capacity(n, image_size, tile_size)

  min_tile, span, inv_basis, mean, span_clipped = _footprint(
      points, image_size, tile_size, config.alpha_threshold,
      config.max_tile_span)
  p = (span[:, 0] * span[:, 1]).astype(jnp.int32)   # footprint tile count

  # ---- partition by footprint bucket (counting sort) ----
  perm = _partition_by_bucket(p)
  p_s = p[perm]
  budget_s = _emittable_budget(n)
  counts = jnp.minimum(p_s, budget_s)               # emitted per gaussian
  cropped = jnp.any(counts < p_s) | span_clipped

  offsets = jnp.cumsum(counts) - counts             # exclusive
  total = jnp.sum(counts)
  overflow = cropped | (total > capacity)

  min_tile_s = min_tile[perm]
  span_s = span[perm]
  inv_basis_s = inv_basis[perm]
  mean_s = mean[perm]
  depth_s = depth[perm]

  # ---- emit candidate (slot, tile, point) triples, all rounds fused ----
  def emit(lo_q, j_lo, j_hi):
    """Candidates j in [j_lo, j_hi) for sorted positions [lo_q, n)."""
    idx = jnp.arange(lo_q, n, dtype=jnp.int32)
    j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)

    sx = span_s[idx, 0][:, None]                     # (m, 1)
    jy = jnp.where(sx > 0, j[None, :] // jnp.maximum(sx, 1), 0)
    jx = jnp.where(sx > 0, j[None, :] % jnp.maximum(sx, 1), 0)
    in_span = j[None, :] < counts[idx][:, None]      # (m, J)

    tx = min_tile_s[idx, 0][:, None] + jx
    ty = min_tile_s[idx, 1][:, None] + jy
    tile_id = (tx + ty * tw).astype(jnp.int32)

    rel_lower = (jnp.stack([tx, ty], axis=-1) * tile_size
                 - mean_s[idx][:, None, :]).astype(points.dtype)
    accept = _sat_accept(rel_lower, inv_basis_s[idx][:, None, :, :], tile_size)

    slots = offsets[idx][:, None] + j[None, :]
    slots = jnp.where(in_span, slots, capacity)      # drop out-of-span
    tk = jnp.where(accept, tile_id, TILE_SENTINEL)
    pv = jnp.where(accept, jnp.broadcast_to(idx[:, None], tk.shape), n)
    return slots.ravel(), tk.ravel(), pv.ravel()

  parts = []
  j_edges = (0,) + _BUDGETS
  for r in range(4):
    tail = _tail_size(n, r)
    if tail == 0 or j_edges[r] >= j_edges[r + 1]:
      continue
    parts.append(emit(n - tail, j_edges[r], j_edges[r + 1]))

  all_slots = jnp.concatenate([p[0] for p in parts]) if parts else (
      jnp.zeros((0,), jnp.int32))
  all_tiles = jnp.concatenate([p[1] for p in parts]) if parts else (
      jnp.zeros((0,), jnp.int32))
  all_pvs = jnp.concatenate([p[2] for p in parts]) if parts else (
      jnp.zeros((0,), jnp.int32))

  tile_key = jnp.full((capacity,), TILE_SENTINEL, jnp.int32)
  point_val = jnp.full((capacity,), n, jnp.int32)
  tile_key = tile_key.at[all_slots].set(all_tiles, mode="drop")
  point_val = point_val.at[all_slots].set(all_pvs, mode="drop")

  # depth keys by gather from the sorted-position depths (sentinel -> inf)
  if use_depth16:
    d16 = (jnp.clip(depth_s, 0.0, 1.0) * 65535.0).astype(jnp.uint32)
    depth_ext = jnp.concatenate([d16, jnp.asarray([0xFFFF], jnp.uint32)])
  else:
    inf = jnp.asarray([jnp.inf], depth_s.dtype)
    depth_ext = jnp.concatenate([depth_s, inf])
  depth_key = depth_ext[point_val]

  # point_val currently holds *sorted-order* positions; map back to
  # original indices (sentinel n maps to n)
  perm_ext = jnp.concatenate(
      [perm.astype(jnp.int32), jnp.asarray([n], jnp.int32)])
  point_val = perm_ext[point_val]

  # ---- sort by (tile, depth) ----
  if use_depth16:
    packed = (tile_key.astype(jnp.uint32) << 16) | depth_key
    packed = jnp.where(tile_key == TILE_SENTINEL, jnp.uint32(0xFFFFFFFF),
                       packed)
    packed, point_val = jax.lax.sort((packed, point_val), num_keys=1,
                                     is_stable=True)
    sorted_tiles = jnp.where(
        packed == jnp.uint32(0xFFFFFFFF), TILE_SENTINEL,
        (packed >> 16).astype(jnp.int32))
  else:
    sorted_tiles, _, point_val = jax.lax.sort(
        (tile_key, depth_key, point_val), num_keys=2, is_stable=True)

  # ---- per-tile ranges via binary search ----
  tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
  starts = jnp.searchsorted(sorted_tiles, tile_ids, side="left").astype(jnp.int32)
  ends = jnp.searchsorted(sorted_tiles, tile_ids, side="right").astype(jnp.int32)
  tile_counts = ends - starts

  # ---- chunk-aligned padded relayout ----
  padded_counts = (cdiv_arr(tile_counts, chunk)) * chunk
  padded_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
  k_pad = round_up(capacity, chunk) + n_tiles * chunk   # static bound

  pos = jnp.arange(capacity, dtype=jnp.int32)
  valid_entry = sorted_tiles != TILE_SENTINEL
  t_of = jnp.clip(sorted_tiles, 0, n_tiles - 1)
  dst = padded_starts[t_of] + (pos - starts[t_of])
  dst = jnp.where(valid_entry, dst, k_pad)              # drop sentinels

  overlap_to_point = jnp.full((k_pad,), n, jnp.int32)
  overlap_to_point = overlap_to_point.at[dst].set(point_val, mode="drop")

  tile_ranges = jnp.stack(
      [padded_starts, padded_starts + tile_counts], axis=1)

  return TileMapping(
      overlap_to_point=overlap_to_point,
      tile_ranges=tile_ranges,
      tile_shape=(th, tw),
      total_overlaps=jnp.sum(valid_entry.astype(jnp.int32)),
      overflow=overflow,
      point_sentinel=n)


def cdiv_arr(a, b: int):
  return -(-a // b)
