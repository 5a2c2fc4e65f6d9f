"""Tile mapper: bin projected 2D gaussians into depth-sorted per-tile lists.

TPU-native rebuild of /root/reference/taichi_splatting/mapper/tile_mapper.py
and the CUB device primitives it wraps (cuda_lib/). The pipeline role is
the same — count overlaps, emit (tile, depth) keys, sort, find per-tile
ranges (tile_mapper.py:168-196) — but the implementation is designed
around what is actually fast on TPU (wide vector ops, sorts, cumsums,
tiny scatters) and avoids what is slow (large scatters, narrow gathers):

* No host round-trip for the overlap total (the reference syncs the
  `full_cumsum` grand total to host to size buffers,
  cuda_lib/full_cumsum.cu:41-46): shapes are static, a `capacity` bounds
  the *binned* overlap list, and overflow is reported as a device flag.
* No per-gaussian dynamic loops (tile_mapper.py:134): candidate tiles
  are enumerated statically. Gaussians are bucketed by footprint size
  (a counting-sort permutation) so most pay a 4-candidate budget and only
  static tails pay 16/64/256.
* The candidate stream is sorted *directly* — no offsets/cumsum/scatter
  compaction: SAT-rejected and out-of-span candidates carry sentinel
  keys and sort to the end. (OBB/SAT culling per grid_query.py:30-70;
  rejected pairs can never affect the image because of the rasterizer's
  alpha gate.)
* CUB radix_sort_pairs (end_bit=48, tile_mapper.py:154) becomes
  `jax.lax.sort`: lexicographic (tile, depth) 32-bit keys, or a single
  packed u32 key in depth16 mode (tile_mapper.py:52-64).
* Ranges via vectorized `searchsorted` on the sorted tile ids.
* The overlap list **is** the sorted candidate stream: tile bins abut
  with no padding or relayout (the round-1 chunk-padded layout cost a
  K-sized ~9 ns/row gather to build). The raster kernels read
  chunk-aligned supersets of each bin and mask the boundary lanes;
  boundary output chunks are combined read-modify-write across the
  sequential grid.
* The mapping also carries per-point segment offsets — the gradient
  reduction in the raster backward sorts per-slot values by point index
  and takes prefix-sum differences at these offsets instead of a
  (TPU-hostile) scatter-add segment_sum.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from . import lib

TILE_SENTINEL = jnp.iinfo(jnp.int32).max

# candidate budgets per footprint bucket (tiles per gaussian enumerated)
_BUDGETS = (2, 4, 16, 64, 256)
# For large N, later rounds only process a static tail of the
# footprint-sorted order (gaussians beyond it get cropped + flagged);
# for small N every round covers everything — the work is negligible.
_SMALL_N = 4096
_TAIL_FRACTIONS = (1.0, 1.0 / 2, 1.0 / 8, 1.0 / 32, 1.0 / 256)
_N_ROUNDS = len(_BUDGETS)


def _tail_size(n: int, r: int, emit_tails=None) -> int:
  if emit_tails is not None:
    return n if r == 0 else min(n, int(emit_tails[r]))
  if n <= _SMALL_N:
    return n
  return min(n, int(math.ceil(n * _TAIL_FRACTIONS[r])))


def cdiv(a, b):
  return -(-a // b)


def round_up(a, b):
  return cdiv(a, b) * b


def pad_to_tile(image_size: Tuple[int, int], tile_size: int) -> Tuple[int, int]:
  """Round an image size up to whole tiles (tile_mapper.py:18-22)."""
  return tuple(round_up(int(x), tile_size) for x in image_size)


def num_tiles(image_size: Tuple[int, int], tile_size: int) -> Tuple[int, int]:
  w, h = pad_to_tile(image_size, tile_size)
  return w // tile_size, h // tile_size


def default_capacity(n: int, image_size: Tuple[int, int],
                     tile_size: int, factor: float = 4.0) -> int:
  """Heuristic static capacity for the binned overlap list; callers can
  override and use `total_overlaps` to resize (recompile) on overflow."""
  tw, th = num_tiles(image_size, tile_size)
  small = n * 64 if n <= 4096 else 0
  return int(round_up(max(int(n * factor), 4 * tw * th, small, 1024), 1024))


@dataclass(frozen=True)
class TileMapping:
  """Result of map_to_tiles.

  The overlap list is the depth-sorted candidate stream truncated to the
  static `capacity` (rounded up to a chunk): tile bins abut contiguously
  (tile_ranges[t+1, 0] == tile_ranges[t, 1]); real overlaps occupy
  [0, total_overlaps) and every later slot holds `point_sentinel` (== N),
  which indexes a zero-alpha padding row the raster kernels treat as an
  exact no-op.

  point_offsets supports the gradient reduction (raster/function.py
  reduce_slots_by_point): sorting slots by overlap_to_point groups them
  by original point index, with point i's group at
  [point_offsets[i], point_offsets[i+1]) and sentinel slots at the end.
  """
  overlap_to_point: jax.Array  # (K_cap,) int32, point index or N (sentinel)
  tile_ranges: jax.Array       # (TH*TW, 2) int32 [start, end) per tile
  tile_shape: Tuple[int, int]  # (TH, TW) -- static
  total_overlaps: jax.Array    # () int32 number of real (point, tile) pairs
  overflow: jax.Array          # () bool: capacity exceeded / footprint
                               # cropped -- results valid but incomplete
  point_sentinel: int          # == N (static)
  point_offsets: jax.Array     # (N+1,) int32 segment starts in point-
                               # sorted slot order, clamped to K_cap

  @property
  def tile_ranges_2d(self) -> jax.Array:
    th, tw = self.tile_shape
    return self.tile_ranges.reshape(th, tw, 2)


jax.tree_util.register_dataclass(
    TileMapping,
    data_fields=["overlap_to_point", "tile_ranges", "total_overlaps",
                 "overflow", "point_offsets"],
    meta_fields=["tile_shape", "point_sentinel"])


def _footprint(points: jax.Array, image_size, tile_size: int,
               alpha_threshold: float, max_span: int):
  """Per-gaussian tile-footprint and OBB data (grid_query.py:72-91).
  Invalid gaussians (alpha below threshold) get span 0."""
  mean, axis, sigma, alpha = lib.unpack_g2d(points)

  valid = alpha > alpha_threshold
  gs = lib.gaussian_scale_factor(alpha, alpha_threshold)
  radii = sigma * gs[:, None]
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

  inv_basis = jnp.stack(
      [axis / safe_radii[:, 0:1], lib.perp(axis) / safe_radii[:, 1:2]],
      axis=1)
  return min_tile, span, inv_basis, mean, clipped


def _sat_accept(lo_x, lo_y, ib, tile_size):
  """Oriented-ellipse vs tile-AABB separating-axis test
  (grid_query.py:29-43). True = overlaps.

  The extrema of the linear corner projections factorize per component
  (min over a box of a linear function = sum of per-axis minima), so the
  test is pure elementwise math — no corner enumeration or batched
  matmuls. lo_x/lo_y: (..., ) tile lower corner relative to the mean;
  ib: tuple of 4 (...,) inverse-basis entries (row-major)."""
  hi_x = lo_x + tile_size
  hi_y = lo_y + tile_size
  ib00, ib01, ib10, ib11 = ib

  sep = None
  for bx, by in ((ib00, ib01), (ib10, ib11)):
    mn = (jnp.minimum(bx * lo_x, bx * hi_x)
          + jnp.minimum(by * lo_y, by * hi_y))
    mx = (jnp.maximum(bx * lo_x, bx * hi_x)
          + jnp.maximum(by * lo_y, by * hi_y))
    s = (mn > 1.0) | (mx < -1.0)
    sep = s if sep is None else (sep | s)
  return ~sep


def _partition_by_bucket(p: jax.Array):
  """Permutation grouping gaussians by footprint bucket (ascending),
  via one small 2-operand sort."""
  n = p.shape[0]
  bucket = jnp.sum((p[:, None] > jnp.asarray(_BUDGETS[:-1], p.dtype)),
                   axis=1).astype(jnp.int32)
  _, perm = jax.lax.sort(
      (bucket, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)
  return perm


@partial(jax.jit, static_argnames=("image_size", "config", "capacity",
                                   "use_depth16", "emit_tails"))
def map_to_tiles(points: jax.Array, depth: jax.Array,
                 image_size: Tuple[int, int], config: RasterConfig,
                 capacity: Optional[int] = None,
                 use_depth16: bool = False,
                 emit_tails: Optional[Tuple[int, ...]] = None) -> TileMapping:
  """Map gaussians to tiles, depth-sorted front-to-back within each tile
  (reference mapper/tile_mapper.py:202-223).

  Args:
    points: (N, 7) packed 2D gaussians
    depth: (N,) or (N, 1) nonnegative sort depths (NDC or camera z);
      depth16 mode additionally assumes depth in [0, 1]
    image_size: (width, height) -- static
    config: RasterConfig -- static
    capacity: static bound on the number of binned overlaps (rounded up
      to a chunk); None -> heuristic (default_capacity). Probe
      `total_overlaps` once and re-jit with a snug capacity.
    use_depth16: quantize depth to 16 bits and sort a single packed u32
      key (the reference's halved-sort-cost mode, tile_mapper.py:47-64)
    emit_tails: static per-round emission tail sizes (probe_emit_tails);
      None -> conservative defaults (~6.75 candidates/gaussian)
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

  # footprint sizes on the original order (for the bucket keys only)
  _, span0, _, _, span_clipped = _footprint(
      points, image_size, tile_size, config.alpha_threshold,
      config.max_tile_span)
  p0 = (span0[:, 0] * span0[:, 1]).astype(jnp.int32)
  perm = _partition_by_bucket(p0)

  # one combined (N, 8) gather of everything emission needs; footprint
  # data is recomputed elementwise on the permuted rows (cheaper than
  # permuting many narrow arrays — gathers pay per row, compute is free)
  pts_depth = jnp.concatenate([points, depth[:, None]], axis=1)  # (N, 8)
  pts_depth_s = jnp.take(pts_depth, perm, axis=0)
  points_s = pts_depth_s[:, :7]
  depth_s = pts_depth_s[:, 7]

  min_tile_s, span_s, inv_basis_s, mean_s, _ = _footprint(
      points_s, image_size, tile_size, config.alpha_threshold,
      config.max_tile_span)
  p_s = (span_s[:, 0] * span_s[:, 1]).astype(jnp.int32)
  counts_budgeted = jnp.minimum(p_s, _emittable_budget(n, emit_tails))
  cropped = jnp.any(counts_budgeted < p_s) | span_clipped

  # ---- emit the candidate stream (static size; sentinels for invalid) ----
  # each candidate carries (tile key, depth key, original point index) by
  # row broadcast — contiguous slices, never gathers
  if use_depth16:
    d16_s = (jnp.clip(depth_s, 0.0, 1.0) * 65535.0).astype(jnp.uint32)

  def emit(lo_q, j_lo, j_hi):
    # plain slicing only — index-array reads would become XLA gathers
    # (~20ns/row) even for contiguous ranges
    j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)

    sx = span_s[lo_q:, 0][:, None]
    jy = jnp.where(sx > 0, j[None, :] // jnp.maximum(sx, 1), 0)
    jx = jnp.where(sx > 0, j[None, :] % jnp.maximum(sx, 1), 0)
    in_span = j[None, :] < counts_budgeted[lo_q:][:, None]

    tx = min_tile_s[lo_q:, 0][:, None] + jx
    ty = min_tile_s[lo_q:, 1][:, None] + jy
    tile_id = (tx + ty * tw).astype(jnp.int32)

    lo_x = (tx * tile_size).astype(points.dtype) - mean_s[lo_q:, 0][:, None]
    lo_y = (ty * tile_size).astype(points.dtype) - mean_s[lo_q:, 1][:, None]
    ib = tuple(inv_basis_s[lo_q:, a, b][:, None]
               for a in range(2) for b in range(2))
    accept = in_span & _sat_accept(lo_x, lo_y, ib, tile_size)

    orig = perm[lo_q:][:, None].astype(jnp.int32)
    pv = jnp.where(accept, jnp.broadcast_to(orig, tile_id.shape), n)
    acc_count = jnp.sum(accept, axis=1).astype(jnp.int32)

    if use_depth16:
      key = (jnp.where(accept, tile_id.astype(jnp.uint32),
                       jnp.uint32(0xFFFF)) << 16) | d16_s[lo_q:][:, None]
      return (key.ravel(),), pv.ravel(), acc_count
    tk = jnp.where(accept, tile_id, TILE_SENTINEL)
    dk = jnp.broadcast_to(depth_s[lo_q:][:, None], tk.shape)
    return (tk.ravel(), dk.ravel()), pv.ravel(), acc_count

  key_parts, pv_parts = [], []
  accepted_s = jnp.zeros((n,), jnp.int32)
  j_edges = (0,) + _BUDGETS
  for r in range(_N_ROUNDS):
    tail = _tail_size(n, r, emit_tails)
    if tail == 0 or j_edges[r] >= j_edges[r + 1]:
      continue
    keys, pv, acc = emit(n - tail, j_edges[r], j_edges[r + 1])
    key_parts.append(keys)
    pv_parts.append(pv)
    accepted_s = accepted_s.at[n - tail:].add(acc)

  if not pv_parts:
    # n == 0 (or zero emission tails): empty candidate stream
    pv_parts = [jnp.zeros((0,), jnp.int32)]
    if use_depth16:
      key_parts = [(jnp.zeros((0,), jnp.uint32),)]
    else:
      key_parts = [(jnp.zeros((0,), jnp.int32),
                    jnp.zeros((0,), points.dtype))]

  cand_pos = jnp.concatenate(pv_parts)       # original point index or n
  if use_depth16:
    packed = jnp.concatenate([k[0] for k in key_parts])
    packed, cand_pos = jax.lax.sort((packed, cand_pos), num_keys=1,
                                    is_stable=True)
    sorted_tiles = jnp.where(packed >= jnp.uint32(0xFFFF0000), TILE_SENTINEL,
                             (packed >> 16).astype(jnp.int32))
  else:
    cand_tiles = jnp.concatenate([k[0] for k in key_parts])
    cand_depth = jnp.concatenate([k[1] for k in key_parts])
    sorted_tiles, _, cand_pos = jax.lax.sort(
        (cand_tiles, cand_depth, cand_pos), num_keys=2, is_stable=True)

  # ---- per-tile ranges in the sorted candidate stream ----
  tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
  starts = jnp.searchsorted(sorted_tiles, tile_ids,
                            side="left").astype(jnp.int32)
  ends = jnp.searchsorted(sorted_tiles, tile_ids,
                          side="right").astype(jnp.int32)
  tile_counts = ends - starts
  total = jnp.sum(tile_counts)

  # ---- static-capacity overlap list: the sorted stream itself ----
  # Bins abut with no padding; real overlaps fill [0, total) and
  # rejected/out-of-span candidates (sentinels) sorted past them. The
  # raster kernels handle unaligned bin boundaries with lane masks and
  # read-modify-write boundary chunks.
  k_cap = int(round_up(capacity, chunk))
  # real overlaps beyond k_cap are cropped away -- results valid but
  # incomplete (the documented resize-and-recompile flow)
  overflow = cropped | (total > k_cap)

  c_len = cand_pos.shape[0]
  if c_len >= k_cap:
    overlap_to_point = cand_pos[:k_cap]
  else:
    overlap_to_point = jnp.concatenate(
        [cand_pos, jnp.full((k_cap - c_len,), n, jnp.int32)])

  tile_ranges = jnp.stack(
      [jnp.minimum(starts, k_cap), jnp.minimum(ends, k_cap)], axis=1)

  # ---- segment offsets for the sort-based gradient reduction ----
  # (the reduction sorts slot VALUES by overlap_to_point in
  # raster/function.py — on TPU, carrying values through lax.sort is
  # ~3x cheaper than a point-permutation gather afterwards)
  # accepted counts per original point: invert the bucket permutation
  counts_orig = jnp.zeros((n,), jnp.int32).at[perm].set(accepted_s)
  point_offsets = jnp.concatenate(
      [jnp.zeros((1,), jnp.int32),
       jnp.cumsum(counts_orig).astype(jnp.int32)])
  # clamp so the reduction's boundary gather stays in bounds when
  # truncating (degrades to dropped tail gradients, never NaN)
  point_offsets = jnp.minimum(point_offsets, k_cap)

  return TileMapping(
      overlap_to_point=overlap_to_point,
      tile_ranges=tile_ranges,
      tile_shape=(th, tw),
      total_overlaps=total,
      overflow=overflow,
      point_sentinel=n,
      point_offsets=point_offsets)


def _emittable_budget(n: int, emit_tails=None) -> jnp.ndarray:
  """Static per-sorted-position candidate budget: position q gets budget
  _BUDGETS[r] for the largest round r whose static tail covers q."""
  q = jnp.arange(n, dtype=jnp.int32)
  budget = jnp.full((n,), _BUDGETS[0], jnp.int32)
  for r in range(1, _N_ROUNDS):
    budget = jnp.where(q >= n - _tail_size(n, r, emit_tails),
                       _BUDGETS[r], budget)
  return budget


def probe_emit_tails(points: jax.Array, image_size: Tuple[int, int],
                     config: RasterConfig, margin: float = 1.5,
                     quantum: int = 1024) -> Tuple[int, ...]:
  """Measure snug per-round emission tail sizes from one projected frame.

  The default tails emit ~6.75 candidates/gaussian to statically cover
  unknown footprint distributions; real scenes are much tighter. Probing
  once (like the documented `capacity` resize flow) and passing the
  result as map_to_tiles(emit_tails=...) cuts the candidate stream —
  and with it the mapper's sort and emission cost — roughly in half.
  Tails carry a safety margin and are rounded up so small footprint
  drift between frames recompiles rarely; growth beyond a tail sets the
  mapping's overflow flag (footprint crop) as usual.
  """
  n = points.shape[0]
  _, span, _, _, _ = _footprint(points, image_size, config.tile_size,
                                config.alpha_threshold,
                                config.max_tile_span)
  p = np.asarray((span[:, 0] * span[:, 1]).astype(jnp.int32))
  tails = [n]
  for r in range(1, _N_ROUNDS):
    need = int((p > _BUDGETS[r - 1]).sum())
    snug = min(n, int(round_up(int(math.ceil(need * margin)) + 1, quantum)))
    # emission rounds are cumulative: a position in round r's tail must
    # also be in every earlier round's tail or its low-j candidates would
    # silently never be emitted
    tails.append(min(snug, tails[-1]))
  return tuple(tails)
