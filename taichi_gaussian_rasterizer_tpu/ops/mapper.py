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
  packed u32 key in depth16 mode (tile_mapper.py:52-64). A hand-rolled
  Pallas radix/counting binning pass is NOT buildable profitably on this
  hardware — the reorder scatter has no Mosaic primitive; see PERF.md
  ("The 'Pallas radix binning' question, closed") for the measurements.
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

# candidate budgets per footprint bucket (tiles per gaussian enumerated).
# A fine ladder keeps the sentinel slack of the candidate stream small:
# every gaussian pays the smallest budget >= its footprint, and the
# K-proportional candidate sort is the heavy-regime frame's largest op
# (saturating scenes sit at median span ~12 — the old (1, 2, 4, 16, 64,
# 256) ladder emitted 24.85M candidates for 12.19M real spans at
# 1M @2048 heavy; the 16-rung ladder emitted 16.07M; this per-integer
# ladder up to 16 emits 15.02M at probe margin 1.5 / 13.2M at 1.1 —
# see PERF.md r4. Ladder fineness is nearly free: the unrolled-column
# count is sum(widths) = 256 regardless of how the rungs partition it,
# and each extra rung only re-slices the bucket-sorted tail.
_BUDGETS = tuple(range(1, 17)) + (20, 24, 28, 32, 48, 64, 96, 128, 192, 256)
# For large N, later rounds only process a static tail of the
# footprint-sorted order (gaussians beyond it get cropped + flagged);
# for small N every round covers everything — the work is negligible.
# Round 0's budget is 1: at scale most gaussians are span-1 (6M scenes:
# ~1.7 overlaps/point), and a 2-candidate round 0 pushed one guaranteed
# sentinel per span-1 gaussian through the candidate sort.
_SMALL_N = 4096
_TAIL_FRACTIONS = ((1.0, 1.0 / 2, 1.0 / 4, 1.0 / 4)
                   + (1.0 / 8,) * 12      # rungs 5..16
                   + (1.0 / 32,) * 6      # rungs 20..64
                   + (1.0 / 256,) * 4)    # rungs 96..256
_N_ROUNDS = len(_BUDGETS)


def _tail_size(n: int, r: int, emit_tails=None) -> int:
  if emit_tails is not None:
    if len(emit_tails) != _N_ROUNDS:
      # _BUDGETS has changed across versions; a tuple of the wrong
      # length came from a stale probe and would silently mis-align
      # budgets with tails (largest-footprint gaussians cropped).
      raise ValueError(
          f"emit_tails has {len(emit_tails)} entries but the mapper has "
          f"{_N_ROUNDS} emission rounds (budgets {_BUDGETS}) — the tuple "
          "is stale; re-run probe_emit_tails")
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
  overlap_to_tile: jax.Array   # (K_cap,) int32, tile index or TH*TW (sentinel)
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
    data_fields=["overlap_to_point", "overlap_to_tile", "tile_ranges",
                 "total_overlaps", "overflow", "point_offsets"],
    meta_fields=["tile_shape", "point_sentinel"])


def _footprint(points: jax.Array, image_size, tile_size: int,
               alpha_threshold: float, max_span: int):
  """Per-gaussian tile-footprint and OBB data (grid_query.py:72-91),
  as flat 1-D column arrays. Invalid gaussians (alpha below threshold)
  get span 0.

  Column (not (N, 2)-shaped) arrays matter on TPU: a (N, 2) f32 array
  occupies 2 of 128 vreg lanes, so every elementwise op on it runs at
  ~1.6% lane utilization — profiled as a ~20 ms tail of broadcasts and
  reshapes in the round-2 mapper. 1-D arrays pack lanes fully.

  Returns dict with 1-D entries: mx, my (mean), tx0, ty0 (min tile),
  span_x, span_y, ib00, ib01, ib10, ib11 (inverse OBB basis rows), and
  the scalar `clipped`."""
  mx, my = points[:, 0], points[:, 1]
  ax, ay = points[:, 2], points[:, 3]
  sx, sy = points[:, 4], points[:, 5]
  alpha = points[:, 6]

  valid = alpha > alpha_threshold
  gs = lib.gaussian_scale_factor(alpha, alpha_threshold)
  r0 = jnp.maximum(sx * gs, 1e-12)
  r1 = jnp.maximum(sy * gs, 1e-12)

  # ellipse AABB: axes u1 = axis * r0, u2 = perp(axis) * r1
  ext_x = jnp.sqrt((ax * r0) ** 2 + (ay * r1) ** 2)
  ext_y = jnp.sqrt((ay * r0) ** 2 + (ax * r1) ** 2)

  tw, th = num_tiles(image_size, tile_size)

  def axis_range(m, ext, nt):
    lo = jnp.clip(jnp.floor((m - ext) / tile_size).astype(jnp.int32),
                  0, nt - 1)
    hi = jnp.ceil((m + ext) / tile_size).astype(jnp.int32)
    hi = jnp.minimum(jnp.maximum(hi, lo + 1), nt)
    return lo, hi

  tx0, tx1 = axis_range(mx, ext_x, tw)
  ty0, ty1 = axis_range(my, ext_y, th)

  raw_x = jnp.where(valid, tx1 - tx0, 0)
  raw_y = jnp.where(valid, ty1 - ty0, 0)
  clipped = jnp.any(raw_x > max_span) | jnp.any(raw_y > max_span)

  return dict(
      mx=mx, my=my, tx0=tx0, ty0=ty0,
      span_x=jnp.clip(raw_x, 0, max_span),
      span_y=jnp.clip(raw_y, 0, max_span),
      ib00=ax / r0, ib01=ay / r0, ib10=-ay / r1, ib11=ax / r1,
      clipped=clipped)


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
  via one small 2-operand sort.

  Within each bucket the order is deliberately SCRAMBLED (hash tiebreak
  in the sort key): a stable bucket sort leaves the permutation mostly
  monotone (most points are bucket 0), and XLA's TPU gather runs ~1.7x
  slower on monotone index runs once the table exceeds cache reach
  (measured at 6M points: 13.2 ns/idx identity-ish vs 7.6 scrambled /
  random — the same pathology as the round-3 fully-sorted finding,
  worth ~33 ms on the 6M frame's (N, 8) permutation gather). Emission
  correctness is order-free within a bucket: budgets are constant per
  bucket and probe_emit_tails counts points, not positions."""
  n = p.shape[0]
  bucket = jnp.sum((p[:, None] > jnp.asarray(_BUDGETS[:-1], p.dtype)),
                   axis=1).astype(jnp.uint32)
  idx = jnp.arange(n, dtype=jnp.int32)
  h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)) >> 12
  key = (bucket << 20) | (h & jnp.uint32(0xFFFFF))
  _, perm = jax.lax.sort((key, idx), num_keys=1, is_stable=False)
  return perm


def _searchsorted_two_level(sorted_vals: jax.Array, n_tiles: int):
  """starts_ext[t] = first index i with sorted_vals[i] >= t, for
  t in [0, n_tiles] (side="left" searchsorted with arange queries).

  sorted_vals: (C,) int32 ascending, values in [0, n_tiles] after
  clipping (sentinels >= n_tiles). Level 1 samples every M-th element:
  a scatter-min of C/M sample positions onto their values plus a
  reverse cummin brackets every query into one M-window; level 2 is a
  log2(M) unrolled binary search (fused gathers, no while-loop)."""
  c = sorted_vals.shape[0]
  t1 = n_tiles + 1
  if c == 0:
    return jnp.zeros((t1,), jnp.int32)
  # keep the sample scatter small (~16k) at large C; M=256 below that
  m = 256
  while c // m > 16384:
    m *= 2
  s2 = jnp.minimum(sorted_vals[::m], n_tiles)              # (C//M,)
  j = jnp.arange(s2.shape[0], dtype=jnp.int32)
  first2 = jnp.full((t1 + 1,), s2.shape[0], jnp.int32).at[s2].min(
      j, indices_are_sorted=True, mode="drop")
  coarse = jax.lax.cummin(first2[::-1])[::-1][:t1]
  hi = jnp.minimum(coarse * m, c)                          # vals[hi] >= q
  lo = jnp.maximum(hi - m, 0)
  q = jnp.arange(t1, dtype=jnp.int32)
  for _ in range(int(math.log2(m))):
    mid = (lo + hi) // 2
    v = sorted_vals[jnp.clip(mid, 0, c - 1)]
    go_hi = (v < q) & (mid < c)
    lo = jnp.where(go_hi, mid + 1, lo)
    hi = jnp.where(go_hi, hi, mid)
  return hi


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
  if use_depth16:
    # depth16 packs tile ids into the high u32 halfword with 0xFFFF as
    # the reject sentinel — real tiles must not alias it
    assert n_tiles < 0xFFFF, (
        f"tile grid {th}x{tw} aliases the depth16 sentinel tile id; use "
        "use_depth16=False or a larger tile_size")
  # emission's float-reciprocal integer division floor((j+0.5)*recip) is
  # exact only while (j+0.5)*span_x stays well under f32's 2^23 integer
  # grid (see emit() below); ties the static budget table to the config
  assert (_BUDGETS[-1] + 0.5) * config.max_tile_span < 2 ** 22, (
      f"max_tile_span {config.max_tile_span} too large for the "
      f"float-division emission trick at budget {_BUDGETS[-1]}")
  if capacity is None:
    capacity = default_capacity(n, image_size, tile_size)

  # footprint sizes on the original order (for the bucket keys only)
  fp0 = _footprint(points, image_size, tile_size, config.alpha_threshold,
                   config.max_tile_span)
  p0 = (fp0["span_x"] * fp0["span_y"]).astype(jnp.int32)
  perm = _partition_by_bucket(p0)

  # one combined (N, 8) gather of everything emission needs; footprint
  # data is recomputed elementwise on the permuted rows (cheaper than
  # permuting many narrow arrays — gathers pay per row, compute is free).
  # Index count padded off the 128-multiple lane-exact case: XLA's TPU
  # gather is 2x slower there (PERF.md round 4); +8 dummies then slice.
  pts_depth = jnp.concatenate([points, depth[:, None]], axis=1)  # (N, 8)
  perm_pad = jnp.concatenate([perm, jnp.zeros((8,), perm.dtype)]) \
      if n % 128 == 0 and n > 2_000_000 else perm
  pts_depth_s = jnp.take(pts_depth, perm_pad, axis=0)[:n]
  points_s = pts_depth_s[:, :7]
  depth_s = pts_depth_s[:, 7]

  fp = _footprint(points_s, image_size, tile_size, config.alpha_threshold,
                  config.max_tile_span)
  p_s = (fp["span_x"] * fp["span_y"]).astype(jnp.int32)
  counts_budgeted = jnp.minimum(p_s, _emittable_budget(n, emit_tails))
  cropped = jnp.any(counts_budgeted < p_s) | fp0["clipped"]

  # ---- emit the candidate stream (static size; sentinels for invalid) ----
  # Per candidate slot j a 1-D column over the round's point tail: flat
  # arrays keep all 128 vreg lanes busy (a (tail, width) 2-D layout
  # with width < 128 runs at width/128 lane utilization — profiled as a
  # ~20 ms broadcast/reshape tail in the round-2 mapper). Stream order
  # becomes j-major, which the (tile, depth) sort erases. Plain slicing
  # only — index-array reads would become XLA gathers even for
  # contiguous ranges.
  if use_depth16:
    d16_s = (jnp.clip(depth_s, 0.0, 1.0) * 65535.0).astype(jnp.uint32)
  perm_i = perm.astype(jnp.int32)

  def emit(lo_q, j_lo, j_hi):
    sx = fp["span_x"][lo_q:]
    # j // sx via floats: integer division by a dynamic divisor is a
    # multi-op VPU sequence, but floor((j + 0.5) * (1/sx)) is exact for
    # j < 2^12 (the +0.5 keeps the product strictly between integer
    # boundaries, 0.5/sx >> f32 rounding), and the reciprocal is one
    # column for all j
    recip = 1.0 / jnp.maximum(sx, 1).astype(points.dtype)
    budget = counts_budgeted[lo_q:]
    tx0 = fp["tx0"][lo_q:]
    ty0 = fp["ty0"][lo_q:]
    mxc = fp["mx"][lo_q:]
    myc = fp["my"][lo_q:]
    ib = (fp["ib00"][lo_q:], fp["ib01"][lo_q:],
          fp["ib10"][lo_q:], fp["ib11"][lo_q:])
    orig = perm_i[lo_q:]
    d16c = d16_s[lo_q:] if use_depth16 else None
    depc = depth_s[lo_q:]

    def make(jv, jy, jx, tx0, ty0, mxc, myc, budget, ib, orig, d16c, depc):
      # jv/jy/jx and the columns must be mutually broadcastable
      tx = tx0 + jx
      ty = ty0 + jy
      tile_id = tx + ty * tw
      lo_x = (tx * tile_size).astype(points.dtype) - mxc
      lo_y = (ty * tile_size).astype(points.dtype) - myc
      accept = (jv < budget) & _sat_accept(lo_x, lo_y, ib, tile_size)
      pv = jnp.where(accept, orig, n)
      if use_depth16:
        packed = ((jnp.where(accept, tile_id.astype(jnp.uint32),
                             jnp.uint32(0xFFFF)) << 16) | d16c)
        if config.deterministic:
          # full f32 depth as the secondary key: quantized-key ties
          # break on true depth, making the blend order reproducible
          # and input-order-invariant (config.deterministic docstring)
          key = (packed, jnp.broadcast_to(depc, tile_id.shape))
        else:
          key = packed
      else:
        key = (jnp.where(accept, tile_id, TILE_SENTINEL),
               jnp.broadcast_to(depc, tile_id.shape))
      return key, pv, accept

    # 1-D unrolled columns for narrow rounds AND any round whose tail is
    # large: the 2-D (tail, width) layout runs elementwise ops at
    # width/128 lane utilization, which is fine for small static tails
    # but was a measured ~15 ms parade of 0.8 ms broadcast/mul ops on
    # saturating scenes (PERF.md r4) where mid-width rounds carry ~1M
    # gaussians. Thresholds are static (emit_tails/lo_q are python ints).
    tail = sx.shape[0]
    if j_hi - j_lo <= 4 or (j_hi - j_lo <= 16 and tail * (j_hi - j_lo)
                            > 1_000_000):
      # one 1-D column per j, unrolled
      keys_j, pv_j, acc = [], [], jnp.zeros(sx.shape, jnp.int32)
      for j in range(j_lo, j_hi):
        if j == 0:
          jy = jx = jnp.zeros(sx.shape, jnp.int32)
        else:
          jy = jnp.floor((j + 0.5) * recip).astype(jnp.int32)
          jx = j - jy * sx
        key, pv, accept = make(jnp.asarray(j, jnp.int32), jy, jx,
                               tx0, ty0, mxc, myc, budget, ib, orig,
                               d16c, depc)
        keys_j.append(key)
        pv_j.append(pv)
        acc = acc + accept
      return keys_j, pv_j, acc

    # wide rounds cover only small static tails: the classic 2-D form
    # keeps the unrolled graph (and compile time) bounded; the lane
    # under-utilization is negligible at these sizes
    j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)[None, :]
    jf = j.astype(points.dtype) + 0.5
    jy = jnp.floor(jf * recip[:, None]).astype(jnp.int32)
    jx = j - jy * sx[:, None]

    def col2(x):
      return x[:, None]

    key, pv, accept = make(
        j, jy, jx, col2(tx0), col2(ty0), col2(mxc), col2(myc),
        col2(budget), tuple(map(col2, ib)), col2(orig),
        col2(d16c) if use_depth16 else None, col2(depc))
    key = (tuple(k.ravel() for k in key) if isinstance(key, tuple)
           else key.ravel())
    return ([key], [pv.ravel()],
            jnp.sum(accept, axis=1).astype(jnp.int32))

  key_parts, pv_parts = [], []
  accepted_s = jnp.zeros((n,), jnp.int32)
  j_edges = (0,) + _BUDGETS
  for r in range(_N_ROUNDS):
    tail = _tail_size(n, r, emit_tails)
    if tail == 0 or j_edges[r] >= j_edges[r + 1]:
      continue
    keys, pv, acc = emit(n - tail, j_edges[r], j_edges[r + 1])
    key_parts.extend(keys)
    pv_parts.extend(pv)
    accepted_s = accepted_s.at[n - tail:].add(acc)

  if not pv_parts:
    # n == 0 (or zero emission tails): empty candidate stream
    pv_parts = [jnp.zeros((0,), jnp.int32)]
    if use_depth16 and not config.deterministic:
      key_parts = [jnp.zeros((0,), jnp.uint32)]
    elif use_depth16:
      key_parts = [(jnp.zeros((0,), jnp.uint32),
                    jnp.zeros((0,), points.dtype))]
    else:
      key_parts = [(jnp.zeros((0,), jnp.int32),
                    jnp.zeros((0,), points.dtype))]

  # is_stable=False: measured 10.3 -> 7.6 ms (u32 key + payload, 3.06M) /
  # 12.8 -> 11.4 ms (2-key) on TPU v5e. Candidates with identical
  # (tile, depth) keys blend in arbitrary, compile-dependent order. The
  # reference's CUB radix_sort_pairs IS stable (ties blend in generation
  # order), so this is a deliberate determinism-for-speed tradeoff; it
  # only matters for exactly-tied depths, which are measure-zero in f32
  # mode but common under depth16 quantization (see map_to_tiles'
  # depth16 docstring).
  cand_pos = jnp.concatenate(pv_parts)       # original point index or n
  # config.deterministic maps to stable sorts (the reference's CUB radix
  # is stable); depth16 additionally carries the full f32 depth as a
  # secondary key so quantized ties break on true depth (reproducible
  # and input-order-invariant — see the config docstring)
  stable = config.deterministic
  if use_depth16 and config.deterministic:
    packed = jnp.concatenate([k[0] for k in key_parts])
    cand_depth = jnp.concatenate([k[1] for k in key_parts])
    packed, _, cand_pos = jax.lax.sort(
        (packed, cand_depth, cand_pos), num_keys=2, is_stable=True)
    sorted_tiles = jnp.where(packed >= jnp.uint32(0xFFFF0000), TILE_SENTINEL,
                             (packed >> 16).astype(jnp.int32))
  elif use_depth16:
    packed = jnp.concatenate(key_parts)
    packed, cand_pos = jax.lax.sort((packed, cand_pos), num_keys=1,
                                    is_stable=False)
    sorted_tiles = jnp.where(packed >= jnp.uint32(0xFFFF0000), TILE_SENTINEL,
                             (packed >> 16).astype(jnp.int32))
  else:
    cand_tiles = jnp.concatenate([k[0] for k in key_parts])
    cand_depth = jnp.concatenate([k[1] for k in key_parts])
    sorted_tiles, _, cand_pos = jax.lax.sort(
        (cand_tiles, cand_depth, cand_pos), num_keys=2, is_stable=stable)

  # ---- per-tile ranges in the sorted candidate stream ----
  # bins abut, so one search over T+1 queries yields starts AND ends:
  # ends[t] == starts[t+1], with the query t == n_tiles finding the first
  # sentinel (rejected candidates sort past every real tile id).
  # Two-level search instead of jnp.searchsorted: the vectorized binary
  # search lowers to a log2(C)-step while-loop whose per-step gather
  # cannot fuse (~6 ms standalone at 3.4M candidates); sampling every
  # M-th element bounds each query to an M-window via one tiny
  # scatter-min + reverse cummin, then log2(M) unrolled gather steps
  # finish (measured 2.3 ms, exact match).
  starts_ext = _searchsorted_two_level(sorted_tiles, n_tiles)
  starts = starts_ext[:-1]
  ends = starts_ext[1:]
  total = starts_ext[-1]

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
    overlap_to_tile = jnp.minimum(sorted_tiles[:k_cap], n_tiles)
  else:
    overlap_to_point = jnp.concatenate(
        [cand_pos, jnp.full((k_cap - c_len,), n, jnp.int32)])
    overlap_to_tile = jnp.concatenate(
        [jnp.minimum(sorted_tiles, n_tiles),
         jnp.full((k_cap - c_len,), n_tiles, jnp.int32)])

  tile_ranges = jnp.stack(
      [jnp.minimum(starts, k_cap), jnp.minimum(ends, k_cap)], axis=1)

  # ---- segment offsets for the sort-based gradient reduction ----
  # (the reduction sorts slot VALUES by overlap_to_point in
  # raster/function.py — on TPU, carrying values through lax.sort is
  # ~3x cheaper than a point-permutation gather afterwards)
  # accepted counts per original point: invert the bucket permutation.
  # One 2-operand sort keyed on the (unique) permutation — XLA lowers
  # the equivalent scatter to a sort-based path that measures ~4x
  # slower (43.5 -> 11 ms at 6M points on TPU v5e)
  _, counts_orig = jax.lax.sort((perm, accepted_s), num_keys=1,
                                is_stable=False)
  point_offsets = jnp.concatenate(
      [jnp.zeros((1,), jnp.int32),
       jnp.cumsum(counts_orig).astype(jnp.int32)])
  # clamp so the reduction's boundary gather stays in bounds when
  # truncating (degrades to dropped tail gradients, never NaN)
  point_offsets = jnp.minimum(point_offsets, k_cap)

  return TileMapping(
      overlap_to_point=overlap_to_point,
      overlap_to_tile=overlap_to_tile,
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
  fp = _footprint(points, image_size, config.tile_size,
                  config.alpha_threshold, config.max_tile_span)
  p = np.asarray((fp["span_x"] * fp["span_y"]).astype(jnp.int32))
  tails = [n]
  for r in range(1, _N_ROUNDS):
    need = int((p > _BUDGETS[r - 1]).sum())
    snug = min(n, int(round_up(int(math.ceil(need * margin)) + 1, quantum)))
    # emission rounds are cumulative: a position in round r's tail must
    # also be in every earlier round's tail or its low-j candidates would
    # silently never be emitted
    tails.append(min(snug, tails[-1]))
  return tuple(tails)
