"""Differentiable rasterization API.

Rebuild of /root/reference/taichi_splatting/rasterizer/function.py on
`jax.custom_vjp`: the Pallas forward/backward kernels are stitched into a
differentiable op; per-overlap-slot gradients are reduced to per-point
gradients with a point-sorted prefix-sum reduction (the TPU-native
replacement for the reference's atomic accumulation ladder — large
scatter-adds are pathologically slow on TPU, sorts/cumsums are not; the
mapper precomputes the point-major permutation once per frame).

Point heuristics (reference backward.py:194-198, surfaced after
loss.backward() by mutating ctx in torch) are delivered functionally: the
op takes a zero "heuristic sink" input (N, 2) whose *cotangent* is the
heuristic — `jax.grad` w.r.t. the sink returns (prune_cost, split_score).

Non-blending (quantile/median) rasterization is forward-only, as in the
reference (its backward kernel only supports blending); outputs are
wrapped in stop_gradient.
"""

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import RasterConfig
from ..mapper import TileMapping, _searchsorted_two_level, map_to_tiles
from . import tiles
from .backward import live_grad_rows, raster_backward_pallas
from .flat import (build_combined, build_iteration_list, cdiv, feat_rows,
                   round_up)
from .forward import rasterize_tiles_flat
from .reduce import segment_sums_by_sorted_key


class RasterOut(NamedTuple):
  image: jax.Array                        # (H, W, F)
  image_weight: jax.Array                 # (H, W) accumulated alpha
  point_heuristic: Optional[jax.Array]    # via heuristic-sink gradients
  visibility: Optional[jax.Array]         # (N,) total blend weight
  bin_overflow: Optional[jax.Array] = None  # xla impl: tile bin exceeded
                                            # max_points_per_tile


def reduce_slots_by_point(slots: jax.Array, mapping: TileMapping) -> jax.Array:
  """(R, K_cap) per-overlap-slot values -> (N, R) per-point sums.

  Segment-sum without scatter-add OR a permutation gather: the slot
  VALUES ride as payloads through one lax.sort keyed on the slot's point
  index (measured on TPU v5e: payload columns cost ~2 ms each at 4M,
  vs ~25 ns/idx for the round-1 point_perm gather — ~3x cheaper), then
  the Pallas segment-sum kernel (reduce.py) turns the sorted stream into
  dense per-point sums via one-hot matmuls (replacing a K-wide cumsum +
  an (N+1)-wide boundary gather, ~13 ms each at 3M slots). Sentinel
  slots sort past every real slot; point_offsets never reach them."""
  return _reduce_rows(slots, mapping.overlap_to_point,
                      mapping.point_sentinel, slots.shape[0],
                      offsets=mapping.point_offsets)


def _sort_and_segment(slots: jax.Array, keys: jax.Array, n: int,
                      offsets: Optional[jax.Array] = None) -> jax.Array:
  """Sort slot rows by point index and segment-sum them: (R', N).

  With `offsets` (the mapper's (N+1,) point_offsets) the segment
  boundaries are known a priori; without it (the compacted reduction —
  only a subset of slots is present, so the mapper's counts are stale)
  the 128-point block offsets the kernel needs are recovered from the
  sorted keys with the mapper's two-level search (~1 ms at 1M blocks'
  worth of queries — jnp.searchsorted would be a multi-ms while-loop).
  """
  r = slots.shape[0]
  # is_stable=False: measured 19.3 -> 16.9 ms at 3.06M x 6 operands on
  # TPU v5e; the per-point sums are order-independent
  ops = jax.lax.sort(
      (keys,) + tuple(slots[i] for i in range(r)),
      num_keys=1, is_stable=False)
  skeys = ops[0]
  grouped = jnp.stack(ops[1:], axis=0)                       # (R, K)
  if offsets is not None:
    return segment_sums_by_sorted_key(skeys, grouped, offsets, n)
  n_blocks = cdiv(n, 128)
  blocks = jnp.where(skeys >= n, n_blocks, skeys // 128)     # ascending
  block_off = _searchsorted_two_level(blocks, n_blocks)      # (W+1,)
  return segment_sums_by_sorted_key(skeys, grouped, None, n,
                                    block_offsets=block_off)


def _reduce_rows(rows_arr: jax.Array, keys: jax.Array, n: int, live: int,
                 offsets: Optional[jax.Array] = None) -> jax.Array:
  """Sort + segment-sum slot rows (u32 rows = bf16 pairs, backward.py):
  (R, K) by (K,) point keys -> (N, live) f32 per-point sums."""
  out = _sort_and_segment(rows_arr, keys, n, offsets)
  if rows_arr.dtype == jnp.uint32:
    # the segment kernel unpacks bf16 pairs losslessly and returns
    # high/low half blocks to deinterleave (rows hi0, lo0, hi1, ...)
    r_pad = out.shape[0] // 2
    inter = jnp.stack([out[:r_pad], out[r_pad:]], axis=1)
    out = inter.reshape(2 * r_pad, -1)
  return out[:live].T                           # (N, live)


def reduce_packed_slots_by_point(packed: jax.Array, mapping: TileMapping,
                                 live: int) -> jax.Array:
  """(P_pairs, K_cap) u32 bf16-pair gradient rows -> (N, live) f32 sums."""
  return _reduce_rows(packed, mapping.overlap_to_point,
                      mapping.point_sentinel, live,
                      offsets=mapping.point_offsets)


def _visited_chunk_select(iters, satiters: jax.Array, mapping: TileMapping,
                          g: int):
  """Which slot chunks does the saturation-skipping backward visit?

  A chunk is visited iff ANY iteration-list entry over it replays
  (entry's within-tile index < satiters[tile] — exactly the backward
  kernel's skip predicate). Entries over one chunk are consecutive in
  the (tile, offset)-sorted list (flat.build_iteration_list), so the
  per-chunk OR is a tiny segment max over same-offset runs.

  Returns (keep (I_cap,) bool marking each visited chunk's first entry,
  src_chunk (I_cap,) int32 chunk index, count () int32 visited chunks).
  """
  starts = mapping.tile_ranges[:, 0]
  n_tiles = starts.shape[0]
  t = iters.iter_tile
  off = iters.iter_off
  real = t < n_tiles                  # padding entries carry tile n_tiles
  tc = jnp.minimum(t, n_tiles - 1)
  # within-tile entry index: per-tile entries step by exactly g from
  # align_down(starts[tile], g) (flat.pack_iters invariant)
  aligned = (jnp.take(starts, tc) // g) * g
  c_local = (off - aligned) // g
  # satiters is SIGNED (forward.py); replay count is its magnitude
  visited = real & (c_local < jnp.take(jnp.abs(satiters), tc))
  is_first = jnp.concatenate(
      [jnp.ones((1,), bool), (off[1:] != off[:-1]) | ~real[1:]])
  rid = jnp.cumsum(is_first.astype(jnp.int32)) - 1           # run ids
  run_any = jnp.zeros((t.shape[0],), jnp.int32).at[rid].max(
      visited.astype(jnp.int32), indices_are_sorted=True)
  keep = is_first & (jnp.take(run_any, rid) > 0)
  return keep, off // g, jnp.sum(keep.astype(jnp.int32))


def compact_visited_slots(rows_arr: jax.Array, satiters: jax.Array,
                          iters, mapping: TileMapping, g: int,
                          reduce_capacity: int):
  """Drop never-replayed slot chunks before the gradient reduction.

  In saturating scenes (real opaque 3DGS checkpoints) the backward
  replays only each tile's pre-saturation front — the rest of the
  per-slot gradient buffer is exactly zero (the blend gates), yet it
  still rides the K_cap-sized reduction sort (the largest single op of
  the heavy-regime frame: 67.9 ms of 347.7 at 11.8M slots, PERF.md
  round 4). This compacts the visited chunks to the front with two
  CHUNK-granular gathers (~130-lane rows, ~0.5 ms) so the sort and
  segment-sum run at the visited count instead of K_cap.

  reduce_capacity (static, multiple of g) bounds the visited-slot
  count; size it with probe_reduce_capacity and re-jit, exactly like
  the mapper's overlap capacity. Chunks past it are dropped (valid but
  cropped gradients, same contract as mapper overflow).

  Returns (pid (K_red,) int32 point keys with sentinel padding,
  vals (R, K_red) compacted rows).
  """
  k_cap = mapping.overlap_to_point.shape[0]
  n_chunks = k_cap // g
  n = mapping.point_sentinel
  assert reduce_capacity % g == 0 and reduce_capacity <= k_cap
  cap_chunks = reduce_capacity // g

  keep, src_chunk, count = _visited_chunk_select(iters, satiters, mapping, g)
  dst = jnp.cumsum(keep.astype(jnp.int32)) - 1
  idx = jnp.where(keep & (dst < cap_chunks), dst, cap_chunks)  # OOB: dropped
  compact_src = jnp.zeros((cap_chunks,), jnp.int32).at[idx].set(
      src_chunk, mode="drop")

  pid = jnp.take(mapping.overlap_to_point.reshape(n_chunks, g),
                 compact_src, axis=0).reshape(-1)
  live_slots = jnp.minimum(count, cap_chunks) * g
  slot_pos = jnp.arange(reduce_capacity, dtype=jnp.int32)
  # pad chunks replicate chunk 0 — sentinel their keys so the reduction
  # never counts them (values are finite, so no NaN risk either way)
  pid = jnp.where(slot_pos < live_slots, pid, n)
  vals = jnp.take(rows_arr.reshape(rows_arr.shape[0], n_chunks, g),
                  compact_src, axis=1).reshape(rows_arr.shape[0], -1)
  return pid, vals


@functools.partial(jax.jit, static_argnames=("config",))
def _probe_visited_chunks(gaussians2d: jax.Array, mapping: TileMapping,
                          config: RasterConfig) -> jax.Array:
  feats = jnp.zeros((gaussians2d.shape[0], 1), gaussians2d.dtype)
  _, iters, _, _, satiters = _forward_impl(
      config, False, gaussians2d, feats, mapping)
  _, _, count = _visited_chunk_select(iters, satiters, mapping,
                                      config.points_per_chunk)
  return count


def probe_reduce_capacity(gaussians2d: jax.Array, mapping: TileMapping,
                          config: RasterConfig,
                          headroom: float = 1.0625) -> int:
  """Measure a scene's visited-chunk slot count and return a snug static
  `reduce_capacity` for rasterize_with_tiles (chunk-aligned, clamped to
  the mapping's K_cap). Saturation depends only on geometry/alpha, so
  the probe renders a single dummy feature channel. Like
  probe_emit_tails / the mapper capacity probe: call once per scene
  scale, then re-jit the frame with the result."""
  g = config.points_per_chunk
  k_cap = mapping.overlap_to_point.shape[0]
  slots = int(_probe_visited_chunks(gaussians2d, mapping, config)) * g
  cap = round_up(max(int(slots * headroom), g), g)
  return min(cap, k_cap)


def _tile_cover_chunks(mapping: TileMapping, g: int) -> jax.Array:
  """Per-tile chunk coverage of the abutting bins: the number of
  iteration-list entries each non-empty tile owns (a-entries plus its
  boundary duplicate) — the unit satiters counts in."""
  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  return jnp.where(ends > starts, cdiv(ends, g) - starts // g, 0)


def probe_visit_chunks(gaussians2d: jax.Array, mapping: TileMapping,
                       config: RasterConfig, margin_chunks: int = 1
                       ) -> Tuple[jax.Array, int]:
  """Measure per-tile saturation depths for truncate_mapping.

  Returns (visit_chunks (n_tiles,) int32 device array, visit_capacity
  static int). On saturating scenes (real opaque 3DGS checkpoints) most
  of the candidate stream sits BEHIND some tile's saturation point: the
  kernels never read it (the saturation early-exit), yet the combined
  gather — the heavy-regime frame's largest op, 58.4 ms of 237 at 11.8M
  slots (PERF.md r4) — materializes every slot. Probing the saturation
  depths once and truncating the mapping (truncate_mapping) sizes the
  whole raster stage by the visited front instead of K_cap.

  Like probe_emit_tails / the capacity probe: call once per scene, re-jit
  with the result. `margin_chunks` extra chunks per tile absorb drift
  between the probed and rendered frame (0 is exact for a static scene);
  a tile whose saturation point drifts past its kept front raises the
  RasterOut.bin_overflow flag — re-probe and re-jit, the documented
  resize-on-overflow flow.
  """
  assert config.saturation_early_exit and config.use_alpha_blending, (
      "probe_visit_chunks requires saturation_early_exit and alpha "
      "blending: truncation is exact only where the saturation skip is")
  # NOTE: probe on the SAME candidate stream the frame will render
  # (same capacity / emit_tails / use_depth16): saturation depths
  # measured on a differently-cropped stream silently truncate real
  # content. A mapping whose overflow flag is set is fine as long as the
  # render uses the identical mapping parameters (the crop is then part
  # of both streams); probing on a SMALLER-capacity map than the render
  # is the dangerous case.
  g = config.points_per_chunk
  feats = jnp.zeros((gaussians2d.shape[0], 1), gaussians2d.dtype)
  _, _, _, _, satiters = _forward_impl(config, False, gaussians2d, feats,
                                       mapping)
  cover = np.asarray(_tile_cover_chunks(mapping, g))
  # satiters is SIGNED; |v| chunks were replayed either way (tiles with
  # empty bins carry uninitialized SMEM — the cover clip masks them)
  sat = np.abs(np.asarray(satiters, np.int64))
  visit = np.clip(np.minimum(cover, sat + margin_chunks), 0, cover)
  visit_capacity = round_up(max(int(visit.sum()), 1) * g, g)
  return jnp.asarray(visit, jnp.int32), int(visit_capacity)


def truncate_mapping(mapping: TileMapping, visit_chunks: jax.Array,
                     visit_capacity: int, g: int
                     ) -> Tuple[TileMapping, jax.Array]:
  """Rebuild the candidate stream keeping only each tile's first
  `visit_chunks[t]` slot chunks (its pre-saturation front).

  The truncated stream is a normal abutting-bins TileMapping whose bins
  are EXCLUSIVE per-tile chunk runs: tile t's run is its kept chunks
  copied verbatim (one cheap chunk-granular gather), with lanes outside
  its own [start, truncated_end) range sentineled. Chunk-aligned run
  starts mean build_iteration_list emits no boundary duplicates and the
  kernels' lane masks pass everything — sentinel slots are exact no-ops
  by the alpha-floor padding row (flat.build_combined), and a slot that
  was shared between two tiles' boundary chunks appears live in exactly
  one run, so the point-keyed gradient reduction stays exact.

  point_offsets is None in the result (the mapper's per-point counts are
  stale after truncation); the gradient reduction recovers its block
  offsets from the sorted keys (_sort_and_segment), so reduce_capacity
  compaction is unnecessary — the stream is already compact.

  Returns (truncated mapping, truncated (n_tiles,) bool marking tiles
  that lost chunks — rasterize_with_tiles checks those saturated within
  their kept run and flags bin_overflow otherwise — and drift_overflow
  () bool: the kept chunks exceeded visit_capacity, so runs were
  clamped/cropped beyond the per-tile saturation fronts). The result's
  own overflow flag is mapping.overflow | drift_overflow (the standard
  "valid but incomplete" contract); rasterize_with_tiles' bin_overflow
  deliberately excludes the PRE-EXISTING mapping.overflow so a scene
  whose footprints were already cropped (a condition the caller can
  read off the input mapping) does not mask truncation validity.
  """
  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  n_tiles = starts.shape[0]
  n = mapping.point_sentinel
  k_cap = mapping.overlap_to_point.shape[0]
  n_chunks = k_cap // g
  assert visit_capacity % g == 0 and visit_capacity > 0
  cap_chunks = visit_capacity // g

  cover = _tile_cover_chunks(mapping, g)
  keep_raw = jnp.clip(jnp.minimum(cover, visit_chunks), 0, cover)
  total_keep = jnp.sum(keep_raw)
  # clamp runs into the static capacity (drift overflow -> flag + crop);
  # the clamped runs still abut: run_start[t] + keep[t] == run_start[t+1]
  run_start = jnp.minimum(jnp.cumsum(keep_raw) - keep_raw, cap_chunks)
  keep = jnp.minimum(keep_raw, cap_chunks - run_start)
  drift_overflow = total_keep > cap_chunks

  # owner[c] = tile whose run covers dst chunk c (runs abut -> cummax)
  tid = jnp.arange(n_tiles, dtype=jnp.int32)
  owner0 = jnp.zeros((cap_chunks,), jnp.int32).at[
      jnp.where(keep > 0, run_start, cap_chunks)].max(tid, mode="drop")
  owner = jax.lax.cummax(owner0)
  dstc = jnp.arange(cap_chunks, dtype=jnp.int32)
  j = dstc - jnp.take(run_start, owner)
  valid = (dstc < jnp.minimum(total_keep, cap_chunks)) \
      & (j < jnp.take(keep, owner))
  src_chunk = jnp.where(valid, jnp.take(starts // g, owner) + j, 0)

  o2p_c = jnp.take(mapping.overlap_to_point.reshape(n_chunks, g),
                   src_chunk, axis=0)                     # (cap_chunks, g)
  lane = jnp.arange(g, dtype=jnp.int32)
  slot = src_chunk[:, None] * g + lane[None, :]           # src slot ids
  lo = jnp.take(starts, owner)
  hi = jnp.minimum(jnp.take(ends, owner),
                   (jnp.take(starts // g, owner) + jnp.take(keep, owner))
                   * g)
  live = valid[:, None] & (slot >= lo[:, None]) & (slot < hi[:, None])
  o2p = jnp.where(live, o2p_c, n).reshape(-1)
  tile = jnp.where(live, jnp.broadcast_to(owner[:, None], live.shape),
                   n_tiles).reshape(-1)

  new = TileMapping(
      overlap_to_point=o2p.astype(jnp.int32),
      overlap_to_tile=tile.astype(jnp.int32),
      tile_ranges=jnp.stack(
          [run_start * g, (run_start + keep) * g], axis=1).astype(jnp.int32),
      tile_shape=mapping.tile_shape,
      total_overlaps=(jnp.minimum(total_keep, cap_chunks) * g).astype(
          jnp.int32),
      overflow=mapping.overflow | drift_overflow,
      point_sentinel=n,
      point_offsets=None)
  return new, keep < cover, drift_overflow


class TruncationGuard:
  """Auto-reprobe harness for saturation-front truncation in training
  loops (the documented resize-on-overflow flow, made unskippable).

  Truncation (probe_visit_chunks + visit_chunks/visit_capacity) is exact
  only while every truncated tile saturates within its kept front; a
  drifting scene eventually violates that and the render flags
  bin_overflow. A loop that re-probes "when flagged" has already
  rendered — and would silently step on — one cropped frame. This guard
  reads the flag BEFORE the caller steps and re-probes + re-renders the
  SAME frame, so no optimizer step ever consumes a cropped render:

      guard = TruncationGuard(config)
      @functools.partial(jax.jit, static_argnames="visit_capacity")
      def frame(params, visit_chunks, visit_capacity):
          out = ... rasterize_with_tiles(..., visit_chunks=visit_chunks,
                                         visit_capacity=visit_capacity)
          return (loss, grads, ...), out.bin_overflow
      result = guard.render(points2d, mapping,
                            lambda vc, cap: frame(params, vc, cap))
      ... optimizer step on result ...

  Costs one scalar device->host readback per frame (the flag) plus one
  probe forward + re-render per reprobe. visit_capacity is a static
  (compile-time) size: the guard grows it monotonically in
  `capacity_headroom` steps so steady drift re-jits the frame rarely,
  not per-reprobe (the same policy as the mapper-capacity flow).
  """

  def __init__(self, config: RasterConfig, margin_chunks: int = 1,
               capacity_headroom: float = 1.25):
    assert config.saturation_early_exit and config.use_alpha_blending, (
        "TruncationGuard requires saturation_early_exit and alpha "
        "blending (same contract as probe_visit_chunks)")
    self.config = config
    self.margin_chunks = margin_chunks
    self.capacity_headroom = capacity_headroom
    self.visit_chunks: Optional[jax.Array] = None
    self.visit_capacity: int = 0
    self.reprobes: int = 0

  def probe(self, gaussians2d: jax.Array, mapping: TileMapping) -> None:
    """(Re)measure the saturation fronts on the current frame."""
    vc, cap = probe_visit_chunks(gaussians2d, mapping, self.config,
                                 margin_chunks=self.margin_chunks)
    g = self.config.points_per_chunk
    k_cap = mapping.overlap_to_point.shape[0]
    cap = min(round_up(int(cap * self.capacity_headroom), g), k_cap)
    self.visit_chunks = vc
    # monotone: a shrinking scene keeps the old (larger) capacity rather
    # than recompiling the frame for every probe
    self.visit_capacity = max(cap, self.visit_capacity)

  def render(self, gaussians2d: jax.Array, mapping: TileMapping,
             render_fn):
    """Render one frame with guaranteed-uncropped truncation.

    render_fn(visit_chunks, visit_capacity) must return
    (result, bin_overflow) where bin_overflow is the RasterOut /
    Rendering flag of the truncated render inside. Returns result from
    a render whose flag was clear; raises if a fresh probe of the very
    same frame still crops (impossible unless render_fn renders a
    different frame than `gaussians2d`/`mapping` — the stream-identity
    contract of probe_visit_chunks).
    """
    if self.visit_chunks is None:
      self.probe(gaussians2d, mapping)
    result, overflow = render_fn(self.visit_chunks, self.visit_capacity)
    if not bool(overflow):
      return result
    # the scene drifted past its probed front: re-probe and re-render
    # the SAME frame (never let the caller step on the cropped render)
    self.reprobes += 1
    self.probe(gaussians2d, mapping)
    result, overflow = render_fn(self.visit_chunks, self.visit_capacity)
    if bool(overflow):
      raise RuntimeError(
          "TruncationGuard: render still cropped after a fresh probe — "
          "render_fn must render exactly the frame passed to probe "
          "(same gaussians, mapping capacity, emit_tails, depth16 mode)")
    return result


def _float0_like(tree):
  return jax.tree.map(
      lambda x: np.zeros(x.shape, jax.dtypes.float0)
      if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_
      else jnp.zeros_like(x), tree)


def _forward_impl(config, compute_visibility, points, features, mapping):
  f = features.shape[1]
  combined = build_combined(points, features, mapping, config)
  iters = build_iteration_list(mapping, config.points_per_chunk)
  tiled, vis, satiters = rasterize_tiles_flat(
      combined, iters, mapping, config, f,
      compute_visibility=compute_visibility)
  if vis is None:
    vis = jnp.zeros((1, mapping.overlap_to_point.shape[0]), points.dtype)
  return combined, iters, tiled[:, :f + 1, :], vis, satiters


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _raster_core(config: RasterConfig, compute_visibility: bool,
                 vis_via_sink: bool, reduce_capacity: Optional[int],
                 points, features, heuristic_sink, visibility_sink,
                 mapping: TileMapping):
  _, _, tiled, vis, satiters = _forward_impl(
      config, compute_visibility, points, features, mapping)
  return tiled, vis, satiters


def _raster_core_fwd(config, compute_visibility, vis_via_sink,
                     reduce_capacity,
                     points, features, heuristic_sink, visibility_sink,
                     mapping):
  # the combined per-slot buffer is saved as a residual (XLA CSEs it with
  # the forward's own build): its gather costs ~6 ns/idx on TPU, so
  # re-gathering in the backward would be a large fraction of the whole
  # backward pass. satiters lets the backward skip saturated chunks.
  # `points` rides along for the per-point conic -> packed chain rule.
  combined, iters, tiled, vis, satiters = _forward_impl(
      config, compute_visibility, points, features, mapping)
  return ((tiled, vis, satiters),
          (combined, iters, tiled, satiters, mapping, points))


def _raster_core_bwd(config, compute_visibility, vis_via_sink,
                     reduce_capacity, residuals, cotangents):
  combined, iters, tiled, satiters, mapping, points = residuals
  # visibility and satiters outputs are non-differentiable
  g_tiled, _g_vis, _g_sat = cotangents

  n = mapping.point_sentinel
  f = tiled.shape[1] - 1
  dtype = combined.dtype
  f_pad = feat_rows(f)
  t = tiled.shape[0]
  p = tiled.shape[2]

  compute_heuristic = config.compute_point_heuristic
  g_tiled = g_tiled.astype(dtype)
  # E (the per-pixel replay scalar, sum_c image * grad over the real
  # rows) rides the cotangent block as channel row f+1 — one DMA per
  # tile brings both, and the matching combined row is zero so the D
  # contraction is unaffected (backward.py)
  e_row = jnp.sum(tiled * g_tiled, axis=1, keepdims=True)         # (T,1,P)
  grad_padded = jnp.concatenate(
      [g_tiled, e_row, jnp.zeros((t, f_pad - f - 2, p), dtype)], axis=1)

  gout = raster_backward_pallas(
      combined, iters, grad_padded, mapping, f=f, config=config,
      compute_point_heuristic=compute_heuristic, satiters=satiters,
      vis_row=vis_via_sink)

  # reduce only the live rows (7 point grads [+2 heuristics] [+1
  # visibility] + F feature grads, contiguous); in f32 they arrive packed
  # as bf16 pairs in u32 rows, halving the reduction sort's payloads
  live = live_grad_rows(f, compute_heuristic, vis_via_sink,
                        config.antialias)
  rows = gout[:(live + 1) // 2] if gout.dtype == jnp.uint32 else gout[:live]
  if reduce_capacity is not None:
    # saturation-aware compaction: the reduction runs over only the
    # chunks the backward replayed (per-tile pre-saturation fronts) —
    # on saturating scenes this is a small fraction of K_cap
    pid, rows = compact_visited_slots(
        rows, satiters, iters, mapping, config.points_per_chunk,
        reduce_capacity)
    per_point = _reduce_rows(rows, pid, n, live)
  else:
    per_point = _reduce_rows(rows, mapping.overlap_to_point, n, live,
                             offsets=mapping.point_offsets)

  if config.antialias:
    # eigen-form transport: rows are already packed-format gradients
    grad_points = per_point[:, :7]
    prune_scale = 1.0
    col = 7
  else:
    # conic transport (backward.py): rows are gradients w.r.t.
    # (mean, qa, qb, qc, log_pa); chain to the packed
    # (mean, axis, sigma, alpha) form per POINT (cheap N-flat math —
    # this is what lets the gather table carry 6 geometry rows)
    ax, ay = points[:, 2], points[:, 3]
    sx, sy = points[:, 4], points[:, 5]
    pa = points[:, 6]
    gmx, gmy = per_point[:, 0], per_point[:, 1]
    gqa, gqb, gqc = per_point[:, 2], per_point[:, 3], per_point[:, 4]
    glogpa = per_point[:, 5]
    isx2 = 1.0 / (sx * sx)
    isy2 = 1.0 / (sy * sy)
    d_ax = 2 * ax * isx2 * gqa + ay * (isx2 - isy2) * gqb \
        + 2 * ax * isy2 * gqc
    d_ay = 2 * ay * isy2 * gqa + ax * (isx2 - isy2) * gqb \
        + 2 * ay * isx2 * gqc
    d_sx = (-2.0 * isx2 / sx) * (gqa * ax * ax + gqb * ax * ay
                                 + gqc * ay * ay)
    d_sy = (-2.0 * isy2 / sy) * (gqa * ay * ay - gqb * ax * ay
                                 + gqc * ax * ax)
    d_alpha = jnp.where(pa > 0, glogpa / jnp.where(pa > 0, pa, 1), 0)
    grad_points = jnp.stack(
        [gmx, gmy, d_ax, d_ay, d_sx, d_sy, d_alpha], axis=1)
    # the conic backward transports col(dL_da^2); prune cost carries the
    # per-point pa^2 factor (reference backward.py:194-198). Conic
    # transport is 6 rows, so aux columns start at 6, not 7.
    prune_scale = pa * pa
    col = 6

  if compute_heuristic:
    heuristic = jnp.stack(
        [per_point[:, col] * prune_scale, per_point[:, col + 1]], axis=1)
    col += 2
  else:
    heuristic = jnp.zeros((n, 2), dtype)
  if vis_via_sink:
    vis_cot = per_point[:, col]
    col += 1
  else:
    vis_cot = jnp.zeros((n,), dtype)
  gf = per_point[:, col:col + f]

  return (grad_points, gf, heuristic, vis_cot, _float0_like(mapping))


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


def rasterize_with_tiles(
    gaussians2d: jax.Array, features: jax.Array, mapping: TileMapping,
    image_size: Tuple[int, int], config: RasterConfig,
    heuristic_sink: Optional[jax.Array] = None,
    visibility_sink: Optional[jax.Array] = None,
    impl: str = "pallas",
    max_points_per_tile: Optional[int] = None,
    reduce_capacity: Optional[int] = None,
    visit_chunks: Optional[jax.Array] = None,
    visit_capacity: Optional[int] = None,
) -> RasterOut:
  """Rasterize given precomputed tile mapping (reference
  rasterizer/function.py:96-127).

  Args:
    gaussians2d: (N, 7) packed 2D gaussians
    features: (N, F) per-point features
    mapping: result of map_to_tiles
    image_size: (width, height) -- static
    config: RasterConfig -- static; `compute_visibility` /
      `compute_point_heuristic` toggle the aux outputs
    heuristic_sink: optional (N, 2) zeros; differentiate the loss w.r.t.
      it to receive (prune_cost, split_score) as its "gradient"
    visibility_sink: optional (N,) zeros; differentiate the loss w.r.t.
      it to receive the per-point visibility as its "gradient". The
      TRAINING fast path: the visibility row rides the backward's
      gradient reduction (one extra packed payload), replacing the
      forward's separate sort + segment-sum — `out.visibility` is then
      None and the forward skips its visibility machinery entirely.
      Only meaningful when the loss is differentiated (fwd+bwd frames).
    impl: "pallas" (custom_vjp kernels) or "xla" (pure-XLA fallback;
      requires max_points_per_tile, no heuristics)
    reduce_capacity: static slot budget for the saturation-aware
      backward gradient reduction (compact_visited_slots). Size it
      with probe_reduce_capacity and re-jit; None = reduce all K_cap
      slots. Only worthwhile on saturating scenes with
      config.saturation_early_exit, and superseded by visit_chunks
      (which compacts the whole raster stage, not just the reduction).
    visit_chunks / visit_capacity: per-tile saturation-front truncation
      (probe_visit_chunks + truncate_mapping). The combined gather, both
      kernels' iteration lists, and the gradient reduction all run at
      the visited-front size instead of K_cap. Exact while every
      truncated tile still saturates within its kept front; otherwise
      RasterOut.bin_overflow is set (re-probe and re-jit).

  Returns RasterOut. `image` and `image_weight` are differentiable wrt
  gaussians2d and features (weight too — an extension over the
  reference, which marks it non-differentiable).
  """
  n, f = features.shape
  vis_via_sink = visibility_sink is not None
  compute_visibility = ((config.compute_visibility
                         or config.compute_point_heuristic)
                        and not vis_via_sink)

  truncated = None
  if visit_chunks is not None:
    if visit_capacity is None:
      raise ValueError("visit_chunks needs a static visit_capacity "
                       "(from probe_visit_chunks)")
    if impl != "pallas":
      raise ValueError("visit_chunks truncation requires impl='pallas'")
    if not (config.saturation_early_exit and config.use_alpha_blending):
      raise ValueError(
          "visit_chunks truncation is exact only where the saturation "
          "early-exit is: requires saturation_early_exit and alpha "
          "blending")
    if reduce_capacity is not None:
      raise ValueError(
          "reduce_capacity is redundant with visit_chunks: the truncated "
          "stream is already compact — pass one or the other")
    mapping, truncated, drift_overflow = truncate_mapping(
        mapping, visit_chunks, visit_capacity, config.points_per_chunk)

  if impl == "xla":
    from .xla_impl import rasterize_tiles_xla
    if max_points_per_tile is None:
      raise ValueError(
          "impl='xla' needs an explicit max_points_per_tile: the fallback "
          "materializes (tiles, max_points_per_tile) dense bins (it is a "
          "test oracle, not the production path)")
    if heuristic_sink is not None or visibility_sink is not None:
      raise ValueError(
          "impl='xla' does not support heuristic/visibility sinks — use "
          "impl='pallas', or config.compute_visibility for the forward-"
          "computed visibility")
    image, weight, vis, bin_overflow = rasterize_tiles_xla(
        gaussians2d, features, mapping, image_size, config,
        max_points_per_tile=max_points_per_tile,
        compute_visibility=compute_visibility)
    return RasterOut(image, weight, None, vis, bin_overflow)

  if heuristic_sink is None:
    heuristic_sink = jnp.zeros((n, 2), gaussians2d.dtype)
  if visibility_sink is None:
    visibility_sink = jnp.zeros((n,), gaussians2d.dtype)

  tiled, vis_slots, satiters = _raster_core(
      config, compute_visibility, vis_via_sink, reduce_capacity,
      gaussians2d, features, heuristic_sink, visibility_sink, mapping)

  if not config.use_alpha_blending:
    tiled = jax.lax.stop_gradient(tiled)

  image_full = tiles.tiles_to_image(
      tiled, mapping.tile_shape, config.tile_size, image_size)
  image = image_full[..., :f]
  weight = image_full[..., f]
  if not config.use_alpha_blending:
    weight = (weight > 0).astype(weight.dtype)

  visibility = None
  if compute_visibility:
    visibility = reduce_slots_by_point(
        jax.lax.stop_gradient(vis_slots), mapping)[:, 0]

  bin_overflow = None
  if truncated is not None:
    # a truncated tile is exact iff it saturated within its kept front
    # (the truncation then removed only chunks the early-exit would have
    # skipped, which contribute exactly zero by the blend gates). The
    # forward's SIGNED satiters carries its own saturation vote (< 0 =
    # exhausted unsaturated) — a weight-sum threshold check would drift
    # ulps from the kernel's transmittance-product vote and false-flag.
    # drift_overflow covers capacity drift (total kept chunks >
    # visit_capacity, where fully-dropped tiles never open and leave
    # uninitialized satiters). `truncated` masks empty tiles. The
    # PRE-EXISTING mapping.overflow (capacity/footprint crop of the
    # input stream) is deliberately NOT folded in: it is readable off
    # the input mapping and identical with or without truncation.
    bin_overflow = drift_overflow | jnp.any(truncated & (satiters < 0))

  return RasterOut(image, weight, None, visibility, bin_overflow)


def rasterize(gaussians2d: jax.Array, depth: jax.Array,
              features: jax.Array, image_size: Tuple[int, int],
              config: RasterConfig, use_depth16: bool = False,
              capacity: Optional[int] = None,
              **kwargs) -> RasterOut:
  """map_to_tiles + rasterize_with_tiles (reference function.py:129-161)."""
  assert gaussians2d.shape[0] == depth.shape[0] == features.shape[0], (
      f"Size mismatch: {gaussians2d.shape}, {depth.shape}, {features.shape}")
  mapping = map_to_tiles(gaussians2d, depth, image_size, config,
                         capacity=capacity, use_depth16=use_depth16)
  return rasterize_with_tiles(gaussians2d, features, mapping, image_size,
                              config, **kwargs)
