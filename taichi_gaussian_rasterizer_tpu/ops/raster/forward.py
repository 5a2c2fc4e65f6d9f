"""Pallas forward rasterizer kernel.

TPU-native redesign of the reference forward kernel
(/root/reference/taichi_splatting/rasterizer/forward.py). Concept map:

| reference (CUDA/Taichi)                  | this kernel (Pallas/TPU)      |
|------------------------------------------|-------------------------------|
| thread block per tile, thread per pixel  | grid step per tile; pixels are|
| (forward.py:45-47)                       | the sublane axis, the point   |
|                                          | chunk the lane axis of (P, G) |
| shared-memory staging of point groups    | async DMA of one combined     |
| (forward.py:62-66)                       | (8+F_pad, G) chunk to VMEM    |
| sequential per-point blend loop          | exclusive cumprod of (1-a)    |
| (forward.py:96-108)                      | along lanes via a triangular  |
|                                          | matmul in log space (MXU)     |
| per-feature scalar accumulate            | (F,G)x(P,G) dot_general (MXU) |
| warp/block saturation votes              | optional chunk-granular       |
| (forward.py:70,92)                       | while_loop early exit         |
| warp-reduce + shared-mem atomics for     | per-overlap-slot visibility   |
| visibility (forward.py:116-128)          | rows DMA'd out; point-sorted  |
|                                          | prefix reduction outside      |

The kernel consumes the mapper's unpadded abutting bins: each tile
reads the chunk-aligned *superset* of its [start, end) range in whole
chunks of `config.points_per_chunk` and masks boundary lanes to
zero-alpha (an exact no-op in the blend). Per-slot outputs (visibility)
in the shared first boundary chunk are combined read-modify-write —
the grid is sequential, so the previous tile's write has landed. The
per-point HBM buffer is stored transposed (rows, K_cap) — point rows
0..7 then feature rows (with an all-ones virtual alpha channel at row
F) — so one lane-aligned DMA per chunk feeds the whole blend.

Outputs are tile-packed (T, F+1, P) with the last channel row holding
the accumulated blend weight; tiles.tiles_to_image assembles (H, W, C).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend


def use_interpret() -> bool:
  return jax.default_backend() == "cpu"


def cdiv_i32(a, b: int):
  return -(-a // b)


def round_up(a: int, b: int) -> int:
  return -(-a // b) * b


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


def feature_rows(features: jax.Array) -> jax.Array:
  """(N, F) -> (F_pad, N+1): transposed with the all-ones virtual alpha
  channel at row F (making the alpha image just another blended channel,
  and thereby differentiable), zero padding to a multiple of 8 rows, and
  the sentinel column appended."""
  n, f = features.shape
  f_pad = round_up(f + 1, 8)
  dtype = features.dtype
  feats = jnp.concatenate([
      features,
      jnp.ones((n, 1), dtype),
      jnp.zeros((n, f_pad - f - 1), dtype),
  ], axis=1)
  pad_row = jnp.zeros((1, f_pad), dtype).at[0, f].set(1.0)
  return jnp.concatenate([feats, pad_row], axis=0).T         # (F_pad, N+1)


def gather_combined(points, features, mapping):
  """One bin-ordered combined buffer (8 + F_pad, K_cap): point rows then
  feature rows — a single DMA per kernel chunk.

  Only the 7 + F live rows are gathered (gather cost on TPU scales with
  bytes as well as index count, ~1 ms/row at 3M slots); the constant
  rows — the point pad row, the all-ones virtual alpha channel, feature
  padding — are broadcast into the concat, which XLA fuses into one
  cheap bandwidth pass."""
  n, f = features.shape
  f_pad = round_up(f + 1, 8)
  dtype = points.dtype
  pad7 = jnp.asarray([[0, 0, 1, 0, 1, 1, 0]], dtype)
  live = jnp.concatenate([
      jnp.concatenate([points, pad7], axis=0),          # (N+1, 7)
      jnp.concatenate([features,
                       jnp.zeros((1, f), dtype)], axis=0),  # (N+1, F)
  ], axis=1).T                                          # (7+F, N+1)
  g = jnp.take(live, mapping.overlap_to_point, axis=1)  # (7+F, K)
  k = g.shape[1]
  # sentinel feature rows are zero but their virtual alpha must be 1 to
  # match feature_rows' pad row; the blend zeroes sentinel weights anyway,
  # so a constant ones row is exact
  return jnp.concatenate([
      g[:7],
      jnp.zeros((1, k), dtype),                         # point pad row
      g[7:],
      jnp.ones((1, k), dtype),                          # alpha ones row
      jnp.zeros((f_pad - f - 1, k), dtype),
  ], axis=0)


def _forward_kernel(config: RasterConfig, tile_shape, feature_size: int,
                    compute_visibility: bool):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  th, tw = tile_shape
  blending = config.use_alpha_blending
  # continue while any pixel's accumulated weight is below this
  stop_total = (config.saturate_threshold if blending
                else 1 - config.saturate_threshold)
  early_exit = config.saturation_early_exit and not compute_visibility

  def kernel(starts_ref, ends_ref,               # scalar prefetch (SMEM)
             comb_hbm,                           # input (ANY/HBM)
             img_ref, vis_hbm, satchunk_ref,     # outputs
             comb_vmem, vis_vmem, vis_rmw, t_vmem,    # scratch
             sem_c, sem_v, sem_vr):
    t = pl.program_id(0)
    dtype = img_ref.dtype
    start = starts_ref[t]
    end = ends_ref[t]
    # bins are unpadded: read the chunk-aligned superset, mask boundaries
    fstart = (start // g) * g
    nch = jnp.where(end > start, cdiv_i32(end - fstart, g), 0)
    unaligned = start != fstart

    # tile-local pixel coordinates + tile origin passed to the pdf: the
    # math is identical, the f32 conditioning much better (dx is O(tile)
    # instead of a difference of O(image) values)
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    origin = (((t % tw) * ts).astype(dtype), ((t // tw) * ts).astype(dtype))

    img_ref[0] = jnp.zeros((feature_size + 1, p), dtype)
    ones_row = jnp.ones((1, g), dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    if not config.antialias:
      basis = blend.pixel_basis(px, py)       # (P, 8) monomials

    k_cap_total = comb_hbm.shape[1]

    def chunk_dma(c, slot):
      # double-buffered: prefetch chunk c+1 while computing c; the
      # prefetch may run one chunk past this tile's bin — bins are
      # contiguous so it reads the next tile's data (clamped at the
      # buffer end), never out of bounds
      off = pl.multiple_of(
          jnp.minimum(fstart + c * g, k_cap_total - g), g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)], comb_vmem.at[slot], sem_c.at[slot])

    # warmup prefetch (balanced: every started DMA is waited in a body)
    @pl.when(nch > 0)
    def _():
      chunk_dma(0, 0).start()

    def lane_mask(c):
      # lanes of this chunk outside [start, end) are zero-alpha'd: foreign
      # (adjacent-tile) slots in boundary chunks become exact no-ops
      s = fstart + c * g + lane
      return (s >= start) & (s < end)

    def compute_chunk(c, t_carry, pts, feats):

      if config.antialias:
        pdf = blend.chunk_pdf(pts, px, py, True, origin=origin)   # (P, G)
        pa = (blend.point_row(pts, blend.ALPHA)
              * lane_mask(c).astype(dtype))
        w = blend.chunk_weights(pdf, pa, t_carry, config,
                                blending=blending)
      else:
        # log(pa * pdf) is quadratic in pixel coords: one MXU matmul of
        # the pixel-monomial basis with per-point coefficients replaces
        # the per-(pixel, point) pdf field math (blend.quad_coeffs)
        coeffs = blend.quad_coeffs(pts, origin=origin, mask=lane_mask(c))
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        w = blend.chunk_weights_raw(a_raw, t_carry, config,
                                    blending=blending)

      img = blend.dot_split(
          feats, w.weight, (((1,), (1,)), ((), ())), passes=3)  # (F_pad, P)

      if blending:
        # the ones-channel at row F yields the alpha image for free
        img_ref[0] += img[:feature_size + 1, :]
      else:
        alpha_row = blend.dot_split(
            ones_row, w.a_eff * w.t_excl,
            (((1,), (1,)), ((), ())), passes=3)         # (1, P)
        img_ref[0, :feature_size, :] += img[:feature_size, :]
        img_ref[0, feature_size:, :] += alpha_row

      if compute_visibility:
        off = pl.multiple_of(fstart + c * g, g)
        vis_row = jnp.sum(w.weight, axis=0, keepdims=True)
        # the first chunk of an unaligned bin is shared with the previous
        # tile's last chunk: read-modify-write (sequential grid — the
        # previous tile's write has landed; masked lanes contribute 0)
        rmw = (c == 0) & unaligned

        @pl.when(rmw)
        def _():
          cp_r = pltpu.make_async_copy(
              vis_hbm.at[:, pl.ds(off, g)], vis_rmw, sem_vr)
          cp_r.start()
          cp_r.wait()

        vis_vmem[:, :] = jnp.where(rmw, vis_rmw[:, :] + vis_row, vis_row)
        cp_v = pltpu.make_async_copy(
            vis_vmem, vis_hbm.at[:, pl.ds(off, g)], sem_v)
        cp_v.start()
        cp_v.wait()

      return w.t_carry

    def body_db(c, t_carry):
      # double-buffered: prefetch chunk c+1 while computing c
      slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

      @pl.when(c + 1 < nch)
      def _():
        chunk_dma(c + 1, 1 - slot).start()

      chunk_dma(c, slot).wait()
      return compute_chunk(c, t_carry,
                           comb_vmem[slot, 0:8, :], comb_vmem[slot, 8:, :])

    # satchunk_ref[t] = number of chunks the backward must replay: chunks
    # past the first one where every pixel saturates have exactly-zero
    # gated weights and gradients (blend.chunk_weights), so the backward
    # can skip them (the reference's warp-vote early exit,
    # /root/reference/taichi_splatting/rasterizer/backward.py:121-148).
    t0 = jnp.ones((p, 1), dtype)
    if early_exit:
      # saturation skip that keeps the fori pipeline: a data-dependent
      # while_loop serializes every iteration on the scalar saturation
      # reduce (measured SLOWER than no exit at all, even at 74%
      # saturated chunks — 66.6 vs 63.4 ms), so instead the loop always
      # runs and DMAs (8 KB/chunk, bandwidth noise) but branches out the
      # blend compute once saturated — the (P, G) field math is ~all of
      # the per-chunk cost.
      # the transmittance carry lives in VMEM scratch so the whole blend
      # compute (which also mutates img_ref) can sit under pl.when
      t_vmem[...] = t0

      def body_skip(c, sat):
        slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

        @pl.when(c + 1 < nch)
        def _():
          chunk_dma(c + 1, 1 - slot).start()

        chunk_dma(c, slot).wait()

        @pl.when(sat == nch)
        def _():
          t_vmem[...] = compute_chunk(c, t_vmem[...],
                                      comb_vmem[slot, 0:8, :],
                                      comb_vmem[slot, 8:, :])

        saturated = jnp.max(t_vmem[...]) <= 1 - stop_total
        return jnp.where((sat == nch) & saturated, c + 1, sat)

      sat = jax.lax.fori_loop(0, nch, body_skip, nch)
      satchunk_ref[t] = sat
    else:
      def body_sat(c, carry):
        t_carry, sat = carry
        t_new = body_db(c, t_carry)
        saturated = jnp.max(t_new) <= 1 - stop_total
        sat = jnp.where((sat == nch) & saturated, c + 1, sat)
        return t_new, sat

      _, sat = jax.lax.fori_loop(0, nch, body_sat, (t0, nch))
      satchunk_ref[t] = sat

  return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "compute_visibility"))
def rasterize_tiles_pallas(points: jax.Array, features: jax.Array,
                           mapping: TileMapping,
                           config: RasterConfig,
                           compute_visibility: bool = False):
  """Pallas forward pass over the mapper's unpadded abutting tile bins.

  Returns (tiled image (T, F+1, P) with the blend weight in the last row,
  visibility-per-overlap-slot (1, K_cap) or None). function.py assembles
  the user-facing outputs.
  """
  n, f = features.shape
  dtype = points.dtype
  ts = config.tile_size
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  p = ts * ts
  k_cap = mapping.overlap_to_point.shape[0]
  f_pad = round_up(f + 1, 8)

  gathered = gather_combined(points, features, mapping)  # (8+F_pad, K_cap)

  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]

  kernel = _forward_kernel(config, (th, tw), f, compute_visibility)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(n_tiles,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=[
          pl.BlockSpec((1, f + 1, p), lambda t, *_: (t, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile scalar
      ],
      scratch_shapes=[
          pltpu.VMEM((2, 8 + f_pad, g), dtype),   # double-buffered chunks
          pltpu.VMEM((1, g), dtype),
          pltpu.VMEM((1, g), dtype),              # boundary-chunk RMW
          pltpu.VMEM((p, 1), dtype),              # early-exit t carry
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
      ],
  )

  tiled, vis, satchunks = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=(
          jax.ShapeDtypeStruct((n_tiles, f + 1, p), dtype),
          jax.ShapeDtypeStruct((1, k_cap), dtype),
          jax.ShapeDtypeStruct((n_tiles,), jnp.int32),
      ),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(starts, ends, gathered)

  return tiled, (vis if compute_visibility else None), satchunks
