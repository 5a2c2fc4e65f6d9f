"""Pallas forward rasterizer kernel (flat iteration form).

TPU-native redesign of the reference forward kernel
(/root/reference/taichi_splatting/rasterizer/forward.py). Concept map:

| reference (CUDA/Taichi)                  | this kernel (Pallas/TPU)      |
|------------------------------------------|-------------------------------|
| thread block per tile, thread per pixel  | ONE grid step iterating a     |
| (forward.py:45-47)                       | flat (tile, chunk) list;      |
|                                          | pixels ride sublanes, the     |
|                                          | point chunk lanes of (P, G)   |
| shared-memory staging of point groups    | depth-4 ring of async chunk   |
| (forward.py:62-66)                       | DMAs (hides the 324 ns        |
|                                          | 2-slot DMA-latency floor)     |
| per-point pdf math per pixel thread      | precomputed per-slot quadratic|
|                                          | coefficients (flat.py); the   |
|                                          | whole (P, G) log-alpha field  |
|                                          | is one (P, 8) x (8, G) matmul |
| sequential per-point blend loop          | exclusive cumprod of (1-a)    |
| (forward.py:96-108)                      | along lanes via a triangular  |
|                                          | matmul in log space (MXU)     |
| per-feature scalar accumulate            | (F,G)x(P,G) dot_general (MXU) |
| warp/block saturation votes              | per-tile compute-skip branch  |
| (forward.py:70,92)                       | once every pixel saturates    |
| warp-reduce + shared-mem atomics for     | per-slot visibility rows      |
| visibility (forward.py:116-128)          | merged in VMEM, flushed once  |
|                                          | per chunk                     |

The kernel consumes the mapper's unpadded abutting bins through the flat
iteration list (flat.build_iteration_list): each entry is one (tile,
chunk) pair, boundary chunks shared by two tiles appearing once per
tile with lane masks. Per-tile state (image block, transmittance,
saturation count) lives in VMEM and is flushed by manual DMA when the
list moves to the next tile; per-chunk visibility rows are merged across
the boundary-duplicate pair in VMEM and flushed once per chunk (no HBM
read-modify-write anywhere).

Outputs are tile-packed (T, F_pad, P) with the accumulated blend weight
in channel row F; rows above F+1 are padding. Empty tiles are not
touched by the kernel — the caller zero-selects them (function.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend
from .flat import (COEFF_ROWS, FEAT_ROW0, POINT_ROWS, IterationList,
                   build_combined, build_iteration_list, combined_rows,
                   feat_rows, iteration_capacity, pack_iters, round_up,
                   unpack_iters)

DMA_DEPTH = 4
SAT_NONE = jnp.iinfo(jnp.int32).max


def use_interpret() -> bool:
  return jax.default_backend() == "cpu"


def cdiv_i32(a, b: int):
  return -(-a // b)


def rem(a, b: int):
  # int32-safe modulus (a python int rhs promotes to int64 under x64)
  return jax.lax.rem(a, jnp.asarray(b, jnp.int32))


def _forward_kernel(config: RasterConfig, feature_size: int,
                    compute_visibility: bool, pack=("nc", 1)):
  """pack: flat.pack_iters decode mode — ("nc", nc) or ("j15",); the
  iteration list arrives packed one int32 per entry (SMEM binds at
  4096px / 49k tiles)."""
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  blending = config.use_alpha_blending
  stop_total = (config.saturate_threshold if blending
                else 1 - config.saturate_threshold)
  early_exit = config.saturation_early_exit
  f_pad = feat_rows(feature_size)

  def kernel(niter_ref, it_ref, starts_ref,
             comb_hbm,                                  # input (ANY)
             img_hbm, vis_hbm, sat_ref,                 # outputs
             comb_vmem, img_vmem, vis_vmem, t_vmem,     # scratch
             t_hist, voff_hist,                         # SMEM scratch
             sem_c, sem_img, sem_v):
    iter_tile, iter_off = unpack_iters(pack, g, it_ref, starts_ref)

    # starts_ref is (n_tiles + 1,): bins abut, so ends[t] == starts[t+1]
    # (one n_tiles-sized SMEM array instead of two — the scalar-prefetch
    # SMEM budget binds at 4096px / 49k tiles)
    dtype = comb_vmem.dtype
    n_iter = niter_ref[0]

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    if not config.antialias:
      basis = blend.pixel_basis(px, py)                 # (P, 8) monomials
    ones_row = jnp.ones((1, g), dtype)

    def chunk_dma(i, slot):
      off = pl.multiple_of(iter_off(i), g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)], comb_vmem.at[slot], sem_c.at[slot])

    def img_flush(t, slot):
      return pltpu.make_async_copy(
          img_vmem.at[slot], img_hbm.at[t], sem_img.at[slot])

    def vis_flush(off, slot):
      off = pl.multiple_of(off, g)   # chunk offsets are g-aligned
      return pltpu.make_async_copy(
          vis_vmem.at[slot], vis_hbm.at[:, pl.ds(off, g)], sem_v.at[slot])

    for d in range(DMA_DEPTH - 1):
      @pl.when(d < n_iter)
      def _(d=d):
        chunk_dma(d, d).start()

    def body(i, carry):
      t_prev, k_open, c_local, sat_val, voff_prev, v_open = carry
      t = iter_tile(i)
      off = iter_off(i)
      slot = rem(i, DMA_DEPTH)

      @pl.when(i + DMA_DEPTH - 1 < n_iter)
      def _():
        chunk_dma(i + DMA_DEPTH - 1,
                  rem(i + DMA_DEPTH - 1, DMA_DEPTH)).start()

      new_tile = t != t_prev

      # ---- close the previous tile, open tile t -------------------------
      @pl.when(new_tile)
      def _():
        islot_new = rem(k_open, 2)

        @pl.when(k_open >= 1)
        def _():
          # per-tile saturation count for the backward's chunk skipping,
          # SIGNED: +v = saturated at entry v (replay v chunks); -v = the
          # tile exhausted all v of its entries unsaturated. The sign is
          # the exactness guard for saturation-front truncation
          # (function.truncate_mapping) — a weight-sum threshold check
          # cannot reproduce this vote (the kernel votes on the f32
          # transmittance PRODUCT, which drifts ulps from the weight sum)
          if early_exit:
            sat_ref[t_prev] = jnp.where(sat_val == SAT_NONE,
                                        -(c_local + 1), sat_val)
          img_flush(t_prev, 1 - islot_new).start()

        @pl.when(k_open >= 2)
        def _():
          img_flush(t_hist[islot_new], islot_new).wait()

        t_hist[islot_new] = t
        img_vmem[islot_new] = jnp.zeros((f_pad, p), dtype)
        t_vmem[...] = jnp.ones((p, 1), dtype)

      k_open = jnp.where(new_tile, k_open + 1, k_open)
      c_local = jnp.where(new_tile, 0, c_local + 1)
      sat_val = jnp.where(new_tile, SAT_NONE, sat_val)
      islot = rem(k_open - 1, 2)

      # ---- open/merge the visibility chunk ------------------------------
      if compute_visibility:
        new_chunk = off != voff_prev

        @pl.when(new_chunk)
        def _():
          vslot_new = rem(v_open, 2)

          @pl.when(v_open >= 1)
          def _():
            vis_flush(voff_prev, 1 - vslot_new).start()

          @pl.when(v_open >= 2)
          def _():
            vis_flush(voff_hist[vslot_new], vslot_new).wait()

          voff_hist[vslot_new] = off
          vis_vmem[vslot_new] = jnp.zeros((1, g), dtype)

        v_open = jnp.where(new_chunk, v_open + 1, v_open)
        voff_prev = off
        vslot = rem(v_open - 1, 2)

      chunk_dma(i, slot).wait()

      # ---- blend compute (skipped once the tile saturates: exact by the
      # gates — skipped chunks have exactly-zero weights/visibility) ------
      def compute():
        start = starts_ref[t]
        end = starts_ref[t + 1]
        s_idx = off + lane
        mask = ((s_idx >= start) & (s_idx < end)).astype(dtype)
        t_carry = t_vmem[...]

        if config.antialias:
          pts = comb_vmem[slot, POINT_ROWS, :]
          pdf = blend.chunk_pdf(pts, px, py, True)
          pa = blend.point_row(pts, blend.ALPHA) * mask
          w = blend.chunk_weights(pdf, pa, t_carry, config,
                                  blending=blending)
        else:
          coeffs = comb_vmem[slot, COEFF_ROWS, :]
          a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs)) * mask
          w = blend.chunk_weights_raw(a_raw, t_carry, config,
                                      blending=blending)

        img = blend.dot_split(
            comb_vmem[slot, FEAT_ROW0:, :], w.weight,
            (((1,), (1,)), ((), ())), passes=3)           # (F_pad, P)

        if blending:
          # the ones-channel at row F yields the alpha image for free
          img_vmem[islot] += img
        else:
          alpha_row = blend.dot_split(
              ones_row, w.a_eff * w.t_excl,
              (((1,), (1,)), ((), ())), passes=3)          # (1, P)
          img_vmem[islot, :feature_size, :] += img[:feature_size, :]
          img_vmem[islot, feature_size:feature_size + 1, :] += alpha_row

        if compute_visibility:
          vis_vmem[vslot] += jnp.sum(w.weight, axis=0, keepdims=True)

        t_vmem[...] = w.t_carry

      if early_exit:
        pl.when(sat_val == SAT_NONE)(compute)
        saturated = jnp.max(t_vmem[...]) <= 1 - stop_total
        sat_val = jnp.where((sat_val == SAT_NONE) & saturated,
                            c_local + 1, sat_val)
      else:
        # no saturation tracking at all: sat_val stays SAT_NONE, so the
        # per-tile satiters record the full chunk count (backward replays
        # everything — the flag is documented as only valid for scenes
        # that never saturate, where that is already the case)
        compute()
      return (t, k_open, c_local, sat_val, voff_prev, v_open)

    init = (jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(SAT_NONE, jnp.int32),
            jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32))
    t_prev, k_open, c_local, sat_val, voff_prev, v_open = (
        jax.lax.fori_loop(0, n_iter, body, init))

    # ---- drain: close the last tile / vis chunk, wait all flushes -------
    @pl.when(k_open >= 1)
    def _():
      if early_exit:
        sat_ref[t_prev] = jnp.where(sat_val == SAT_NONE,
                                    -(c_local + 1), sat_val)
      else:
        sat_ref[0] = 0   # dummy (1,) output: satiters derived downstream
      last = rem(k_open - 1, 2)
      img_flush(t_prev, last).start()
      img_flush(t_prev, last).wait()

    @pl.when(k_open >= 2)
    def _():
      other = rem(k_open, 2)
      img_flush(t_hist[other], other).wait()

    if compute_visibility:
      @pl.when(v_open >= 1)
      def _():
        last = rem(v_open - 1, 2)
        vis_flush(voff_prev, last).start()
        vis_flush(voff_prev, last).wait()

      @pl.when(v_open >= 2)
      def _():
        other = rem(v_open, 2)
        vis_flush(voff_hist[other], other).wait()

  return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "feature_size",
                              "compute_visibility"))
def rasterize_tiles_flat(combined: jax.Array, iters: IterationList,
                         mapping: TileMapping, config: RasterConfig,
                         feature_size: int,
                         compute_visibility: bool = False):
  """Flat-iteration Pallas forward over the combined per-slot buffer.

  Returns (tiled image (T, F_pad, P) with the blend weight in row F and
  empty tiles zeroed, visibility-per-slot (1, K_cap) or None, satiters
  (T,) int32 SIGNED per-tile chunk-iteration counts for the backward's
  saturation skipping: +v = saturated at entry v, -v = exhausted all v
  entries unsaturated; |satiters| is the replay count either way.
  Entries for tiles with empty bins are uninitialized SMEM — mask
  before reading).
  """
  dtype = combined.dtype
  ts = config.tile_size
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  p = ts * ts
  k_cap = mapping.overlap_to_point.shape[0]
  f_pad = feat_rows(feature_size)
  assert combined.shape == (combined_rows(feature_size), k_cap)
  assert iters.iter_tile.shape[0] == iteration_capacity(k_cap, g, n_tiles)

  # bins abut: one (n_tiles + 1,) starts array carries ends too (halves
  # the per-tile scalar-prefetch SMEM, which binds at 49k tiles)
  starts_ext = jnp.concatenate(
      [mapping.tile_ranges[:, 0], mapping.tile_ranges[-1:, 1]])
  packed, pack = pack_iters(iters, g, n_tiles, k_cap, starts_ext)
  kernel = _forward_kernel(config, feature_size, compute_visibility,
                           pack=pack)
  n_sat = n_tiles if config.saturation_early_exit else 1

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(1,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pltpu.SMEM),
      ],
      scratch_shapes=[
          pltpu.VMEM((DMA_DEPTH, combined.shape[0], g), dtype),
          pltpu.VMEM((2, f_pad, p), dtype),
          pltpu.VMEM((2, 1, g), dtype),
          pltpu.VMEM((p, 1), dtype),
          pltpu.SMEM((2,), jnp.int32),
          pltpu.SMEM((2,), jnp.int32),
          pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )

  tiled, vis, satiters = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=(
          jax.ShapeDtypeStruct((n_tiles, f_pad, p), dtype),
          jax.ShapeDtypeStruct((1, k_cap), dtype),
          jax.ShapeDtypeStruct((n_sat,), jnp.int32),
      ),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(iters.n_iter, packed, starts_ext, combined)

  # the kernel never touches empty tiles; zero-select them (one fused
  # bandwidth pass — cheaper and simpler than output aliasing)
  nonempty = mapping.tile_ranges[:, 1] > mapping.tile_ranges[:, 0]
  tiled = jnp.where(nonempty[:, None, None], tiled, 0)
  if not config.saturation_early_exit:
    satiters = None   # backward derives full replay counts from the bins
  return tiled, (vis if compute_visibility else None), satiters


@functools.partial(
    jax.jit, static_argnames=("config", "compute_visibility"))
def rasterize_tiles_pallas(points: jax.Array, features: jax.Array,
                           mapping: TileMapping,
                           config: RasterConfig,
                           compute_visibility: bool = False):
  """Forward pass from raw packed gaussians (builds the combined buffer
  and iteration list; function.py shares them with the backward).

  Returns (tiled image (T, F+1, P) with the blend weight in the last
  row, visibility-per-slot (1, K_cap) or None, satiters (T,) int32).
  """
  n, f = features.shape
  combined = build_combined(points, features, mapping, config)
  iters = build_iteration_list(mapping, config.points_per_chunk)
  tiled, vis, satiters = rasterize_tiles_flat(
      combined, iters, mapping, config, f,
      compute_visibility=compute_visibility)
  return tiled[:, :f + 1, :], vis, satiters
