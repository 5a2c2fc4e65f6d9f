"""Pallas forward rasterizer kernel.

TPU-native redesign of the reference forward kernel
(/root/reference/taichi_splatting/rasterizer/forward.py). Concept map:

| reference (CUDA/Taichi)                  | this kernel (Pallas/TPU)      |
|------------------------------------------|-------------------------------|
| thread block per tile, thread per pixel  | grid step per tile; pixels are|
| (forward.py:45-47)                       | the sublane axis, the point   |
|                                          | chunk the lane axis of (P, G) |
| shared-memory staging of point groups    | async DMA of (8, G) point and |
| (forward.py:62-66)                       | (F, G) feature chunks to VMEM |
| sequential per-point blend loop          | exclusive cumprod of (1-a)    |
| (forward.py:96-108)                      | along lanes via a triangular  |
|                                          | matmul in log space (MXU)     |
| per-feature scalar accumulate            | (F,G)x(P,G) dot_general (MXU) |
| warp/block saturation votes              | chunk-granular while_loop     |
| (forward.py:70,92)                       | condition on max transmittance|
| warp-reduce + shared-mem atomics for     | per-overlap-slot visibility   |
| visibility (forward.py:116-128)          | rows DMA'd out; segment_sum   |
|                                          | outside (no atomics)          |

The kernel consumes the mapper's chunk-aligned padded bins: every tile
processes whole chunks of `config.points_per_chunk` points; sentinel slots
hold a zero-alpha padding point and are exact no-ops, so there is no
bounds masking anywhere. All per-point HBM buffers are stored transposed
(rows, K_pad) so chunk DMAs are lane-aligned.

Outputs are tile-packed (T, F+1, P) with the last channel row holding the
accumulated blend weight (alpha image); tiles.tiles_to_image assembles
(H, W, C) outside.
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
from .xla_impl import pack_point_cols


def use_interpret() -> bool:
  return jax.default_backend() == "cpu"


def cdiv_i32(a, b: int):
  return -(-a // b)


def round_up(a: int, b: int) -> int:
  return -(-a // b) * b


def gather_transposed(points, features, mapping):
  """Build the transposed, sentinel-padded, bin-ordered point/feature
  buffers the kernels stream: ((8, K_pad), (F_pad, K_pad)).

  Feature row F is an all-ones virtual channel: blending it yields the
  alpha/weight image as just another matmul row (and makes the alpha
  image differentiable in the backward). Rows above F are zero padding
  to a sublane-aligned multiple of 8."""
  n, f = features.shape
  f_pad = round_up(f + 1, 8)
  dtype = features.dtype
  pts_cols = pack_point_cols(points)                         # (8, N+1)
  feats = jnp.concatenate([
      features,
      jnp.ones((n, 1), dtype),
      jnp.zeros((n, f_pad - f - 1), dtype),
  ], axis=1)
  # sentinel padding row: zero features (its alpha is 0 so the ones
  # channel is harmless either way)
  pad_row = jnp.zeros((1, f_pad), dtype).at[0, f].set(1.0)
  feats = jnp.concatenate([feats, pad_row], axis=0).T        # (F_pad, N+1)
  otp = mapping.overlap_to_point
  return jnp.take(pts_cols, otp, axis=1), jnp.take(feats, otp, axis=1)


def _forward_kernel(config: RasterConfig, tile_shape, feature_size: int,
                    compute_visibility: bool):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  th, tw = tile_shape
  blending = config.use_alpha_blending
  # keep blending while any pixel's accumulated weight is below this
  stop_total = (config.saturate_threshold if blending
                else 1 - config.saturate_threshold)

  def kernel(starts_ref, nchunks_ref,            # scalar prefetch (SMEM)
             pts_hbm, feats_hbm,                 # inputs (ANY/HBM)
             img_ref, vis_hbm,                   # outputs
             pts_vmem, feats_vmem, vis_vmem,     # scratch
             sem_p, sem_f, sem_v):
    t = pl.program_id(0)
    dtype = img_ref.dtype
    start = starts_ref[t]
    nch = nchunks_ref[t]

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = ((t % tw) * ts + lin % ts).astype(dtype) + 0.5
    py = ((t // tw) * ts + lin // ts).astype(dtype) + 0.5

    img_ref[0] = jnp.zeros((feature_size + 1, p), dtype)
    ones_row = jnp.ones((1, g), dtype)

    def body(carry):
      c, t_carry = carry
      # bin starts are chunk-aligned by construction (mapper relayout)
      off = pl.multiple_of(start + c * g, g)
      cp_p = pltpu.make_async_copy(
          pts_hbm.at[:, pl.ds(off, g)], pts_vmem, sem_p)
      cp_f = pltpu.make_async_copy(
          feats_hbm.at[:, pl.ds(off, g)], feats_vmem, sem_f)
      cp_p.start()
      cp_f.start()
      cp_p.wait()
      cp_f.wait()

      pts = pts_vmem[:, :]                       # (8, G)
      feats = feats_vmem[:, :]                   # (F_pad, G)

      pdf = blend.chunk_pdf(pts, px, py, config.antialias)   # (P, G)
      w = blend.chunk_weights(pdf, blend.point_row(pts, blend.ALPHA),
                              t_carry, config, blending=blending)

      img = jax.lax.dot_general(
          feats, w.weight, (((1,), (1,)), ((), ())),
          preferred_element_type=dtype)          # (F_pad, P)

      if blending:
        # the ones-channel at row F yields the alpha image for free
        img_ref[0] += img[:feature_size + 1, :]
      else:
        alpha_row = jax.lax.dot_general(
            ones_row, w.a_eff * w.t_excl, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype)        # (1, P)
        img_ref[0, :feature_size, :] += img[:feature_size, :]
        img_ref[0, feature_size:, :] += alpha_row

      if compute_visibility:
        vis_vmem[:, :] = jnp.sum(w.weight, axis=0, keepdims=True)
        cp_v = pltpu.make_async_copy(
            vis_vmem, vis_hbm.at[:, pl.ds(off, g)], sem_v)
        cp_v.start()
        cp_v.wait()

      return c + 1, w.t_carry

    def cond(carry):
      c, t_carry = carry
      not_done = c < nch
      if compute_visibility:
        # every slot must be written (the visibility buffer has no other
        # initialization), so no saturation early-exit in this mode
        return not_done
      return not_done & (jnp.max(t_carry) > 1 - stop_total)

    t0 = jnp.ones((p, 1), dtype)
    jax.lax.while_loop(cond, body, (jnp.int32(0), t0))

  return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "compute_visibility"))
def rasterize_tiles_pallas(points: jax.Array, features: jax.Array,
                           mapping: TileMapping,
                           config: RasterConfig,
                           compute_visibility: bool = False):
  """Pallas forward pass over the mapper's padded tile bins.

  Returns (tiled image (T, F+1, P) with the blend weight in the last row,
  visibility-per-overlap-slot (1, K_pad) or None). function.py assembles
  the user-facing outputs.
  """
  n, f = features.shape
  dtype = points.dtype
  ts = config.tile_size
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  p = ts * ts
  k_pad = mapping.overlap_to_point.shape[0]

  gathered_pts, gathered_feats = gather_transposed(points, features, mapping)

  starts = mapping.tile_ranges[:, 0]
  nchunks = cdiv_i32(mapping.tile_ranges[:, 1] - starts, g)

  kernel = _forward_kernel(config, (th, tw), f, compute_visibility)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(n_tiles,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=[
          pl.BlockSpec((1, f + 1, p), lambda t, *_: (t, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      scratch_shapes=[
          pltpu.VMEM((8, g), dtype),
          pltpu.VMEM((round_up(f + 1, 8), g), dtype),
          pltpu.VMEM((1, g), dtype),
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
          pltpu.SemaphoreType.DMA,
      ],
  )

  tiled, vis = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=(
          jax.ShapeDtypeStruct((n_tiles, f + 1, p), dtype),
          jax.ShapeDtypeStruct((1, k_pad), dtype),
      ),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(starts, nchunks, gathered_pts, gathered_feats)

  return tiled, (vis if compute_visibility else None)
