"""Pallas backward rasterizer kernel.

TPU-native redesign of the reference's hand-written backward
(/root/reference/taichi_splatting/rasterizer/backward.py) — the
performance-critical kernel of the whole framework (34% of fwd+bwd time
in the reference's profile). Differences by design:

* Same traversal as the forward (front-to-back replay), but the
  reference's per-pixel `remaining_features` buffer (backward.py:110,177)
  is replaced by two scalars per pixel: E = sum_c(final_image * grad) and
  the running inclusive sum C of w*D — see blend.chunk_alpha_grads.
  E is precomputed outside the kernel as a (T, P, 1) input so the kernel
  never transposes.
* No atomics anywhere (reference: warp shuffle -> shared-memory atomic ->
  global atomic, backward.py:204-228): each tile DMAs one combined
  gradient block per chunk — point-parameter rows, optional heuristic
  rows, then feature rows — to its range of a (rows, K_cap) buffer; a
  point-sorted prefix reduction (function.py) turns the per-slot
  gradients into per-point gradients. Bins are unpadded: boundary lanes
  are masked to zero and the chunk shared with the previous tile is
  combined read-modify-write (the grid is sequential).
* Gradients flow to the alpha/weight image as well (the reference marks
  image_alpha non-differentiable, function.py:72): the gathered feature
  rows carry a virtual all-ones channel at row F, so the alpha image is
  just another blended channel in D.
* The per-point heuristics (prune cost = sum of squared alpha-gradients,
  split score = l1 norm of the position gradient; backward.py:194-198)
  are emitted as two extra gradient rows when enabled.
* Saturation chunk skipping: the forward tracks the first chunk at which
  every pixel saturates (satchunks); later chunks have exactly-zero
  gradients by the blend gates, so the backward zero-fills their slots
  instead of replaying them (the reference's warp-vote early exit).

Per-slot gradient row layout (R = pt_rows + F_pad):
  rows [0..6]  packed point-parameter gradients
  row  [7]     zero (alignment)
  rows [8..9]  (prune_cost, split_score) when compute_point_heuristic,
               then zeros to row 15
  rows [pt_rows..]  feature gradients (row F = alpha-channel pseudo-grad,
               dropped outside)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend
from .forward import cdiv_i32, use_interpret


def grad_rows(f_pad: int, compute_point_heuristic: bool) -> int:
  return (16 if compute_point_heuristic else 8) + f_pad


def _backward_kernel(config: RasterConfig, tile_shape, f_pad: int,
                     compute_point_heuristic: bool):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  th, tw = tile_shape
  pt_rows = 16 if compute_point_heuristic else 8

  def kernel(starts_ref, ends_ref, nbwd_ref,        # scalar prefetch
             comb_hbm, grad_ref, e_ref,             # inputs
             gout_hbm,                              # output
             comb_vmem, gout_vmem, zero_vmem, rmw_vmem,  # scratch
             sem_c, sem_g, sem_z, sem_r):
    t = pl.program_id(0)
    dtype = grad_ref.dtype
    start = starts_ref[t]
    end = ends_ref[t]
    # bins are unpadded: process the chunk-aligned superset of [start,
    # end), masking boundary lanes; the shared first chunk is combined
    # read-modify-write with the previous tile's output
    fstart = (start // g) * g
    nch = jnp.where(end > start, cdiv_i32(end - fstart, g), 0)
    unaligned = start != fstart
    # chunks >= nbwd have fully saturated pixels: their gated weights and
    # gradients are exactly zero (blend.chunk_weights), so skip the
    # compute + input DMA and zero-fill their gradient slots instead
    # (the reference's warp-vote skip, reference backward.py:121-148)
    nbwd = jnp.minimum(nch, nbwd_ref[t])

    # tile-local pixel coordinates (see forward.py): identical math,
    # better f32 conditioning, and they make the pixel-moment matrix
    # tile-independent and well-scaled (px^2 <= tile_size^2)
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    origin = (((t % tw) * ts).astype(dtype), ((t // tw) * ts).astype(dtype))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    if not config.antialias:
      # pixel-moment matrix for the moment-based gradient reduction: all
      # six pdf-parameter gradient rows are per-point linear combinations
      # of the moments col(B * m), m in {1, px, py, px^2, px*py, py^2}
      # (B = dL/da_raw * alpha * pdf), so one (6, P) x (P, G) MXU matmul
      # replaces six full (P, G) gradient fields + reductions
      lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
      px_r = (lin_r % ts).astype(dtype) + 0.5
      py_r = (lin_r // ts).astype(dtype) + 0.5
      mmat = jnp.concatenate(
          [jnp.ones((1, p), dtype), px_r, py_r,
           px_r * px_r, px_r * py_r, py_r * py_r], axis=0)   # (6, P)
      basis = blend.pixel_basis(px, py)                      # (P, 8)

    grad = grad_ref[0]        # (F_pad, P): F features, alpha row, zeros
    e_col = e_ref[0]          # (P, 1)

    k_cap_total = comb_hbm.shape[1]
    two = jnp.asarray(2, jnp.int32)

    def chunk_in(c, slot):
      # prefetch may run one chunk past this bin (contiguous bins; clamped
      # at the buffer end) — its data is never used
      off = pl.multiple_of(
          jnp.minimum(fstart + c * g, k_cap_total - g), g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)], comb_vmem.at[slot], sem_c.at[slot])

    def chunk_out(c, slot):
      off = pl.multiple_of(fstart + c * g, g)
      return pltpu.make_async_copy(
          gout_vmem.at[slot], gout_hbm.at[:, pl.ds(off, g)], sem_g.at[slot])

    def rmw_in():
      off = pl.multiple_of(fstart, g)
      return pltpu.make_async_copy(
          gout_hbm.at[:, pl.ds(off, g)], rmw_vmem, sem_r)

    @pl.when(nbwd > 0)
    def _():
      chunk_in(0, 0).start()

    # the previous tile's last output chunk overlaps our first: fetch it
    # early (its write landed before the previous grid step finished)
    @pl.when((nbwd > 0) & unaligned)
    def _():
      rmw_in().start()

    def body(c, carry):
      t_carry, c_carry = carry
      slot = jax.lax.rem(c, two)

      @pl.when(c + 1 < nbwd)
      def _():
        chunk_in(c + 1, 1 - slot).start()

      chunk_in(c, slot).wait()
      # the write of chunk c-2 must land before its scratch slot is reused
      @pl.when(c >= 2)
      def _():
        chunk_out(c - 2, slot).wait()

      pts = comb_vmem[slot, 0:8, :]                   # (8, G)
      feats = comb_vmem[slot, 8:, :]                  # (F_pad, G)
      # zero-alpha the lanes outside [start, end): foreign boundary slots
      # produce exactly-zero gradients in every output row
      s_idx = fstart + c * g + lane
      mask = (s_idx >= start) & (s_idx < end)

      if config.antialias:
        pa = blend.point_row(pts, blend.ALPHA) * mask.astype(dtype)
        (pdf, d_mx, d_my, d_ax, d_ay, d_sx, d_sy) = (
            blend.chunk_pdf_with_grads(pts, px, py, True, origin=origin))
        w = blend.chunk_weights(pdf, pa, t_carry, config, blending=True)
      else:
        # coefficient-matmul alpha field (see blend.quad_coeffs): masked
        # lanes get exactly-zero alpha, hence zero gate and gradients
        coeffs = blend.quad_coeffs(pts, origin=origin, mask=mask)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        w = blend.chunk_weights_raw(a_raw, t_carry, config, blending=True)

      # D[p, g] = sum_c feats[c, g] * grad[c, p] (alpha channel included
      # via the ones row at F; padding rows are zero on both sides)
      D = jax.lax.dot_general(
          grad, feats, (((0,), (0,)), ((), ())),
          preferred_element_type=dtype,
          precision=jax.lax.Precision.HIGHEST)               # (P, G)

      ag = blend.chunk_alpha_grads(w, D, e_col, c_carry)

      def col(x):  # reduce over pixels (sublanes) -> (1, G)
        return jnp.sum(x, axis=0, keepdims=True)

      if config.antialias:
        # full per-(pixel, point) gradient fields (the antialiased pdf's
        # partials are not pixel-polynomial, so no moment shortcut)
        d_pdf = ag.dL_da_raw * pa                     # (P, G)
        gout_vmem[slot, 0:1, :] = col(d_pdf * d_mx)
        gout_vmem[slot, 1:2, :] = col(d_pdf * d_my)
        gout_vmem[slot, 2:3, :] = col(d_pdf * d_ax)
        gout_vmem[slot, 3:4, :] = col(d_pdf * d_ay)
        gout_vmem[slot, 4:5, :] = col(d_pdf * d_sx)
        gout_vmem[slot, 5:6, :] = col(d_pdf * d_sy)
        gout_vmem[slot, 6:7, :] = col(ag.dL_da_raw * pdf)
      else:
        # moment-based reduction: the six pdf-parameter rows are exact
        # per-point linear combinations of six pixel moments of
        # B = dL/da_raw * alpha * pdf = dL/da_raw * a_raw (verified
        # against the full-field formulation; u = tu/sx, v = tv/sy,
        # d = pixel - mean): col(B*dx) etc. expand via dx = px - mean_x
        # into the moments.
        B = ag.dL_da_raw * a_raw                      # (P, G)
        mom = jax.lax.dot_general(
            mmat, B, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
          precision=jax.lax.Precision.HIGHEST)             # (6, G)
        m0, mx1, my1 = mom[0:1], mom[1:2], mom[2:3]
        mxx, mxy, myy = mom[3:4], mom[4:5], mom[5:6]

        mxl = blend.point_row(pts, blend.MEAN_X) - origin[0]
        myl = blend.point_row(pts, blend.MEAN_Y) - origin[1]
        axr = blend.point_row(pts, blend.AXIS_X)
        ayr = blend.point_row(pts, blend.AXIS_Y)
        sxr = blend.point_row(pts, blend.SIGMA_X)
        syr = blend.point_row(pts, blend.SIGMA_Y)

        bdx = mx1 - mxl * m0                          # col(B * dx)
        bdy = my1 - myl * m0
        bdxx = mxx - 2 * mxl * mx1 + mxl * mxl * m0   # col(B * dx * dx)
        bdyy = myy - 2 * myl * my1 + myl * myl * m0
        bdxy = mxy - mxl * my1 - myl * mx1 + mxl * myl * m0

        isx2 = 1.0 / (sxr * sxr)
        isy2 = 1.0 / (syr * syr)
        bus = (axr * bdx + ayr * bdy) * isx2          # col(B * u / sx)
        bvs = (axr * bdy - ayr * bdx) * isy2          # col(B * v / sy)
        btutu = (axr * axr * bdxx + 2 * axr * ayr * bdxy
                 + ayr * ayr * bdyy)                  # col(B * tu^2)
        btvtv = (axr * axr * bdyy - 2 * axr * ayr * bdxy
                 + ayr * ayr * bdxx)
        btudx = axr * bdxx + ayr * bdxy               # col(B * tu * dx)
        btudy = axr * bdxy + ayr * bdyy
        btvdx = axr * bdxy - ayr * bdxx
        btvdy = axr * bdyy - ayr * bdxy

        gout_vmem[slot, 0:1, :] = axr * bus - ayr * bvs
        gout_vmem[slot, 1:2, :] = ayr * bus + axr * bvs
        gout_vmem[slot, 2:3, :] = -(btudx * isx2 + btvdy * isy2)
        gout_vmem[slot, 3:4, :] = -(btudy * isx2 - btvdx * isy2)
        gout_vmem[slot, 4:5, :] = btutu * isx2 / sxr
        gout_vmem[slot, 5:6, :] = btvtv * isy2 / syr
        # alpha row: col(dL_da_raw * pdf) = col(B) / pa = m0 / pa
        # (masked/gated lanes have B = 0, so m0 = 0 and the row is 0;
        # the sentinel's pa = 0 is guarded to 0)
        pa_r = blend.point_row(pts, blend.ALPHA)
        gout_vmem[slot, 6:7, :] = jnp.where(pa_r > 0, m0 / pa_r, 0.0)
      gout_vmem[slot, 7:8, :] = jnp.zeros((1, g), dtype)

      if compute_point_heuristic:
        # reference backward.py:194-198: per pixel aag = point_alpha *
        # dL/da_raw; prune cost = sum_p aag^2, split score =
        # sum_p |aag * dp_dmean|_1 (absolute values - no moment shortcut)
        if config.antialias:
          aag = ag.dL_da_raw * pa
          gout_vmem[slot, 8:9, :] = col(aag * aag)
          gout_vmem[slot, 9:10, :] = col(
              jnp.abs(aag * d_mx) + jnp.abs(aag * d_my))
        else:
          # aag = dL_da_raw * pa and d_m = pdf * q (q linear in tu, tv):
          # aag^2 = pa^2 * dL_da_raw^2 and |aag * d_m| = |B * q|, so the
          # pdf field itself is never materialized
          dx = px - (blend.point_row(pts, blend.MEAN_X) - origin[0])
          dy = py - (blend.point_row(pts, blend.MEAN_Y) - origin[1])
          tu = dx * axr + dy * ayr
          tv = dy * axr - dx * ayr
          qx = tu * (isx2 * axr) - tv * (isy2 * ayr)
          qy = tu * (isx2 * ayr) + tv * (isy2 * axr)
          gout_vmem[slot, 8:9, :] = (pa_r * pa_r) * col(
              ag.dL_da_raw * ag.dL_da_raw)
          gout_vmem[slot, 9:10, :] = col(
              jnp.abs(B * qx) + jnp.abs(B * qy))
        gout_vmem[slot, 10:16, :] = jnp.zeros((6, g), dtype)

      # feature gradient: dF[c, g] = sum_p grad[c, p] * weight[p, g]
      gout_vmem[slot, pt_rows:, :] = jax.lax.dot_general(
          grad, w.weight, (((1,), (0,)), ((), ())),
          preferred_element_type=dtype,
          precision=jax.lax.Precision.HIGHEST)               # (F_pad, G)

      # combine the shared boundary chunk with the previous tile's output
      # (our masked lanes are zero; its lanes carry the real values)
      @pl.when((c == 0) & unaligned)
      def _():
        rmw_in().wait()
        gout_vmem[slot] = gout_vmem[slot] + rmw_vmem[:, :]

      chunk_out(c, slot).start()
      return w.t_carry, ag.c_carry

    t0 = jnp.ones((p, 1), dtype)
    c0 = jnp.zeros((p, 1), dtype)
    jax.lax.fori_loop(0, nbwd, body, (t0, c0))

    # drain outstanding gradient writes before the next grid step reuses
    # the scratch slots
    @pl.when(nbwd >= 2)
    def _():
      chunk_out(nbwd - 2, jax.lax.rem(nbwd - 2, two)).wait()

    @pl.when(nbwd >= 1)
    def _():
      chunk_out(nbwd - 1, jax.lax.rem(nbwd - 1, two)).wait()

    # zero-fill the skipped chunks' gradient slots (the reduction reads
    # every slot in [0, total); the HBM buffer is otherwise uninitialized
    # there). A skipped *shared* first chunk is left untouched: the
    # previous tile already wrote zeros in our lanes.
    zero_vmem[...] = jnp.zeros_like(zero_vmem)
    zstart = jnp.where((nbwd == 0) & unaligned, 1, nbwd)

    def zfill(c, slot):
      off = pl.multiple_of(fstart + c * g, g)
      return pltpu.make_async_copy(
          zero_vmem, gout_hbm.at[:, pl.ds(off, g)], sem_z.at[slot])

    def zbody(c, _):
      slot = jax.lax.rem(c, two)

      @pl.when(c - 2 >= zstart)
      def _():
        zfill(c - 2, slot).wait()

      zfill(c, slot).start()
      return 0

    jax.lax.fori_loop(zstart, nch, zbody, 0)

    @pl.when(nch - 2 >= zstart)
    def _():
      zfill(nch - 2, jax.lax.rem(nch - 2, two)).wait()

    @pl.when(nch - 1 >= zstart)
    def _():
      zfill(nch - 1, jax.lax.rem(nch - 1, two)).wait()

  return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "compute_point_heuristic"))
def raster_backward_pallas(gathered: jax.Array,          # (8+F_pad, K_cap)
                           grad_padded: jax.Array,       # (T, F_pad, P)
                           e_tiles: jax.Array,           # (T, P, 1)
                           mapping: TileMapping,
                           config: RasterConfig = None,
                           compute_point_heuristic: bool = False,
                           satchunks: jax.Array = None):
  """Run the backward kernel over the mapper's unpadded abutting bins.

  grad_padded carries the feature-image cotangent rows, then the
  alpha-image cotangent row at index F, then zeros up to F_pad;
  e_tiles[t, p, 0] = sum_c final_image[t, c, p] * grad_padded[t, c, p];
  satchunks (T,) int32 is the forward's per-tile saturation chunk count
  (chunks beyond it are zero-filled, not replayed); None replays all.

  Returns the combined per-slot gradient buffer (R, K_cap) — see the
  module docstring for the row layout; reduce with the mapping's
  point-sorted permutation outside.
  """
  dtype = gathered.dtype
  ts = config.tile_size
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  p = ts * ts
  k_cap = mapping.overlap_to_point.shape[0]
  f_pad = gathered.shape[0] - 8
  rows = grad_rows(f_pad, compute_point_heuristic)

  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  if satchunks is None:
    # replay everything (the kernel clamps to each tile's chunk count)
    satchunks = jnp.full((n_tiles,), jnp.iinfo(jnp.int32).max, jnp.int32)

  kernel = _backward_kernel(config, (th, tw), f_pad, compute_point_heuristic)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(n_tiles,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((1, f_pad, p), lambda t, *_: (t, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((2, gathered.shape[0], g), dtype),  # double-buffered in
          pltpu.VMEM((2, rows, g), dtype),               # double-buffered out
          pltpu.VMEM((rows, g), dtype),                  # zero-fill block
          pltpu.VMEM((rows, g), dtype),                  # boundary-chunk RMW
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA,
      ],
  )

  gout = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((rows, k_cap), dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(starts, ends, satchunks, gathered, grad_padded, e_tiles)

  return gout
