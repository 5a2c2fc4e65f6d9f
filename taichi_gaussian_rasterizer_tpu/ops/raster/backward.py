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

Per-slot gradient rows are the LIVE rows, contiguous: 7 point-parameter
gradients, then (prune_cost, split_score) when compute_point_heuristic,
then the F feature gradients; zeros pad to a multiple of 8 rows. In f32
the rows are packed pairwise as bf16 halves of one u32 row (row i holds
live rows 2i | 2i+1): slot gradients are transport — they get summed
per point in f32 right after — so bf16 quantization costs ~0.2% relative
on individual slot contributions while halving the gradient sort's
payload columns and this kernel's output DMA.
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


def live_grad_rows(f: int, compute_point_heuristic: bool) -> int:
  """7 point-parameter rows [+2 heuristics] + F feature rows."""
  return 7 + (2 if compute_point_heuristic else 0) + f


def _backward_kernel(config: RasterConfig, tile_shape, f: int,
                     compute_point_heuristic: bool, pack_bf16: bool):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  th, tw = tile_shape

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
        w = blend.chunk_weights_raw(a_raw, t_carry, config, blending=True,
                                    cumsum_passes=1)

      # D[p, g] = sum_c feats[c, g] * grad[c, p] (alpha channel included
      # via the ones row at F; padding rows are zero on both sides)
      # gradient-grade precision: the slot gradients are bf16-packed on
      # output anyway, so 2-pass splits (exact to ~2^-17 when one side is
      # bf16-exact, ~2^-9 otherwise) are at worst transport-level noise
      D = blend.dot_split(
          grad, feats, (((0,), (0,)), ((), ())), passes=3)   # (P, G)

      ag = blend.chunk_alpha_grads(w, D, e_col, c_carry)

      def col(x):  # reduce over pixels (sublanes) -> (1, G)
        return jnp.sum(x, axis=0, keepdims=True)

      if config.antialias:
        # full per-(pixel, point) gradient fields (the antialiased pdf's
        # partials are not pixel-polynomial, so no moment shortcut)
        d_pdf = ag.dL_da_raw * pa                     # (P, G)
        rows = [col(d_pdf * d_mx),
                col(d_pdf * d_my),
                col(d_pdf * d_ax),
                col(d_pdf * d_ay),
                col(d_pdf * d_sx),
                col(d_pdf * d_sy),
                col(ag.dL_da_raw * pdf)]
      else:
        # moment-based reduction: the six pdf-parameter rows are exact
        # per-point linear combinations of six pixel moments of
        # B = dL/da_raw * alpha * pdf = dL/da_raw * a_raw (verified
        # against the full-field formulation; u = tu/sx, v = tv/sy,
        # d = pixel - mean): col(B*dx) etc. expand via dx = px - mean_x
        # into the moments.
        B = ag.dL_da_raw * a_raw                      # (P, G)
        mom = blend.dot_split(
            mmat, B, (((1,), (0,)), ((), ())), passes=3)     # (6, G)
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

        # alpha row: col(dL_da_raw * pdf) = col(B) / pa = m0 / pa
        # (masked/gated lanes have B = 0, so m0 = 0 and the row is 0;
        # the sentinel's pa = 0 is guarded to 0)
        pa_r = blend.point_row(pts, blend.ALPHA)
        rows = [axr * bus - ayr * bvs,
                ayr * bus + axr * bvs,
                -(btudx * isx2 + btvdy * isy2),
                -(btudy * isx2 - btvdx * isy2),
                btutu * isx2 / sxr,
                btvtv * isy2 / syr,
                jnp.where(pa_r > 0, m0 / pa_r, 0.0)]

      if compute_point_heuristic:
        # reference backward.py:194-198: per pixel aag = point_alpha *
        # dL/da_raw; prune cost = sum_p aag^2, split score =
        # sum_p |aag * dp_dmean|_1 (absolute values - no moment shortcut)
        if config.antialias:
          aag = ag.dL_da_raw * pa
          rows.append(col(aag * aag))
          rows.append(col(jnp.abs(aag * d_mx) + jnp.abs(aag * d_my)))
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
          rows.append((pa_r * pa_r) * col(ag.dL_da_raw * ag.dL_da_raw))
          rows.append(col(jnp.abs(B * qx) + jnp.abs(B * qy)))

      # feature gradient: dF[c, g] = sum_p grad[c, p] * weight[p, g];
      # only the F real channels are live (the virtual alpha channel's
      # pseudo-gradient is never consumed)
      featg = blend.dot_split(
          grad, w.weight, (((1,), (0,)), ((), ())), passes=3)  # (F_pad, G)
      rows.extend(featg[i:i + 1, :] for i in range(f))

      out_rows = gout_vmem.shape[1]
      if pack_bf16:
        # pack row pairs as bf16 in one u32: halves the slot-gradient
        # HBM traffic and the downstream sort's payload columns, and the
        # unpacked values are exactly bf16 so the segment-sum kernel's
        # one-hot matmul needs a single (lossless) bf16 pass
        def b16(x):
          y = x.astype(jnp.bfloat16).astype(jnp.float32)
          return jax.lax.bitcast_convert_type(y, jnp.uint32) >> 16

        zrow = jnp.zeros((1, g), dtype)
        for i in range((len(rows) + 1) // 2):
          lo = rows[2 * i + 1] if 2 * i + 1 < len(rows) else zrow
          gout_vmem[slot, i:i + 1, :] = (b16(rows[2 * i]) << 16) | b16(lo)
        n_written = (len(rows) + 1) // 2
        pad = jnp.zeros((out_rows - n_written, g), jnp.uint32)
      else:
        for i, r_val in enumerate(rows):
          gout_vmem[slot, i:i + 1, :] = r_val
        n_written = len(rows)
        pad = jnp.zeros((out_rows - n_written, g), dtype)
      if n_written < out_rows:
        gout_vmem[slot, n_written:, :] = pad

      # combine the shared boundary chunk with the previous tile's
      # output: lanes before `start` belong to previous tiles (our
      # masked lanes are exactly zero there, theirs are final values,
      # so a lane select is exact — and works on packed rows too)
      @pl.when((c == 0) & unaligned)
      def _():
        rmw_in().wait()
        prev_lane = (fstart + lane) < start            # (1, G)
        gout_vmem[slot] = jnp.where(
            jnp.broadcast_to(prev_lane, gout_vmem[slot].shape),
            rmw_vmem[:, :], gout_vmem[slot])

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
    jax.jit, static_argnames=("config", "f", "compute_point_heuristic"))
def raster_backward_pallas(gathered: jax.Array,          # (8+F_pad, K_cap)
                           grad_padded: jax.Array,       # (T, F_pad, P)
                           e_tiles: jax.Array,           # (T, P, 1)
                           mapping: TileMapping,
                           f: int = None,
                           config: RasterConfig = None,
                           compute_point_heuristic: bool = False,
                           satchunks: jax.Array = None):
  """Run the backward kernel over the mapper's unpadded abutting bins.

  grad_padded carries the feature-image cotangent rows, then the
  alpha-image cotangent row at index F, then zeros up to F_pad;
  e_tiles[t, p, 0] = sum_c final_image[t, c, p] * grad_padded[t, c, p];
  satchunks (T,) int32 is the forward's per-tile saturation chunk count
  (chunks beyond it are zero-filled, not replayed); None replays all.

  Returns the per-slot gradient buffer: live rows contiguous (see the
  module docstring), bf16-pair-packed into uint32 rows when the compute
  dtype is f32. Reduce by point outside (function.py).
  """
  dtype = gathered.dtype
  ts = config.tile_size
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  p = ts * ts
  k_cap = mapping.overlap_to_point.shape[0]
  f_pad = gathered.shape[0] - 8
  if f is None:
    f = f_pad - 1
  pack_bf16 = dtype == jnp.float32
  live = live_grad_rows(f, compute_point_heuristic)
  stored = (live + 1) // 2 if pack_bf16 else live
  rows = -(-stored // 8) * 8
  out_dtype = jnp.uint32 if pack_bf16 else dtype

  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  if satchunks is None:
    # replay everything (the kernel clamps to each tile's chunk count)
    satchunks = jnp.full((n_tiles,), jnp.iinfo(jnp.int32).max, jnp.int32)

  kernel = _backward_kernel(config, (th, tw), f, compute_point_heuristic,
                            pack_bf16)

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
          pltpu.VMEM((2, rows, g), out_dtype),           # double-buffered out
          pltpu.VMEM((rows, g), out_dtype),              # zero-fill block
          pltpu.VMEM((rows, g), out_dtype),              # boundary-chunk RMW
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA,
      ],
  )

  gout = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((rows, k_cap), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(starts, ends, satchunks, gathered, grad_padded, e_tiles)

  return gout
