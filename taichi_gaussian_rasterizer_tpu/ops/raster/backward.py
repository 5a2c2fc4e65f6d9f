"""Pallas backward rasterizer kernel (flat iteration form).

TPU-native redesign of the reference's hand-written backward
(/root/reference/taichi_splatting/rasterizer/backward.py) — the
performance-critical kernel of the whole framework (34% of fwd+bwd time
in the reference's profile). Differences by design:

* Same flat (tile, chunk) iteration structure as the forward (flat.py):
  one grid step, depth-4 ring input DMA, per-tile cotangent blocks
  (grad, E) double-buffered with next-tile prefetch, per-chunk gradient
  blocks assembled in VMEM (boundary-duplicate lanes merged by masked
  writes) and flushed once per chunk — no atomics (reference: warp
  shuffle -> shared-memory atomic -> global atomic, backward.py:204-228)
  and no HBM read-modify-write.
* Front-to-back replay without the reference's per-pixel
  `remaining_features` buffer (backward.py:110,177): two scalars per
  pixel — E = sum_c(final_image * grad) precomputed per tile, and the
  running inclusive sum C of w*D — see blend.chunk_alpha_grads.
* Moment-based gradient reduction (non-antialias): all six pdf-parameter
  gradient rows are per-point linear combinations of six pixel moments
  of B = dL/da_raw * a_raw, so one (6, P) x (P, G) MXU matmul replaces
  six full (P, G) gradient fields + reductions. The per-slot buffer's
  point rows are tile-local (flat.build_combined), so the moment algebra
  needs no origin handling.
* Gradients flow to the alpha/weight image as well (the reference marks
  image_alpha non-differentiable): the feature block carries a virtual
  all-ones channel whose cotangent rides the same math.
* Per-point heuristics (prune cost, split score; reference
  backward.py:194-198) are two extra gradient rows when enabled.
* Saturation skipping: iterations at or past the forward's per-tile
  saturation count have exactly-zero gradients by the blend gates; the
  kernel skips their compute and leaves their (pre-zeroed) lanes in the
  chunk block — replacing round-2's separate zero-fill DMA pass.

Per-slot gradient rows are the LIVE rows, contiguous: 7 point-parameter
gradients, then (prune_cost, split_score) when compute_point_heuristic,
then the F feature gradients; zeros pad to a multiple of 8 rows. In f32
the rows are packed pairwise as bf16 halves of one u32 row (row i holds
live rows 2i | 2i+1) unless config.exact_slot_gradients: slot gradients
are transport — they get summed per point in f32 right after — so bf16
quantization costs ~0.2% relative on individual slot contributions while
halving the gradient sort's payload columns and this kernel's output
DMA.
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
                   combined_rows, feat_rows, iteration_capacity,
                   pack_iters, round_up, unpack_iters)
from .forward import DMA_DEPTH, rem, use_interpret


def live_grad_rows(f: int, compute_point_heuristic: bool,
                   vis_row: bool = False, antialias: bool = False) -> int:
  """Point-parameter rows (7 eigen-form for antialias, 6 conic-transport
  otherwise) [+2 heuristics] [+1 visibility] + F feature rows."""
  return ((7 if antialias else 6)
          + (2 if compute_point_heuristic else 0) + int(vis_row) + f)


def next_nonempty_tile(tile_ranges: jax.Array) -> jax.Array:
  """(T,) int32: for each tile, the next nonempty tile after it (itself
  if none) — the backward's per-tile cotangent prefetch target."""
  n_tiles = tile_ranges.shape[0]
  idx = jnp.arange(n_tiles, dtype=jnp.int32)
  nonempty = tile_ranges[:, 1] > tile_ranges[:, 0]
  cand = jnp.where(nonempty, idx, jnp.iinfo(jnp.int32).max)
  nxt = jax.lax.associative_scan(jnp.minimum, cand[::-1])[::-1]
  nxt = jnp.concatenate([nxt[1:], jnp.full((1,), jnp.iinfo(jnp.int32).max,
                                           jnp.int32)])
  return jnp.where(nxt == jnp.iinfo(jnp.int32).max, idx, nxt)


def _backward_kernel(config: RasterConfig, f: int,
                     compute_point_heuristic: bool, pack_bf16: bool,
                     out_rows: int, vis_row: bool = False,
                     derive_nbwd: bool = False, pack=("nc", 1)):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk

  def kernel(niter_ref, *args):
    # Scalar-prefetch SMEM budget (~1 MB) binds at 4096px/49k tiles:
    # the iteration list arrives packed one int32 per entry
    # (flat.pack_iters mode `pack`); starts_ref is (n_tiles+1,) (bins
    # abut, ends[t] == starts[t+1]); with derive_nbwd the per-tile
    # replay count is computed from the bin instead of prefetched
    # (saturation_early_exit=False produces no satiters):
    # nbwd = cdiv(end - align_down(start, g), g).
    args = list(args)
    it_ref = args.pop(0)
    starts_ref = args.pop(0)
    iter_tile, iter_off = unpack_iters(pack, g, it_ref, starts_ref)
    nbwd_ref = None if derive_nbwd else args.pop(0)
    (tnext_ref, comb_hbm, grad_hbm, gout_hbm,
     comb_vmem, grad_vmem, e_vmem, gout_vmem,
     t_vmem, c_vmem, goff_hist, sem_c, sem_ge, sem_g) = args

    def tile_nbwd(t):
      if derive_nbwd:
        start = starts_ref[t]
        end = starts_ref[t + 1]
        return -((-(end - (start // g) * g)) // g)
      return nbwd_ref[t]
    dtype = comb_vmem.dtype
    n_iter = niter_ref[0]
    out_dtype = gout_vmem.dtype

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)

    if not config.antialias:
      # pixel-moment matrix (see module docstring): moments of
      # B = dL/da_raw * a_raw against [1, px, py, px^2, px*py, py^2]
      lin_r = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
      px_r = (lin_r % ts).astype(dtype) + 0.5
      py_r = (lin_r // ts).astype(dtype) + 0.5
      mmat = jnp.concatenate(
          [jnp.ones((1, p), dtype), px_r, py_r,
           px_r * px_r, px_r * py_r, py_r * py_r], axis=0)   # (6, P)
      basis = blend.pixel_basis(px, py)                      # (P, 8)

    def chunk_dma(i, slot):
      off = pl.multiple_of(iter_off(i), g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)], comb_vmem.at[slot], sem_c.at[slot])

    def grad_dma(t, slot):
      return pltpu.make_async_copy(
          grad_hbm.at[t], grad_vmem.at[slot], sem_ge.at[slot])

    def gout_flush(off, slot):
      off = pl.multiple_of(off, g)   # chunk offsets are g-aligned
      return pltpu.make_async_copy(
          gout_vmem.at[slot], gout_hbm.at[:, pl.ds(off, g)],
          sem_g.at[slot])

    for d in range(DMA_DEPTH - 1):
      @pl.when(d < n_iter)
      def _(d=d):
        chunk_dma(d, d).start()

    # warm up the per-tile cotangent pipeline for the first tile
    @pl.when(n_iter > 0)
    def _():
      t0 = iter_tile(0)
      grad_dma(t0, 0).start()

    def body(i, carry):
      t_prev, k_open, c_local, nbwd, goff_prev, g_open = carry
      t = iter_tile(i)
      off = iter_off(i)
      slot = rem(i, DMA_DEPTH)

      @pl.when(i + DMA_DEPTH - 1 < n_iter)
      def _():
        chunk_dma(i + DMA_DEPTH - 1,
                  rem(i + DMA_DEPTH - 1, DMA_DEPTH)).start()

      new_tile = t != t_prev

      # ---- open tile t: wait its cotangents, prefetch the next tile's --
      @pl.when(new_tile)
      def _():
        islot_new = rem(k_open, 2)
        grad_dma(t, islot_new).wait()

        tn = tnext_ref[t]

        @pl.when(tn != t)
        def _():
          grad_dma(tn, 1 - islot_new).start()

        # E rides the cotangent block as channel row f+1 (function.py);
        # reshape the (1, P) row to the (P, 1) column the blend math uses
        e_vmem[islot_new] = grad_vmem[islot_new, f + 1:f + 2, :].reshape(p, 1)

        t_vmem[...] = jnp.ones((p, 1), dtype)
        c_vmem[...] = jnp.zeros((p, 1), dtype)

      k_open = jnp.where(new_tile, k_open + 1, k_open)
      c_local = jnp.where(new_tile, 0, c_local + 1)
      nbwd = jnp.where(new_tile, tile_nbwd(t), nbwd)
      islot = rem(k_open - 1, 2)

      # ---- open/flush the gradient output chunk ------------------------
      new_chunk = off != goff_prev

      @pl.when(new_chunk)
      def _():
        gslot_new = rem(g_open, 2)

        @pl.when(g_open >= 1)
        def _():
          gout_flush(goff_prev, 1 - gslot_new).start()

        @pl.when(g_open >= 2)
        def _():
          gout_flush(goff_hist[gslot_new], gslot_new).wait()

        goff_hist[gslot_new] = off
        gout_vmem[gslot_new] = jnp.zeros((out_rows, g), out_dtype)

      g_open = jnp.where(new_chunk, g_open + 1, g_open)
      goff_prev = off
      gslot = rem(g_open - 1, 2)

      chunk_dma(i, slot).wait()

      # ---- gradient compute (skipped at/past the forward's saturation
      # point: gradients there are exactly zero by the blend gates) ------
      def compute():
        start = starts_ref[t]
        end = starts_ref[t + 1]
        s_idx = off + lane
        maskb = (s_idx >= start) & (s_idx < end)
        mask = maskb.astype(dtype)
        t_carry = t_vmem[...]
        c_carry = c_vmem[...]
        grad = grad_vmem[islot]      # (F_pad, P)
        e_col = e_vmem[islot]        # (P, 1)
        pts = comb_vmem[slot, POINT_ROWS, :]
        feats = comb_vmem[slot, FEAT_ROW0:, :]

        if config.antialias:
          pa = blend.point_row(pts, blend.ALPHA) * mask
          (pdf, d_mx, d_my, d_ax, d_ay, d_sx, d_sy) = (
              blend.chunk_pdf_with_grads(pts, px, py, True))
          w = blend.chunk_weights(pdf, pa, t_carry, config, blending=True)
        else:
          coeffs = comb_vmem[slot, COEFF_ROWS, :]
          a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs)) * mask
          w = blend.chunk_weights_raw(a_raw, t_carry, config,
                                      blending=True, cumsum_passes=1)

        # 1/(1 - a_eff) from the weights' log1m (the VPU's exp is
        # cheaper than its divide, and log1m is already in flight)
        recip = jnp.exp(-w.log1m)

        # D[p, g] = sum_c feats[c, g] * grad[c, p] (alpha channel via the
        # ones row; padding rows zero on both sides). Gradient-grade
        # precision: slot gradients are bf16-packed on output anyway, so
        # 2 passes (grad split exactly, feats one bf16 pass ~2^-9)
        # suffice — one MXU pass saved per chunk.
        D = blend.dot_split(
            grad, feats, (((0,), (0,)), ((), ())),
            passes=2 if pack_bf16 else 3)                # (P, G)

        # the fused-B path needs dL_da_raw for nothing; heuristics and
        # antialias do (prune row / pdf-parameter products)
        need_dl_da = config.antialias or compute_point_heuristic
        if need_dl_da:
          ag = blend.chunk_alpha_grads(w, D, e_col, c_carry, recip=recip)
        else:
          bg = blend.chunk_B_grads(w, D, e_col, c_carry, recip)

        def col(x):  # reduce over pixels (sublanes) -> (1, G)
          return jnp.sum(x, axis=0, keepdims=True)

        if config.antialias:
          d_pdf = ag.dL_da_raw * pa                     # (P, G)
          rows = [col(d_pdf * d_mx),
                  col(d_pdf * d_my),
                  col(d_pdf * d_ax),
                  col(d_pdf * d_ay),
                  col(d_pdf * d_sx),
                  col(d_pdf * d_sy),
                  col(ag.dL_da_raw * pdf)]
        else:
          # moment-based reduction in CONIC form (round-3b layout; see
          # flat.py): log a = log_pa - d^T Q d / 2, so the per-slot
          # transport gradients are simple central moments of
          # B = dL/da_raw * a_raw (d = pixel - mean):
          #   d log a/d mean = Q d        -> rows Q [bdx; bdy]
          #   d log a/d qa   = -dx^2 / 2  -> row -bdxx / 2
          #   d log a/d qb   = -dx dy     -> row -bdxy
          #   d log a/d qc   = -dy^2 / 2  -> row -bdyy / 2
          #   d log a/d logpa = 1         -> row m0
          # function.py chains (Q, log_pa) gradients to the packed
          # (axis, sigma, alpha) form per POINT after the reduction.
          B = ag.dL_da_raw * a_raw if need_dl_da else bg.B  # (P, G)
          # 2 passes: the monomial operand splits EXACTLY into hi+lo
          # bf16 halves (values like 240.25 need 11 mantissa bits), so
          # the only loss is one bf16 cast of B (~2^-9, transport-grade)
          mom = blend.dot_split(
              mmat, B, (((1,), (0,)), ((), ())),
              passes=2 if pack_bf16 else 3)                    # (6, G)
          m0, mx1, my1 = mom[0:1], mom[1:2], mom[2:3]
          mxx, mxy, myy = mom[3:4], mom[4:5], mom[5:6]

          mxl = blend.point_row(pts, 0)                 # tile-local mean
          myl = blend.point_row(pts, 1)
          qa = blend.point_row(pts, 2)
          qb = blend.point_row(pts, 3)
          qc = blend.point_row(pts, 4)

          bdx = mx1 - mxl * m0                          # col(B * dx)
          bdy = my1 - myl * m0
          bdxx = mxx - 2 * mxl * mx1 + mxl * mxl * m0   # col(B * dx * dx)
          bdyy = myy - 2 * myl * my1 + myl * myl * m0
          bdxy = mxy - mxl * my1 - myl * mx1 + mxl * myl * m0

          rows = [qa * bdx + qb * bdy,                  # d/d mean_x
                  qb * bdx + qc * bdy,                  # d/d mean_y
                  -0.5 * bdxx,                          # d/d qa
                  -bdxy,                                # d/d qb
                  -0.5 * bdyy,                          # d/d qc
                  m0]                                   # d/d log_pa

        if compute_point_heuristic:
          # reference backward.py:194-198: per pixel aag = point_alpha *
          # dL/da_raw; prune cost = sum_p aag^2, split score =
          # sum_p |aag * dp_dmean|_1
          if config.antialias:
            aag = ag.dL_da_raw * pa
            rows.append(col(aag * aag))
            rows.append(col(jnp.abs(aag * d_mx) + jnp.abs(aag * d_my)))
          else:
            # prune cost transports col(dL_da^2); the per-point pa^2
            # factor is applied after the reduction (function.py) —
            # pa is not in the conic point rows
            dx = px - mxl
            dy = py - myl
            qx = qa * dx + qb * dy                      # (Q d)_x
            qy = qb * dx + qc * dy
            rows.append(col(ag.dL_da_raw * ag.dL_da_raw))
            rows.append(col(jnp.abs(B * qx) + jnp.abs(B * qy)))

        if vis_row:
          # per-slot visibility (sum of replayed blend weights over
          # pixels) rides the gradient reduction as one more row —
          # delivered as the visibility sink's cotangent, replacing the
          # forward path's separate sort + segment-sum (function.py)
          rows.append(col(w.weight))

        # feature gradient: dF[c, g] = sum_p grad[c, p] * weight[p, g];
        # 1 pass — the result is immediately quantized to a bf16 pair,
        # so extra MXU passes buy precision the output cannot hold
        featg = blend.dot_split(
            grad, w.weight, (((1,), (0,)), ((), ())),
            passes=3 if not pack_bf16 else 1)            # (F_pad, G)
        rows.extend(featg[i2:i2 + 1, :] for i2 in range(f))

        if pack_bf16:
          # pack row pairs as bf16 in one u32: halves the slot-gradient
          # HBM traffic and the downstream sort's payload columns; the
          # unpacked halves are exactly bf16 so the segment-sum kernel's
          # one-hot matmul needs a single (lossless) bf16 pass
          def b16(x):
            y = x.astype(jnp.bfloat16).astype(jnp.float32)
            return jax.lax.bitcast_convert_type(y, jnp.uint32) >> 16

          zrow = jnp.zeros((1, g), dtype)
          stored_rows = []
          for i2 in range((len(rows) + 1) // 2):
            lo = rows[2 * i2 + 1] if 2 * i2 + 1 < len(rows) else zrow
            stored_rows.append((b16(rows[2 * i2]) << 16) | b16(lo))
        else:
          stored_rows = rows
        block = jnp.concatenate(
            stored_rows
            + [jnp.zeros((out_rows - len(stored_rows), g), out_dtype)],
            axis=0)
        # lanes outside [start, end) belong to the adjacent tile's
        # iteration over this shared chunk — keep their existing values
        # (pre-zeroed at chunk open, possibly already written)
        gout_vmem[gslot] = jnp.where(
            jnp.broadcast_to(maskb, (out_rows, g)), block,
            gout_vmem[gslot])

        t_vmem[...] = w.t_carry
        c_vmem[...] = ag.c_carry if need_dl_da else bg.c_carry

      # Skipped (post-saturation) iterations leave their pre-zeroed lanes
      # in the chunk block — zero gradients, exact by the blend gates.
      # Unlike the forward (where the heavy-body pl.when costs ~180
      # ns/entry of pipeline stall — PERF.md round-3c), the backward is
      # measurably FASTER with the conditional even when never taken
      # (32.5 vs 35.0 ms A/B on a never-saturating 1M scene: the region
      # split helps Mosaic's scheduling of the larger body), so the skip
      # stays unconditional here regardless of saturation_early_exit.
      pl.when(c_local < nbwd)(compute)

      return (t, k_open, c_local, nbwd, goff_prev, g_open)

    init = (jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32))
    t_prev, k_open, c_local, nbwd, goff_prev, g_open = (
        jax.lax.fori_loop(0, n_iter, body, init))

    # ---- drain ----------------------------------------------------------
    @pl.when(g_open >= 1)
    def _():
      last = rem(g_open - 1, 2)
      gout_flush(goff_prev, last).start()
      gout_flush(goff_prev, last).wait()

    @pl.when(g_open >= 2)
    def _():
      other = rem(g_open, 2)
      gout_flush(goff_hist[other], other).wait()

    # the last tile's redundant self-prefetch (tnext == t) was never
    # started; the outstanding prefetch, if any, targeted tnext[t_prev]
    # != t_prev and was waited when that tile opened — except the final
    # prefetch issued at the last OPEN, which targets a tile never
    # opened. Wait it here so no DMA outlives the kernel.
    @pl.when(k_open >= 1)
    def _():
      tn = tnext_ref[t_prev]

      @pl.when(tn != t_prev)
      def _():
        pslot = rem(k_open, 2)
        grad_dma(tn, pslot).wait()

  return kernel


@functools.partial(
    jax.jit, static_argnames=("config", "f", "compute_point_heuristic",
                              "vis_row"))
def raster_backward_pallas(combined: jax.Array,       # (R_in, K_cap)
                           iters: IterationList,
                           grad_padded: jax.Array,    # (T, F_pad, P)
                           mapping: TileMapping,
                           f: int = None,
                           config: RasterConfig = None,
                           compute_point_heuristic: bool = False,
                           satiters: jax.Array = None,
                           vis_row: bool = False):
  """Run the flat backward kernel over the mapper's abutting bins.

  combined is flat.build_combined's per-slot buffer (shared with the
  forward as the vjp residual); grad_padded carries the feature-image
  cotangent rows, the alpha-image cotangent row at index F, the per-pixel
  replay scalar E = sum_c final_image[t, c, p] * grad[t, c, p] at index
  F + 1 (the matching combined row is zero, so E never contaminates the
  D contraction), then zeros up to F_pad = flat.feat_rows(F); satiters
  (T,) int32 is the forward's per-tile saturation count (iterations
  at/past it are skipped — exact); None replays everything.

  Returns the per-slot gradient buffer: live rows contiguous (see the
  module docstring), bf16-pair-packed into uint32 rows when the compute
  dtype is f32 and config.exact_slot_gradients is False. Reduce by point
  outside (function.py).
  """
  dtype = combined.dtype
  g = config.points_per_chunk
  th, tw = mapping.tile_shape
  n_tiles = th * tw
  k_cap = mapping.overlap_to_point.shape[0]
  assert combined.shape[0] == combined_rows(f)
  pack_bf16 = dtype == jnp.float32 and not config.exact_slot_gradients
  live = live_grad_rows(f, compute_point_heuristic, vis_row,
                        config.antialias)
  stored = (live + 1) // 2 if pack_bf16 else live
  rows = round_up(stored, 8)
  out_dtype = jnp.uint32 if pack_bf16 else dtype

  derive_nbwd = satiters is None   # replay everything (no saturation data)
  tnext = next_nonempty_tile(mapping.tile_ranges)
  starts_ext = jnp.concatenate(
      [mapping.tile_ranges[:, 0], mapping.tile_ranges[-1:, 1]])
  packed, pack = pack_iters(iters, g, n_tiles, k_cap, starts_ext)

  kernel = _backward_kernel(config, f, compute_point_heuristic, pack_bf16,
                            rows, vis_row=vis_row, derive_nbwd=derive_nbwd,
                            pack=pack)

  f_pad = grad_padded.shape[1]
  p = grad_padded.shape[2]
  assert f_pad == feat_rows(f)

  n_prefetch = (2                                  # n_iter + packed iters
                + 1                                # starts_ext
                + (0 if derive_nbwd else 1)        # satiters
                + 1)                               # tnext
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=n_prefetch,
      grid=(1,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((DMA_DEPTH, combined.shape[0], g), dtype),
          pltpu.VMEM((2, f_pad, p), dtype),
          pltpu.VMEM((2, p, 1), dtype),
          pltpu.VMEM((2, rows, g), out_dtype),
          pltpu.VMEM((p, 1), dtype),
          pltpu.VMEM((p, 1), dtype),
          pltpu.SMEM((2,), jnp.int32),
          pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )

  prefetch = (iters.n_iter, packed, starts_ext)
  if not derive_nbwd:
    # satiters is SIGNED (forward.py: -v = exhausted v entries
    # unsaturated); the replay count is its magnitude
    prefetch += (jnp.abs(satiters),)
  gout = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((rows, k_cap), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(*prefetch, tnext, combined, grad_padded)

  return gout
