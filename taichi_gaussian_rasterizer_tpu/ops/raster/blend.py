"""Shared alpha-blend chunk math for the rasterizer.

This is the single source of truth for the front-to-back blend semantics,
used by the Pallas forward/backward kernels, the pure-XLA fallback
renderer, and the custom_vjp. Re-derivation of the reference kernels
(/root/reference/taichi_splatting/rasterizer/forward.py:96-114,
backward.py:159-201) in vectorized chunk form.

Orientation (TPU layout): **pixels on the sublane axis (P), points on the
lane axis (G)**. Per-point scalars are (1, G) rows (sliced from a
transposed (8, K) point buffer without relayout), per-pixel scalars are
(P, 1) columns, and all pairwise quantities are (P, G). Consequences:

* The reference's sequential per-point blend loop becomes an exclusive
  cumulative product of (1 - alpha) along the lane axis, evaluated as a
  strictly-upper-triangular (G, G) matmul in log space (MXU).
* The per-point feature blend and gradient reductions are (F, G) x (P, G)
  dot_generals contracting the shared axis — MXU, no transposes.
* Saturation is an exact gate: a point's weight is zero once the pixel's
  accumulated weight (before the point) reaches `saturate_threshold`.
  The reference gates this way in its backward (backward.py:160-166) but
  not its blending forward; we gate both so forward and custom backward
  are mutually consistent (difference from the reference forward is
  bounded by (1 - saturate_threshold) of the feature magnitude).
* The backward needs no `remaining_features` replay buffer
  (backward.py:110,177): with E = sum_c(final_image * grad_image) per
  pixel and the running inclusive cumsum C_g of w_g * D_g
  (D_g = sum_c F_g[c] * grad[c]), the alpha gradient is
  T_g * D_g - (E - C_g) / (1 - a_g) — the reference's
  feature_diff . grad in aggregate form.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...config import RasterConfig

# packed point row indices (see data_types.py packed 2D format)
MEAN_X, MEAN_Y, AXIS_X, AXIS_Y, SIGMA_X, SIGMA_Y, ALPHA = range(7)
POINT_ROWS = 8  # padded to 8 rows for sublane alignment


def point_row(pts, row):
  """(8, G) packed point buffer -> (1, G) component row."""
  return pts[row:row + 1, :]


def chunk_pdf(pts, px, py, antialias: bool, origin=(0.0, 0.0)):
  """Gaussian pdf of each (pixel, point) pair.

  pts: (8, G) packed point rows; px, py: (P, 1) pixel centers. When
  `origin` is the tile origin, px/py are tile-local (better f32
  conditioning; dx/dy are unchanged mathematically). Returns pdf (P, G).
  """
  dx = px - (point_row(pts, MEAN_X) - origin[0])  # (P, G)
  dy = py - (point_row(pts, MEAN_Y) - origin[1])
  ax = point_row(pts, AXIS_X)
  ay = point_row(pts, AXIS_Y)
  sx = point_row(pts, SIGMA_X)
  sy = point_row(pts, SIGMA_Y)

  tu = dx * ax + dy * ay                        # d . axis
  tv = dy * ax - dx * ay                        # d . perp(axis)

  if not antialias:
    u = tu / sx
    v = tv / sy
    return jnp.exp(-0.5 * (u * u + v * v))

  def S(x, s):
    z = x / s
    return jax.nn.sigmoid(1.6 * z + 0.07 * z * z * z)

  ix = sx * (S(tu + 0.5, sx) - S(tu - 0.5, sx))
  iy = sy * (S(tv + 0.5, sy) - S(tv - 0.5, sy))
  return 2.0 * jnp.pi * ix * iy


def chunk_pdf_with_grads(pts, px, py, antialias: bool, origin=(0.0, 0.0)):
  """pdf plus analytic partials wrt mean, axis, sigma.

  Returns (pdf, d_mean_x, d_mean_y, d_axis_x, d_axis_y, d_sigma_x,
  d_sigma_y), each (P, G). Hand-derived (cf. generic.py:320-336 and
  371-404) so the backward kernel avoids jax.grad inside Pallas.
  """
  dx = px - (point_row(pts, MEAN_X) - origin[0])
  dy = py - (point_row(pts, MEAN_Y) - origin[1])
  ax = point_row(pts, AXIS_X)
  ay = point_row(pts, AXIS_Y)
  sx = point_row(pts, SIGMA_X)
  sy = point_row(pts, SIGMA_Y)

  tu = dx * ax + dy * ay
  tv = dy * ax - dx * ay

  if not antialias:
    u = tu / sx
    v = tv / sy
    p = jnp.exp(-0.5 * (u * u + v * v))
    us, vs = u / sx, v / sy
    # d = pixel - mean; tu = d.axis, tv = d.perp(axis)
    d_mx = p * (us * ax - vs * ay)
    d_my = p * (us * ay + vs * ax)
    # dp/daxis = p * (-us * d + vs * perp(d)); perp(d) = (-dy, dx)
    d_ax = p * (-us * dx - vs * dy)
    d_ay = p * (-us * dy + vs * dx)
    d_sx = p * u * u / sx
    d_sy = p * v * v / sy
    return p, d_mx, d_my, d_ax, d_ay, d_sx, d_sy

  def S_grad(x, s):
    z = x / s
    sig = jax.nn.sigmoid(1.6 * z + 0.07 * z * z * z)
    ds_dz = (1.6 + 0.21 * z * z) * sig * (1 - sig)
    return sig, ds_dz / s, -(ds_dz / s) * z   # S, dS/dx, dS/dsigma

  tau = 2.0 * jnp.pi
  Sx1, dSx1, dSx1_s = S_grad(tu + 0.5, sx)
  Sx2, dSx2, dSx2_s = S_grad(tu - 0.5, sx)
  Sy1, dSy1, dSy1_s = S_grad(tv + 0.5, sy)
  Sy2, dSy2, dSy2_s = S_grad(tv - 0.5, sy)

  ix = sx * (Sx1 - Sx2)
  iy = sy * (Sy1 - Sy2)
  p = tau * ix * iy

  dpx = tau * iy * sx * (dSx1 - dSx2)   # dp/dtu
  dpy = tau * ix * sy * (dSy1 - dSy2)   # dp/dtv

  d_mx = -(dpx * ax - dpy * ay)
  d_my = -(dpx * ay + dpy * ax)
  d_ax = dpx * dx + dpy * dy
  d_ay = dpx * dy - dpy * dx
  d_sx = tau * iy * (Sx1 - Sx2 + (dSx1_s - dSx2_s) * sx)
  d_sy = tau * ix * (Sy1 - Sy2 + (dSy1_s - dSy2_s) * sy)
  return p, d_mx, d_my, d_ax, d_ay, d_sx, d_sy


def pixel_basis(px, py, dtype=None):
  """(P, 1) tile-local pixel centers -> (P, 8) quadratic monomial basis
  [px^2, py^2, px*py, px, py, 1, 0, 0] (padded to 8 for sublane
  alignment). One per kernel invocation; pairs with quad_coeffs."""
  dtype = dtype or px.dtype
  p = px.shape[0]
  one = jnp.ones((p, 1), dtype)
  zero = jnp.zeros((p, 1), dtype)
  return jnp.concatenate(
      [px * px, py * py, px * py, px, py, one, zero, zero], axis=1)


# clamp for log(alpha) of masked/sentinel lanes: large-negative but finite
# (an actual -inf would poison the coefficient matmul with 0 * -inf)
LOG_ALPHA_FLOOR = -1e4


def quad_coeffs(pts, origin=(0.0, 0.0), mask=None):
  """Per-point quadratic-form coefficients of log(alpha * pdf).

  The gaussian log-density is a quadratic polynomial in the pixel
  coordinates, so the whole (P, G) field log(point_alpha * pdf) is ONE
  MXU matmul pixel_basis(px, py) @ quad_coeffs(pts): with
  u = ((px-mx)*ax + (py-my)*ay)/sx, v = ((py-my)*ax - (px-mx)*ay)/sy,
  log a = log pa - (u^2+v^2)/2 expands over the monomials
  [px^2, py^2, px*py, px, py, 1]. This replaces ~15 per-(pixel, point)
  VPU field ops with per-point row math + a (P, 8) x (8, G) matmul.
  Non-antialias only (the antialiased pdf is not pixel-polynomial).

  pts: (8, G) packed rows; origin: tile origin (tile-local frame keeps
  the monomials small: |px| <= tile_size, so f32 expansion error in
  log a stays ~1e-4). mask: optional (1, G) bool; masked lanes get
  log pa = LOG_ALPHA_FLOOR, i.e. exactly-zero alpha after exp.
  Returns (8, G): [cxx, cyy, cxy, cx, cy, c0, 0, 0].
  """
  dtype = pts.dtype
  g = pts.shape[1]
  mx = point_row(pts, MEAN_X) - origin[0]
  my = point_row(pts, MEAN_Y) - origin[1]
  ax = point_row(pts, AXIS_X)
  ay = point_row(pts, AXIS_Y)
  isx = 1.0 / point_row(pts, SIGMA_X)
  isy = 1.0 / point_row(pts, SIGMA_Y)
  pa = point_row(pts, ALPHA)

  # u = (px*ax + py*ay - du) / sx ; v = (py*ax - px*ay - dv) / sy
  du = mx * ax + my * ay
  dv = my * ax - mx * ay
  axx = ax * isx
  ayx = ay * isx
  ayy = ax * isy          # v's py coefficient / sy
  axy = ay * isy          # v's -px coefficient / sy
  dux = du * isx
  dvy = dv * isy

  cxx = -0.5 * (axx * axx + axy * axy)
  cyy = -0.5 * (ayx * ayx + ayy * ayy)
  cxy = -(axx * ayx - axy * ayy)
  cx = axx * dux - axy * dvy
  cy = ayx * dux + ayy * dvy
  log_pa = jnp.maximum(jnp.log(jnp.maximum(pa, 0.0)), LOG_ALPHA_FLOOR)
  if mask is not None:
    log_pa = jnp.where(mask, log_pa, LOG_ALPHA_FLOOR)
  c0 = log_pa - 0.5 * (dux * dux + dvy * dvy)
  zero = jnp.zeros((1, g), dtype)
  return jnp.concatenate([cxx, cyy, cxy, cx, cy, c0, zero, zero], axis=0)


def chunk_log_alpha(basis, coeffs):
  """(P, 8) pixel basis x (8, G) coefficients -> (P, G) log(pa * pdf).
  3-pass split: ~f32-accurate at half of HIGHEST's MXU cost."""
  return dot_split(basis, coeffs, (((1,), (0,)), ((), ())), passes=3)


def dot_split(a, b, dims, passes: int = 3, preferred=None):
  """dot_general with explicit bf16-operand pass splitting.

  Mosaic's DEFAULT precision for f32 operands is backend-defined (often
  multi-pass) and HIGHEST is 6 passes; casting operands to bf16
  explicitly buys exact control of true MXU passes:
    passes=1: bf16(a) x bf16(b)            (~2^-9 relative)
    passes=2: [hi(a) + lo(a)] x bf16(b)    (exact if b is bf16-exact)
    passes=3: hi*hi + hi*lo + lo*hi        (~f32-accurate, half of HIGHEST)
  f64 falls back to a HIGHEST dot (CPU/interpret test path).
  """
  if a.dtype != jnp.float32:
    return jax.lax.dot_general(a, b, dims, preferred_element_type=a.dtype,
                               precision=jax.lax.Precision.HIGHEST)
  out = preferred or jnp.float32

  def d(x, y):
    return jax.lax.dot_general(x.astype(jnp.bfloat16),
                               y.astype(jnp.bfloat16),
                               dims, preferred_element_type=out)

  if passes == 1:
    return d(a, b)
  a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
  a_lo = a - a_hi
  if passes == 2:
    return d(a_hi, b) + d(a_lo, b)
  b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
  b_lo = b - b_hi
  return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def exclusive_cumsum_lanes(x, passes: int = 2):
  """Exclusive cumsum along the point (lane) axis via strictly-upper-
  triangular matmul: out[:, g] = sum_{k<g} x[:, k]. (P, G) -> (P, G).

  These two matmuls per chunk (transmittance here, the running wd sum in
  the backward) are the dominant MXU work in both raster kernels:
  (P, G) x (G, G) dwarfs the (P, 8) coefficient and (F, G) feature
  products. For f32 they run as two explicit bf16 passes (dot_split
  passes=2): the triangular operand is exact in bf16 and the accumulator
  is f32, so splitting only the value operand leaves ~2^-17 relative
  error per term at a third of HIGHEST's 6-pass cost. Chunk carries
  (blend.chunk_weights) are exact VPU reductions, so any within-chunk
  rounding never accumulates across the bin."""
  g = x.shape[1]
  row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
  col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
  tri = (row < col).astype(x.dtype)
  return dot_split(x, tri, (((1,), (0,)), ((), ())), passes=passes)


class ChunkWeights(NamedTuple):
  a_eff: jax.Array    # (P, G) gated, clamped alpha
  t_excl: jax.Array   # (P, G) transmittance before each point (incl carry)
  weight: jax.Array   # (P, G) blend weight (or crossing indicator)
  t_carry: jax.Array  # (P, 1) transmittance after the chunk
  gate: jax.Array     # (P, G) threshold & clamp & saturation gate
                      # (= d a_eff / d a_raw a.e., for the backward)
  log1m: jax.Array    # (P, G) log1p(-a_eff) — the backward derives
                      # 1/(1 - a_eff) as exp(-log1m) (the VPU's exp is
                      # cheaper than its divide)


def chunk_weights(pdf, point_alpha, t_carry, config: RasterConfig,
                  blending: bool = True) -> ChunkWeights:
  """Front-to-back weights for one chunk.

  pdf: (P, G); point_alpha: (1, G) packed-alpha row; t_carry: (P, 1)
  transmittance carried from previous chunks.
  """
  return chunk_weights_raw(point_alpha * pdf, t_carry, config,
                           blending=blending)


def chunk_weights_raw(a_raw, t_carry, config: RasterConfig,
                      blending: bool = True,
                      cumsum_passes: int = 2) -> ChunkWeights:
  """chunk_weights from the pre-gate alpha field a_raw = point_alpha *
  pdf (P, G) directly — the coefficient-matmul kernels compute a_raw as
  exp(chunk_log_alpha(...)) without materializing the pdf.

  cumsum_passes=1 halves the transmittance matmul's MXU cost at ~2^-9
  within-chunk relative error (the t carry is an exact VPU sum either
  way, so error never crosses chunk boundaries) — gradient-grade; the
  forward keeps 2 passes for the image."""
  dtype = a_raw.dtype
  clamp_ok = a_raw < config.clamp_max_alpha
  a_clamped = jnp.minimum(a_raw, jnp.asarray(config.clamp_max_alpha, dtype))
  thresh_ok = a_raw > config.alpha_threshold
  a_eff = jnp.where(thresh_ok, a_clamped, 0)

  log1m = jnp.log1p(-a_eff)
  t_excl = t_carry * jnp.exp(exclusive_cumsum_lanes(log1m, cumsum_passes))
  t_carry_new = t_carry * jnp.exp(jnp.sum(log1m, axis=1, keepdims=True))

  total_before = 1 - t_excl
  if blending:
    sat_ok = total_before < config.saturate_threshold
    weight = a_eff * t_excl * sat_ok
  else:
    # quantile/median filter (reference forward.py:109-114): emit the
    # feature of the point whose accumulated weight crosses the level
    c = 1 - config.saturate_threshold
    total_after = 1 - t_excl * (1 - a_eff)
    sat_ok = total_before < c
    weight = ((total_before < c) & (total_after >= c)).astype(dtype)

  gate = (thresh_ok & clamp_ok & sat_ok).astype(dtype)
  return ChunkWeights(a_eff, t_excl, weight, t_carry_new, gate, log1m)


class ChunkGrads(NamedTuple):
  dL_da_raw: jax.Array   # (P, G) dL/d(point_alpha * pdf), gated
  c_carry: jax.Array     # (P, 1) updated inclusive sum of w*D


def chunk_alpha_grads(w: ChunkWeights, D, E, c_carry,
                      recip=None) -> ChunkGrads:
  """Alpha-path gradients for one chunk (blending mode).

  D: (P, G) = sum_c feature[g, c] * grad_image[p, c]; E: (P, 1) =
  sum_c final_image * grad_image; c_carry: (P, 1) inclusive sum of w*D
  from previous chunks. dL/dpdf = dL_da_raw * point_alpha and
  dL/dpoint_alpha = dL_da_raw * pdf. recip: optional precomputed
  1/(1 - a_eff) (= exp(-w.log1m), cheaper than a VPU divide).
  """
  wd = w.weight * D
  # backward-only: 1 bf16 pass (the c carry below is an exact VPU sum,
  # so the ~2^-9 within-chunk error is gradient-grade transport noise)
  c_incl = c_carry + exclusive_cumsum_lanes(wd, passes=1) + wd
  if recip is None:
    recip = 1 / (1 - w.a_eff)
  dL_da = w.gate * (w.t_excl * D - (E - c_incl) * recip)
  c_carry_new = c_carry + jnp.sum(wd, axis=1, keepdims=True)
  return ChunkGrads(dL_da, c_carry_new)


class ChunkBGrads(NamedTuple):
  B: jax.Array           # (P, G) dL_da_raw * a_raw (the moment field)
  c_carry: jax.Array     # (P, 1) updated inclusive sum of w*D


def chunk_B_grads(w: ChunkWeights, D, E, c_carry, recip) -> ChunkBGrads:
  """Fused moment field for the non-antialias backward (blending mode).

  The conic moment reduction only needs B = dL_da_raw * a_raw, never
  dL_da_raw itself, and B factors through quantities chunk_weights_raw
  already produced: where the gate is open a_raw == a_eff, so
    B = gate * (a_eff * t_excl * D - a_eff * recip * (E - c_incl))
      = gate * (w.weight * D - a_eff * recip * (E - c_incl))
  reusing wd = weight * D (needed for c_incl anyway) — two fewer (P, G)
  VPU ops per chunk than chunk_alpha_grads + the B product, and the
  divide is gone (recip = exp(-log1m)). Exact: wd is zero wherever
  thresh/saturation close the gate, and the clamp case is killed by the
  leading gate.
  """
  wd = w.weight * D
  c_incl = c_carry + exclusive_cumsum_lanes(wd, passes=1) + wd
  B = w.gate * (wd - (w.a_eff * recip) * (E - c_incl))
  c_carry_new = c_carry + jnp.sum(wd, axis=1, keepdims=True)
  return ChunkBGrads(B, c_carry_new)
