"""Flat (tile, chunk) iteration machinery for the raster kernels.

Round-3 restructure, driven by measured TPU floors (PERF.md, round-3
probes): the per-tile Pallas grid paid ~456 ns of Mosaic step overhead
per tile (12288 tiles) and a 324 ns 2-slot DMA-latency floor per chunk,
on bins that average only ~1.6 chunks. Both kernels now run as ONE grid
step iterating a precomputed flat list of (tile, chunk) pairs:

* The iteration list has one entry per chunk-aligned slot chunk, owned
  by the tile containing its first slot, plus one extra entry per tile
  whose bin starts mid-chunk (the boundary duplicate — the same chunk is
  visited once per tile it spans, exactly like the round-2 per-tile
  supersets, but adjacent in the iteration order).
* Chunk input DMAs run on a depth-4 ring (measured 324 -> ~190 ns, fully
  hidden under the ~600 ns chunk math).
* Per-tile outputs (image block, saturation count) live in VMEM and are
  flushed by manual DMA when the iteration list moves to the next tile;
  per-chunk outputs (visibility, slot gradients) are merged across the
  boundary-duplicate pair in VMEM and flushed once per chunk — this
  deletes the round-2 HBM read-modify-write machinery entirely.
* The per-(pixel, point) quadratic-form coefficients are precomputed
  OUTSIDE the kernel in one fused XLA pass over the gathered slot buffer
  (build_combined): tile-local per slot, so the kernels need no origin
  handling and no per-chunk coefficient row math.

Round-3b gather layout: the per-point live table is CONIC-form —
[mean(2), inverse-covariance (qa, qb, qc), log-alpha] plus the feature
channels, with 3-4 f32 features packed pairwise as bf16 halves of one
f32 row (bit-preserving through the gather). Conic form carries the
same information as the packed eigen form in 6 rows instead of 7, so
the standard RGB case gathers EXACTLY 8 rows — the measured XLA-gather
sweet spot (6.1 vs 7.6 ns/idx at 3M indices, PERF.md). The antialias
pdf needs the eigen basis itself, so antialias configs keep the
axis-form table.

Replaces the shared-memory staging + per-tile thread blocks of the
reference kernels (/root/reference/taichi_splatting/rasterizer/
forward.py:45-66, backward.py:30-44) with a structure shaped by TPU DMA
and grid costs instead of CUDA block scheduling.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...config import RasterConfig
from ..mapper import TileMapping
from . import blend


def cdiv(a, b):
  return -(-a // b)


def round_up(a, b):
  return cdiv(a, b) * b


def iteration_capacity(k_cap: int, g: int, n_tiles: int) -> int:
  """Static bound on the iteration list length: every chunk plus one
  boundary duplicate per tile."""
  return k_cap // g + n_tiles


class IterationList(NamedTuple):
  n_iter: jax.Array     # (1,) int32 number of valid entries
  iter_tile: jax.Array  # (I_cap,) int32 tile of each entry (n_tiles = pad)
  iter_off: jax.Array   # (I_cap,) int32 chunk-aligned slot offset


def pack_iters(iters: IterationList, g: int, n_tiles: int, k_cap: int,
               starts_ext: jax.Array):
  """Pack each (tile, offset) entry into ONE int32, halving the
  iteration list's scalar-prefetch SMEM — which binds at 4096px (49k
  tiles: the two-array layout + per-tile bins exceed Mosaic's ~1 MB SMEM
  budget and the kernel fails to compile). Returns (packed, mode):

  * mode ("nc", nc): `tile * nc + global_chunk` with nc = k_cap // g
    chunks — exact for any iteration list, used while the product fits
    int32 (decode is one constant division).
  * mode ("j15",): `tile * 2^15 + local_chunk` — per-tile entries step
    by exactly g from align_down(starts[tile], g) (build_iteration_list
    sorts each tile's chunks contiguously), so the kernel reconstructs
    the offset from the prefetched starts array. Fits int32 for the
    mapper-asserted <= 65535 tiles at ANY capacity. Bound: one tile
    spanning > 2^15 chunks (4.19M slots in a single 16x16-px tile)
    would clamp — far beyond any supported occupancy.
  """
  nc = max(k_cap // g, 1)
  if (n_tiles + 1) * nc < 2 ** 31:
    return iters.iter_tile * nc + iters.iter_off // g, ("nc", nc)
  assert n_tiles <= 65535, "pack_iters: tile count exceeds int32 packing"
  aligned = (jnp.take(starts_ext, iters.iter_tile) // g) * g
  j = jnp.clip((iters.iter_off - aligned) // g, 0, 2 ** 15 - 1)
  return iters.iter_tile * 2 ** 15 + j, ("j15",)


def unpack_iters(pack, g: int, it_ref, starts_ref):
  """In-kernel decoders for a pack_iters stream: (iter_tile, iter_off)
  scalar-index functions over the packed SMEM ref (and the extended
  starts ref for j15 mode)."""
  if pack[0] == "nc":
    nc = pack[1]

    def iter_tile(i):
      return it_ref[i] // nc

    def iter_off(i):
      v = it_ref[i]
      return (v - (v // nc) * nc) * g
  else:                                   # ("j15",)
    J = 2 ** 15

    def iter_tile(i):
      return it_ref[i] // J

    def iter_off(i):
      v = it_ref[i]
      t = v // J
      return (starts_ref[t] // g) * g + (v - t * J) * g
  return iter_tile, iter_off


def build_iteration_list(mapping: TileMapping, g: int) -> IterationList:
  """Flatten the mapper's abutting bins into (tile, chunk) entries.

  Chunk j (slots [j*g, (j+1)*g)) is owned by the last tile whose bin
  starts at or before j*g; a tile whose bin starts mid-chunk gets an
  extra entry for that boundary chunk (its head lanes). Entries are
  sorted by (tile, offset), so each tile's entries are contiguous and in
  slot order, and the boundary-duplicate pair is adjacent in the list.
  """
  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]
  n_tiles = starts.shape[0]
  k_cap = mapping.overlap_to_point.shape[0]
  n_chunks = k_cap // g
  total = mapping.total_overlaps

  joff = jnp.arange(n_chunks, dtype=jnp.int32) * g
  # owner[j] = last tile whose bin starts at or before j*g. A
  # searchsorted here lowers to a ~2 ms while-loop per frame; instead
  # scatter each tile onto the first chunk it can own and take a running
  # maximum (bins abut, so owners are monotone in the chunk index).
  # The scatter index is deliberately UNclamped: a tile whose bin starts
  # strictly inside the final capacity chunk (or past it — trailing empty
  # tiles with starts == total, cropped tiles under overflow) owns no
  # chunk-aligned entry at all (its head lanes arrive via the b-entry
  # below), so its scatter must be dropped, not folded onto the last
  # chunk where it would shadow the true owner's a-entry.
  first_chunk = cdiv(starts, g)
  owner0 = jnp.zeros((max(n_chunks, 1),), jnp.int32).at[first_chunk].max(
      jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
  owner = jax.lax.cummax(owner0)[:n_chunks]
  a_valid = joff < total
  a_tile = jnp.where(a_valid, owner, n_tiles)

  b_valid = (starts % g != 0) & (starts < ends)
  b_tile = jnp.where(b_valid, jnp.arange(n_tiles, dtype=jnp.int32), n_tiles)
  b_off = jnp.where(b_valid, (starts // g) * g, 0)

  tiles_all = jnp.concatenate([a_tile, b_tile])
  offs_all = jnp.concatenate([joff, b_off])
  tiles_s, offs_s = jax.lax.sort((tiles_all, offs_all), num_keys=2)
  n_iter = (jnp.sum(a_valid) + jnp.sum(b_valid)).astype(jnp.int32)
  return IterationList(n_iter.reshape(1), tiles_s, offs_s)


# Combined per-slot buffer row layout (see build_combined):
COEFF_ROWS = slice(0, 8)    # [cxx, cyy, cxy, cx, cy, c0, 0, 0]
POINT_ROWS = slice(8, 16)   # non-antialias (conic):
                            #   [mx_local, my_local, qa, qb, qc, 0, 0, 0]
                            # antialias (eigen):
                            #   [mx_local, my_local, ax, ay, sx, sy, alpha, 0]
FEAT_ROW0 = 16              # then F features, the ones row, zero padding

# conic POINT_ROWS indices (non-antialias)
QA, QB, QC = 2, 3, 4


def feat_rows(f: int) -> int:
  # F features + the all-ones virtual alpha channel + one zero row that
  # aligns with the backward cotangent block's E row (the zero keeps the
  # (F_pad, P) x (F_pad, G) D contraction exact), padded to 8 sublanes
  return round_up(f + 2, 8)


def combined_rows(f: int) -> int:
  return FEAT_ROW0 + feat_rows(f)


def conic_rows(points: jax.Array):
  """Packed eigen-form (N, 7) columns -> conic per-point rows
  [mx, my, qa, qb, qc, log_alpha]: Q = R diag(sx, sy)^-2 R^T is the
  inverse image-space covariance, so u^2 + v^2 = d^T Q d and
  log(alpha * pdf) = log_alpha - d^T Q d / 2."""
  mx, my = points[:, 0], points[:, 1]
  ax, ay = points[:, 2], points[:, 3]
  sx, sy = points[:, 4], points[:, 5]
  alpha = points[:, 6]
  isx2 = 1.0 / (sx * sx)
  isy2 = 1.0 / (sy * sy)
  qa = ax * ax * isx2 + ay * ay * isy2
  qb = ax * ay * (isx2 - isy2)
  qc = ay * ay * isx2 + ax * ax * isy2
  log_pa = jnp.maximum(jnp.log(jnp.maximum(alpha, 0.0)),
                       jnp.asarray(blend.LOG_ALPHA_FLOOR, points.dtype))
  return [mx, my, qa, qb, qc, log_pa]


def _pack_feature_pairs(features: jax.Array) -> jax.Array:
  """(N, F) f32 -> (N, ceil(F/2)) f32 rows holding bf16 pairs
  (bit-preserving through gathers; unpacked in build_combined)."""
  n, f = features.shape
  if f % 2:
    features = jnp.concatenate(
        [features, jnp.zeros((n, 1), features.dtype)], axis=1)

  def b16(x):
    y = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jax.lax.bitcast_convert_type(y, jnp.uint32) >> 16

  hi = b16(features[:, 0::2])
  lo = b16(features[:, 1::2])
  return jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)


def _unpack_feature_pairs(packed: jax.Array, f: int):
  """(P_pairs, K) f32 bf16-pair rows -> list of F (K,) f32 rows."""
  bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
  rows = []
  for i in range(f):
    half = bits[i // 2] & jnp.uint32(0xFFFF0000) if i % 2 == 0 \
        else bits[i // 2] << 16
    rows.append(jax.lax.bitcast_convert_type(half, jnp.float32))
  return rows


def quad_coeffs_from_conic(mxl, myl, qa, qb, qc, log_pa):
  """Tile-local quadratic-form coefficient rows of log(alpha * pdf)
  from conic per-slot columns: log a = log_pa - d^T Q d / 2 expanded
  over the pixel monomials [px^2, py^2, px*py, px, py, 1]."""
  cxx = -0.5 * qa
  cyy = -0.5 * qc
  cxy = -qb
  cx = qa * mxl + qb * myl
  cy = qb * mxl + qc * myl
  c0 = log_pa - 0.5 * (qa * mxl * mxl + 2 * qb * mxl * myl
                       + qc * myl * myl)
  return [cxx, cyy, cxy, cx, cy, c0]


def build_combined(points: jax.Array, features: jax.Array,
                   mapping: TileMapping, config: RasterConfig) -> jax.Array:
  """Bin-ordered per-slot buffer (combined_rows(F), K_cap).

  One gather of the live per-point rows by overlap_to_point (the only
  random access; ~6 ns/idx at <= 8 rows — PERF.md), then one fused
  elementwise pass derives the per-slot rows:

  * rows 0-7: quadratic-form coefficients of log(alpha * pdf) in the
    slot's TILE-LOCAL pixel frame — the kernels evaluate the whole
    (P, G) alpha field as one (P, 8) x (8, G) matmul with no origin
    handling (non-antialias path; zeros for antialias).
  * rows 8-15: tile-local point rows (POINT_ROWS layout above) for the
    backward's moment reduction / the antialias pdf.
  * rows 16+: F features, the all-ones virtual alpha channel, padding.

  Non-antialias gathers the 6-row conic table (+ packed feature rows:
  EXACTLY 8 gathered rows for RGB, the measured gather sweet spot);
  antialias gathers the 7-row eigen table + plain features. Sentinel
  slots (point index N) gather the harmless padding column (log-alpha
  at the floor -> exactly-zero alpha), so they are exact no-ops in the
  blend.
  """
  n, f = features.shape
  dtype = points.dtype
  ts = config.tile_size
  th, tw = mapping.tile_shape
  f_pad = feat_rows(f)
  k_cap = mapping.overlap_to_point.shape[0]

  # gather-index count must NOT be a multiple of 128 on large tables:
  # XLA's TPU gather emitter takes a 2x slower path for lane-exact index
  # counts once the point table exceeds the chip's cache reach (measured
  # 15.3 vs 7.45 ns/idx at a 6M-point table; no effect at <= 3M — PERF.md
  # round 4; worth ~73 ms/frame on the 6M scene). k_cap is chunk-rounded
  # (always 128-aligned), so gather 8 extra sentinel slots and slice them
  # back off. Small tables skip the pad: the extra copy costs ~0.5 ms and
  # buys nothing while the table is cache-resident.
  if n > 2_000_000:
    o2p = jnp.concatenate(
        [mapping.overlap_to_point, jnp.full((8,), n, jnp.int32)])

    def take_unaligned(tbl):
      return jnp.take(tbl, o2p, axis=1)[:, :k_cap]
  else:
    def take_unaligned(tbl):
      return jnp.take(tbl, mapping.overlap_to_point, axis=1)

  tl = jnp.minimum(mapping.overlap_to_tile, th * tw - 1)
  ox = ((tl % tw) * ts).astype(dtype)
  oy = ((tl // tw) * ts).astype(dtype)
  zero = jnp.zeros((k_cap,), dtype)
  ones = jnp.ones((k_cap,), dtype)

  # pack feature pairs only where it buys the 8-row gather cliff:
  # f32, 3-4 channels (6 + ceil(F/2) <= 8; F <= 2 fits unpacked, F >= 5
  # exceeds 8 rows either way — depth channels keep full precision)
  pack = (dtype == jnp.float32 and not config.antialias
          and not config.exact_features and 2 < f <= 4)

  if config.antialias:
    pad7 = jnp.asarray([[0, 0, 1, 0, 1, 1, 0]], dtype)
    live = jnp.concatenate([
        jnp.concatenate([points, pad7], axis=0),             # (N+1, 7)
        jnp.concatenate([features, jnp.zeros((1, f), dtype)], axis=0),
    ], axis=1).T                                             # (7+F, N+1)
    gath = take_unaligned(live)                              # (7+F, K)

    mxl = gath[0] - ox
    myl = gath[1] - oy
    # the antialias kernels evaluate the pdf from the point rows; the
    # coefficient block is unused (zeros)
    rows = [zero] * 8
    rows += [mxl, myl, gath[2], gath[3], gath[4], gath[5], gath[6], zero]
    feat_cols = [gath[7 + i] for i in range(f)]
  else:
    conic = jnp.stack(conic_rows(points), axis=1)            # (N, 6)
    pad6 = jnp.asarray(
        [[0, 0, 1, 0, 1, blend.LOG_ALPHA_FLOOR]], dtype)
    table = jnp.concatenate([conic, pad6], axis=0)           # (N+1, 6)
    if pack:
      fp = _pack_feature_pairs(features)                     # (N, P_pairs)
      fp = jnp.concatenate([fp, jnp.zeros((1, fp.shape[1]), dtype)], axis=0)
      table = jnp.concatenate([table, fp], axis=1)
    else:
      table = jnp.concatenate(
          [table,
           jnp.concatenate([features, jnp.zeros((1, f), dtype)], axis=0)],
          axis=1)
    gath = take_unaligned(table.T)

    mxl = gath[0] - ox
    myl = gath[1] - oy
    qa, qb, qc, log_pa = gath[2], gath[3], gath[4], gath[5]
    rows = quad_coeffs_from_conic(mxl, myl, qa, qb, qc, log_pa)
    rows += [zero, zero]                                     # 8 coeff rows
    rows += [mxl, myl, qa, qb, qc, zero, zero, zero]         # point rows
    if pack:
      feat_cols = _unpack_feature_pairs(gath[6:], f)
    else:
      feat_cols = [gath[6 + i] for i in range(f)]

  rows += feat_cols                                          # F features
  rows += [ones]                                             # virtual alpha
  rows += [zero] * (f_pad - f - 1)  # incl. the E-row zero (feat_rows)
  return jnp.stack(rows, axis=0)                             # (R_in, K_cap)
