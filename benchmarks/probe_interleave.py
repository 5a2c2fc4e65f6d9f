"""Probe: 2-way interleaved forward-kernel bodies.

Hypothesis: the flat kernels' per-entry cost is BODY-LATENCY-bound, not
VPU/MXU-throughput-bound — Mosaic does not software-pipeline fori_loop
iterations, so each entry pays the full dependent-chain latency of its
chunk math. If true, processing TWO INDEPENDENT iteration-list streams
per loop step (entries i and i+h from disjoint tile ranges) lets the
VLIW scheduler interleave their chains and should approach 2x.

Streams are split at a chunk-aligned tile boundary so no output chunk
or tile is shared; the shorter half is padded with entries of a dummy
tile whose bin is empty (mask all-zero -> exact no-op).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchmarks/probe_interleave.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_gaussian_rasterizer_tpu.config import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops.raster import blend
from taichi_gaussian_rasterizer_tpu.ops.raster.flat import (
    COEFF_ROWS, FEAT_ROW0, build_combined, build_iteration_list, feat_rows)
from taichi_gaussian_rasterizer_tpu.ops.raster.forward import DMA_DEPTH, rem


def timeit(fn, *args, iters=10, warmup=2):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


def _interleaved_kernel(config, feature_size, ways: int):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  f_pad = feat_rows(feature_size)

  def kernel(nh_ref, itile_ref, ioff_ref, starts_ref, ends_ref,
             comb_hbm, img_hbm,
             comb_vmem, img_vmem, t_vmem, t_hist,
             sem_c, sem_img):
    dtype = comb_vmem.dtype
    h = nh_ref[0]                      # per-stream step count

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    basis = blend.pixel_basis(px, py)

    def chunk_dma(s, i, slot):
      off = pl.multiple_of(ioff_ref[s * h + i], g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)],
          comb_vmem.at[s * DMA_DEPTH + slot],
          sem_c.at[s * DMA_DEPTH + slot])

    def img_flush(s, t, slot):
      return pltpu.make_async_copy(
          img_vmem.at[s * 2 + slot], img_hbm.at[t],
          sem_img.at[s * 2 + slot])

    for s in range(ways):
      for d in range(DMA_DEPTH - 1):
        @pl.when(d < h)
        def _(s=s, d=d):
          chunk_dma(s, d, d).start()
      t_vmem[:, s:s + 1] = jnp.ones((p, 1), dtype)

    def body(i, carry):
      carry = list(carry)
      for s in range(ways):
        t_prev, k_open = carry[2 * s], carry[2 * s + 1]
        t = itile_ref[s * h + i]
        off = ioff_ref[s * h + i]
        slot = rem(i, DMA_DEPTH)

        @pl.when(i + DMA_DEPTH - 1 < h)
        def _(s=s, i=i):
          chunk_dma(s, i + DMA_DEPTH - 1,
                    rem(i + DMA_DEPTH - 1, DMA_DEPTH)).start()

        new_tile = t != t_prev

        @pl.when(new_tile)
        def _(s=s, t=t, t_prev=t_prev, k_open=k_open):
          islot_new = rem(k_open, 2)

          @pl.when(k_open >= 1)
          def _():
            img_flush(s, t_prev, 1 - islot_new).start()

          @pl.when(k_open >= 2)
          def _():
            img_flush(s, t_hist[s * 2 + islot_new], islot_new).wait()

          t_hist[s * 2 + islot_new] = t
          img_vmem[s * 2 + islot_new] = jnp.zeros((f_pad, p), dtype)
          t_vmem[:, s:s + 1] = jnp.ones((p, 1), dtype)

        k_open = jnp.where(new_tile, k_open + 1, k_open)
        islot = rem(k_open - 1, 2)

        chunk_dma(s, i, slot).wait()

        start = starts_ref[t]
        end = ends_ref[t]
        s_idx = off + lane
        mask = ((s_idx >= start) & (s_idx < end)).astype(dtype)
        t_carry = t_vmem[:, s:s + 1]
        coeffs = comb_vmem[s * DMA_DEPTH + slot, COEFF_ROWS, :]
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs)) * mask
        w = blend.chunk_weights_raw(a_raw, t_carry, config, blending=True)
        img = blend.dot_split(
            comb_vmem[s * DMA_DEPTH + slot, FEAT_ROW0:, :], w.weight,
            (((1,), (1,)), ((), ())), passes=3)
        img_vmem[s * 2 + islot] += img
        t_vmem[:, s:s + 1] = w.t_carry

        carry[2 * s], carry[2 * s + 1] = t, k_open
      return tuple(carry)

    init = (jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32)) * ways
    final = jax.lax.fori_loop(0, h, body, init)

    for s in range(ways):
      t_prev, k_open = final[2 * s], final[2 * s + 1]

      @pl.when(k_open >= 1)
      def _(s=s, t_prev=t_prev, k_open=k_open):
        last = rem(k_open - 1, 2)
        img_flush(s, t_prev, last).start()
        img_flush(s, t_prev, last).wait()

      @pl.when(k_open >= 2)
      def _(s=s, k_open=k_open):
        other = rem(k_open, 2)
        img_flush(s, t_hist[s * 2 + other], other).wait()

  return kernel


@functools.partial(jax.jit, static_argnames=("config", "f", "n_out", "ways"))
def run_interleaved(combined, nh, itile, ioff, starts, ends, config, f,
                    n_out, ways):
  g = config.points_per_chunk
  p = config.tile_size ** 2
  f_pad = feat_rows(f)
  kernel = _interleaved_kernel(config, f, ways)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=5,
      grid=(1,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((ways * DMA_DEPTH, combined.shape[0], g),
                     combined.dtype),
          pltpu.VMEM((ways * 2, f_pad, p), combined.dtype),
          pltpu.VMEM((p, ways), combined.dtype),
          pltpu.SMEM((ways * 2,), jnp.int32),
          pltpu.SemaphoreType.DMA((ways * DMA_DEPTH,)),
          pltpu.SemaphoreType.DMA((ways * 2,)),
      ],
  )
  return pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_out, f_pad, p), combined.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
  )(nh, itile, ioff, starts, ends, combined)


def split_streams(iters, tile_ranges_np, g, n_tiles, ways):
  """Split the iteration list into `ways` equal-step streams at
  chunk-aligned tile boundaries; pad each to the common step count with
  dummy-tile entries (empty bins)."""
  n_iter = int(iters.n_iter[0])
  tiles = np.asarray(iters.iter_tile)[:n_iter]
  offs = np.asarray(iters.iter_off)[:n_iter]
  starts_np = tile_ranges_np[:, 0]

  # candidate split positions: first entry of a tile whose bin start is
  # chunk-aligned (no shared output chunk across the split)
  segs = []
  lo = 0
  targets = [n_iter * k // ways for k in range(1, ways)] + [n_iter]
  for tgt in targets[:-1]:
    cand = np.nonzero(
        (np.arange(n_iter) >= tgt)
        & (np.concatenate([[True], tiles[1:] != tiles[:-1]]))
        & (starts_np[tiles] % g == 0))[0]
    cut = int(cand[0]) if len(cand) else n_iter
    segs.append((lo, cut))
    lo = cut
  segs.append((lo, n_iter))

  h = max(b - a for a, b in segs)
  it_parts, off_parts = [], []
  for k, (a, b) in enumerate(segs):
    pad = h - (b - a)
    it_parts.append(np.concatenate(
        [tiles[a:b], np.full(pad, n_tiles + k, np.int32)]))
    off_parts.append(np.concatenate([offs[a:b], np.zeros(pad, np.int32)]))
  return (jnp.asarray(np.asarray([h], np.int32)),
          jnp.asarray(np.concatenate(it_parts).astype(np.int32)),
          jnp.asarray(np.concatenate(off_parts).astype(np.int32)), h)


def main():
  from taichi_gaussian_rasterizer_tpu import (
      map_to_tiles, probe_emit_tails, project_to_image)
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = 1_000_000
  image_size = (2048, 1536)
  config = RasterConfig(tile_size=16, points_per_chunk=128,
                        saturation_early_exit=False)
  g = config.points_per_chunk
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  gs = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
  order = morton.argsort(gs.position)
  gs = jax.tree.map(lambda x: jnp.take(x, order, axis=0), gs)
  pts, depth, _ = jax.jit(
      lambda gg: project_to_image(gg, camera, config))(gs)
  emit_tails = probe_emit_tails(pts, image_size, config)
  probe_map = map_to_tiles(pts, depth[:, 0], image_size, config,
                           capacity=6 * n, emit_tails=emit_tails)
  total = int(probe_map.total_overlaps)
  capacity = int((int(total * 1.002) + 1023) // 1024 * 1024)
  mapping = map_to_tiles(pts, depth[:, 0], image_size, config,
                         capacity=capacity, emit_tails=emit_tails)
  feats = jnp.concatenate([pts[:, 6:7]] * 3, axis=1)
  combined = jax.jit(build_combined, static_argnums=3)(
      pts, feats, mapping, config)
  iters = build_iteration_list(mapping, g)
  n_tiles = mapping.tile_ranges.shape[0]
  tr_np = np.asarray(mapping.tile_ranges)
  n_iter = int(iters.n_iter[0])
  print(f"overlaps={total} n_iter={n_iter}", flush=True)

  for ways in (1, 2, 3):
    nh, itile, ioff, h = split_streams(iters, tr_np, g, n_tiles, ways)
    # dummy tiles (one per stream) with empty bins
    starts = jnp.concatenate(
        [mapping.tile_ranges[:, 0], jnp.zeros((ways,), jnp.int32)])
    ends = jnp.concatenate(
        [mapping.tile_ranges[:, 1], jnp.zeros((ways,), jnp.int32)])
    out = run_interleaved(combined, nh, itile, ioff, starts, ends,
                          config, 3, n_tiles + ways, ways)
    ms = timeit(run_interleaved, combined, nh, itile, ioff, starts, ends,
                config, 3, n_tiles + ways, ways)
    print(f"ways={ways}: steps={h} {ms:7.2f} ms "
          f"({ms * 1e6 / n_iter:.0f} ns/real-entry)", flush=True)
    if ways == 1:
      ref = np.asarray(out[:n_tiles])
    else:
      np.testing.assert_allclose(np.asarray(out[:n_tiles]), ref,
                                 rtol=1e-6, atol=1e-6)
      print(f"  ways={ways} output matches ways=1", flush=True)


if __name__ == "__main__":
  main()
