"""Round-3c: dissect the real forward kernel's per-entry overhead.

The idealized chunk-loop probes (probe_r3.py) put the fwd chunk floor at
~665-700 ns incl. DMA; the real kernel runs ~822 ns/entry. This probe
times STRIPPED variants of the actual forward kernel on the real 1M
mapping to attribute the gap:

  full        — the production kernel (rasterize_tiles_flat)
  noflush     — tile open/close + image flush machinery removed
                (accumulates every tile into one VMEM block; wrong
                output, right cost)
  nosat       — full, but saturation tracking (per-entry (P,1) max
                reduce + SMEM satiters write) removed
  nomask      — full, but the per-entry boundary lane mask removed
                (wrong output on shared chunks)

Readback-forced timing. Internal tool.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()

from taichi_gaussian_rasterizer_tpu import (RasterConfig, map_to_tiles,
                                            probe_emit_tails,
                                            project_to_image)
from taichi_gaussian_rasterizer_tpu.ops.raster import blend
from taichi_gaussian_rasterizer_tpu.ops.raster.flat import (
    COEFF_ROWS, FEAT_ROW0, build_combined, build_iteration_list,
    combined_rows, feat_rows, iteration_capacity)
from taichi_gaussian_rasterizer_tpu.ops.raster.forward import (
    DMA_DEPTH, rasterize_tiles_flat, rem)
from taichi_gaussian_rasterizer_tpu.utils import morton
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)


def timeit(fn, *args, iters=10, warmup=2):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


def _stripped_kernel(config, feature_size, flush: bool, sat: bool,
                     mask_on: bool):
  ts = config.tile_size
  p = ts * ts
  g = config.points_per_chunk
  stop_total = config.saturate_threshold
  f_pad = feat_rows(feature_size)

  def kernel(niter_ref, itile_ref, ioff_ref, starts_ref, ends_ref,
             comb_hbm, img_hbm,
             comb_vmem, img_vmem, t_vmem, t_hist,
             sem_c, sem_img):
    dtype = comb_vmem.dtype
    n_iter = niter_ref[0]

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % ts).astype(dtype) + 0.5
    py = (lin // ts).astype(dtype) + 0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    basis = blend.pixel_basis(px, py)

    def chunk_dma(i, slot):
      off = pl.multiple_of(ioff_ref[i], g)
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(off, g)], comb_vmem.at[slot], sem_c.at[slot])

    def img_flush(t, slot):
      return pltpu.make_async_copy(
          img_vmem.at[slot], img_hbm.at[t], sem_img.at[slot])

    for d in range(DMA_DEPTH - 1):
      @pl.when(d < n_iter)
      def _(d=d):
        chunk_dma(d, d).start()

    def body(i, carry):
      t_prev, k_open, sat_val = carry
      t = itile_ref[i]
      off = ioff_ref[i]
      slot = rem(i, DMA_DEPTH)

      @pl.when(i + DMA_DEPTH - 1 < n_iter)
      def _():
        chunk_dma(i + DMA_DEPTH - 1,
                  rem(i + DMA_DEPTH - 1, DMA_DEPTH)).start()

      new_tile = t != t_prev

      if flush:
        @pl.when(new_tile)
        def _():
          islot_new = rem(k_open, 2)

          @pl.when(k_open >= 1)
          def _():
            img_flush(t_prev, 1 - islot_new).start()

          @pl.when(k_open >= 2)
          def _():
            img_flush(t_hist[islot_new], islot_new).wait()

          t_hist[islot_new] = t
          img_vmem[islot_new] = jnp.zeros((f_pad, p), dtype)
          t_vmem[...] = jnp.ones((p, 1), dtype)

        k_open = jnp.where(new_tile, k_open + 1, k_open)
        islot = rem(k_open - 1, 2)
      else:
        islot = 0

      chunk_dma(i, slot).wait()

      def compute():
        if mask_on:
          start = starts_ref[t]
          end = ends_ref[t]
          s_idx = off + lane
          mask = ((s_idx >= start) & (s_idx < end)).astype(dtype)
        else:
          mask = jnp.ones((1, g), dtype)
        t_carry = t_vmem[...]
        coeffs = comb_vmem[slot, COEFF_ROWS, :]
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs)) * mask
        w = blend.chunk_weights_raw(a_raw, t_carry, config, blending=True)
        img = blend.dot_split(
            comb_vmem[slot, FEAT_ROW0:, :], w.weight,
            (((1,), (1,)), ((), ())), passes=3)
        img_vmem[islot] += img
        t_vmem[...] = w.t_carry

      compute()

      if sat:
        sat_now = (jnp.max(t_vmem[...]) <= 1 - stop_total).astype(jnp.int32)
        sat_val = jnp.maximum(sat_val, sat_now)

      return (t, k_open, sat_val)

    init = (jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32))
    t_vmem[...] = jnp.ones((p, 1), dtype)
    t_prev, k_open, _ = jax.lax.fori_loop(0, n_iter, body, init)

    if flush:
      @pl.when(k_open >= 1)
      def _():
        last = rem(k_open - 1, 2)
        img_flush(t_prev, last).start()
        img_flush(t_prev, last).wait()

      @pl.when(k_open >= 2)
      def _():
        other = rem(k_open, 2)
        img_flush(t_hist[other], other).wait()
    else:
      img_flush(0, 0).start()
      img_flush(0, 0).wait()

  return kernel


@functools.partial(jax.jit, static_argnames=("config", "f", "flush", "sat",
                                             "mask_on", "n_tiles"))
def run_variant(combined, iters_l, starts, ends, config, f, n_tiles,
                flush=True, sat=True, mask_on=True):
  g = config.points_per_chunk
  p = config.tile_size ** 2
  f_pad = feat_rows(f)
  kernel = _stripped_kernel(config, f, flush, sat, mask_on)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=5,
      grid=(1,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[
          pltpu.VMEM((DMA_DEPTH, combined.shape[0], g), combined.dtype),
          pltpu.VMEM((2, f_pad, p), combined.dtype),
          pltpu.VMEM((p, 1), combined.dtype),
          pltpu.SMEM((2,), jnp.int32),
          pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )
  return pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_tiles, f_pad, p), combined.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
  )(iters_l.n_iter, iters_l.iter_tile, iters_l.iter_off, starts, ends,
    combined)


def main():
  n = 1_000_000
  image_size = (2048, 1536)
  config = RasterConfig()
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g3 = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
  order = morton.argsort(g3.position)
  g3 = jax.tree.map(lambda x: jnp.take(x, order, axis=0), g3)
  pts, depth, _ = jax.jit(
      lambda gg: project_to_image(gg, camera, config))(g3)
  emit_tails = probe_emit_tails(pts, image_size, config)
  mapping = map_to_tiles(pts, depth[:, 0], image_size, config,
                         capacity=3 * n, emit_tails=emit_tails)
  f = 3
  combined = build_combined(pts, g3.feature, mapping, config)
  iters_l = build_iteration_list(mapping, config.points_per_chunk)
  n_iter = int(iters_l.n_iter[0])
  th, tw = mapping.tile_shape
  starts = mapping.tile_ranges[:, 0]
  ends = mapping.tile_ranges[:, 1]

  prod = jax.jit(lambda c: rasterize_tiles_flat(
      c, iters_l, mapping, config, f, compute_visibility=False))
  ms = timeit(prod, combined)
  print(f"production fwd: {ms:.2f} ms ({ms * 1e6 / n_iter:.0f} ns/entry, "
        f"{n_iter} entries)")

  for name, kw in [
      ("full-replica", dict()),
      ("no-sat", dict(sat=False)),
      ("no-mask", dict(mask_on=False)),
      ("no-flush", dict(flush=False, sat=False, mask_on=False)),
  ]:
    fn = jax.jit(lambda c, kw=kw: run_variant(
        c, iters_l, starts, ends, config, f, th * tw, **kw))
    ms = timeit(fn, combined)
    print(f"{name}: {ms:.2f} ms ({ms * 1e6 / n_iter:.0f} ns/entry)")


if __name__ == "__main__":
  main()
