"""Stage-by-stage TPU profiling of the render pipeline with
readback-forced timing and NaN localization. Internal tool."""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()  # persistent compile cache


def timeit(fn, *args, iters=5):
  r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  ms = (time.perf_counter() - t0) / iters * 1000
  return r, ms


def finite(name, x):
  arrs = [a for a in jax.tree.leaves(x)
          if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)]
  bad = [int(jnp.sum(~jnp.isfinite(a))) for a in arrs]
  status = "OK" if sum(bad) == 0 else f"NONFINITE {bad}"
  print(f"  [{name}] {status}")
  return sum(bad) == 0


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--size", type=int, default=2048)
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--capacity_factor", type=int, default=4)
  p.add_argument("--tile_size", type=int, default=16)
  p.add_argument("--chunk", type=int, default=128)
  p.add_argument("--cpu", action="store_true")
  p.add_argument("--check", action="store_true", help="finiteness checks")
  p.add_argument("--depth16", action="store_true")
  p.add_argument("--snug", action="store_true",
                 help="snug emit tails + capacity (the bench.py flow)")
  args = p.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  from taichi_gaussian_rasterizer_tpu import (RasterConfig, map_to_tiles,
                                              project_to_image)
  from taichi_gaussian_rasterizer_tpu.ops.raster.backward import (
      live_grad_rows, raster_backward_pallas)
  from taichi_gaussian_rasterizer_tpu.ops.raster.flat import (
      build_combined, build_iteration_list, feat_rows)
  from taichi_gaussian_rasterizer_tpu.ops.raster.forward import (
      rasterize_tiles_flat)
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      reduce_packed_slots_by_point, reduce_slots_by_point)
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=args.tile_size,
                        points_per_chunk=args.chunk)

  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
  order = morton.argsort(g.position)
  g = jax.tree.map(lambda x: jnp.take(x, order, axis=0), g)

  proj = jax.jit(partial(project_to_image, config=config))
  (pts, depth, iv), ms = timeit(proj, g, camera, iters=args.iters)
  print(f"projection fwd: {ms:.2f} ms  in_view={int(iv.sum())}")
  if args.check:
    finite("projection", (pts, depth))

  emit_tails = None
  capacity = args.capacity_factor * n
  if args.snug:
    from taichi_gaussian_rasterizer_tpu import probe_emit_tails
    emit_tails = probe_emit_tails(pts, image_size, config, margin=1.05)
    probe_map = map_to_tiles(pts, depth[:, 0], image_size, config,
                             capacity=capacity, emit_tails=emit_tails)
    total = int(probe_map.total_overlaps)
    capacity = int((int(total * 1.0625) + 1023) // 1024 * 1024)
    print(f"emit_tails: {emit_tails}  capacity: {capacity}")
  mapper = jax.jit(partial(map_to_tiles, image_size=image_size,
                           config=config, capacity=capacity,
                           use_depth16=args.depth16, emit_tails=emit_tails))
  mapping, ms = timeit(mapper, pts, depth[:, 0], iters=args.iters)
  print(f"mapper: {ms:.2f} ms  overlaps={int(mapping.total_overlaps)} "
        f"overflow={bool(mapping.overflow)} "
        f"k_pad={mapping.overlap_to_point.shape[0]}")

  f = g.feature.shape[1]
  build = jax.jit(lambda p, ft: build_combined(p, ft, mapping, config))
  combined, ms = timeit(build, pts, g.feature, iters=args.iters)
  print(f"build_combined: {ms:.2f} ms  rows={combined.shape[0]}")

  iterf = jax.jit(lambda: build_iteration_list(mapping, config.points_per_chunk))
  iters_l, ms = timeit(iterf, iters=args.iters)
  print(f"iteration list: {ms:.2f} ms  n_iter={int(iters_l.n_iter[0])}")

  fwd = jax.jit(lambda c: rasterize_tiles_flat(
      c, iters_l, mapping, config, f, compute_visibility=False))
  (tiled, _, satiters), ms = timeit(fwd, combined, iters=args.iters)
  print(f"raster fwd kernel: {ms:.2f} ms")
  if args.check:
    finite("raster fwd", tiled)

  f_pad = feat_rows(f)
  t_tiles = tiled.shape[0]
  p_px = tiled.shape[2]
  key = jax.random.PRNGKey(3)
  g_tiled = jax.random.normal(key, (t_tiles, f + 1, p_px), jnp.float32)

  @jax.jit
  def bwd(combined, g_tiled, tiled):
    e_row = jnp.sum(tiled[:, :f + 1] * g_tiled, axis=1, keepdims=True)
    grad_padded = jnp.concatenate(
        [g_tiled, e_row,
         jnp.zeros((t_tiles, f_pad - f - 2, p_px), jnp.float32)], axis=1)
    return raster_backward_pallas(
        combined, iters_l, grad_padded, mapping, f=f, config=config,
        compute_point_heuristic=False, satiters=satiters)

  gout, ms = timeit(bwd, combined, g_tiled, tiled, iters=args.iters)
  print(f"raster bwd kernel (incl E/pad prep): {ms:.2f} ms")

  live = live_grad_rows(f, False)
  if gout.dtype == jnp.uint32:
    sel = gout[:(live + 1) // 2]
    red = jax.jit(lambda s: reduce_packed_slots_by_point(s, mapping, live))
  else:
    sel = gout[:live]
    red = jax.jit(lambda s: reduce_slots_by_point(s, mapping))
  _, ms = timeit(red, sel, iters=args.iters)
  print(f"point reduction ({sel.shape[0]} rows, "
        f"{'packed' if gout.dtype == jnp.uint32 else 'plain'}): {ms:.2f} ms")


if __name__ == "__main__":
  main()
