"""Stage-by-stage TPU profiling of the render pipeline with
readback-forced timing and NaN localization. Internal tool."""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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
  p.add_argument("--snug_tails", action="store_true")
  args = p.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  from taichi_gaussian_rasterizer_tpu import (RasterConfig, map_to_tiles,
                                              project_to_image)
  from taichi_gaussian_rasterizer_tpu.ops.raster.forward import (
      gather_combined, rasterize_tiles_pallas, round_up)
  from taichi_gaussian_rasterizer_tpu.ops.raster.backward import (
      raster_backward_pallas)
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      reduce_slots_by_point)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=args.tile_size,
                        points_per_chunk=args.chunk)
  capacity = args.capacity_factor * n

  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)

  proj = jax.jit(partial(project_to_image, config=config))
  (pts, depth, iv), ms = timeit(proj, g, camera, iters=args.iters)
  print(f"projection fwd: {ms:.2f} ms  in_view={int(iv.sum())}")
  if args.check:
    finite("projection", (pts, depth))

  emit_tails = None
  if args.snug_tails:
    from taichi_gaussian_rasterizer_tpu import probe_emit_tails
    emit_tails = probe_emit_tails(pts, image_size, config)
    print(f"emit_tails: {emit_tails}")
  mapper = jax.jit(partial(map_to_tiles, image_size=image_size,
                           config=config, capacity=capacity,
                           use_depth16=args.depth16, emit_tails=emit_tails))
  mapping, ms = timeit(mapper, pts, depth[:, 0], iters=args.iters)
  print(f"mapper: {ms:.2f} ms  overlaps={int(mapping.total_overlaps)} "
        f"overflow={bool(mapping.overflow)} "
        f"k_pad={mapping.overlap_to_point.shape[0]}")

  gathered, ms = timeit(lambda p, f: gather_combined(p, f, mapping),
                        pts, g.feature, iters=args.iters)
  print(f"combined gather: {ms:.2f} ms")

  (tiled, _, satchunks), ms = timeit(lambda p, f: rasterize_tiles_pallas(
      p, f, mapping, config), pts, g.feature, iters=args.iters)
  from taichi_gaussian_rasterizer_tpu.ops.raster.forward import cdiv_i32
  nch = cdiv_i32(mapping.tile_ranges[:, 1] - mapping.tile_ranges[:, 0],
                 config.points_per_chunk)
  print(f"raster fwd (incl gather): {ms:.2f} ms  "
        f"sat-skipped chunks: {int(jnp.sum(nch - jnp.minimum(nch, satchunks)))}"
        f"/{int(jnp.sum(nch))}")
  if args.check:
    finite("raster fwd", tiled)

  f = g.feature.shape[1]
  f_pad = round_up(f + 1, 8)
  t_tiles = tiled.shape[0]
  p_px = tiled.shape[2]
  key = jax.random.PRNGKey(3)
  grad_padded = jnp.concatenate([
      jax.random.normal(key, (t_tiles, f + 1, p_px), jnp.float32),
      jnp.zeros((t_tiles, f_pad - f - 1, p_px), jnp.float32)], axis=1)
  img_padded = jnp.concatenate(
      [tiled, jnp.zeros((t_tiles, f_pad - f - 1, p_px), jnp.float32)],
      axis=1)
  e_tiles = jnp.sum(img_padded * grad_padded, axis=1)[..., None]

  f_rows = g.feature.shape[1]
  gout, ms = timeit(
      lambda a, b, c: raster_backward_pallas(a, b, c, mapping, f=f_rows,
                                             config=config,
                                             satchunks=satchunks),
      gathered, grad_padded, e_tiles, iters=args.iters)
  print(f"raster bwd kernel: {ms:.2f} ms")

  # mirror the real backward reduction (function.py)
  from taichi_gaussian_rasterizer_tpu.ops.raster.backward import (
      live_grad_rows)
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      reduce_packed_slots_by_point)
  live = live_grad_rows(f_rows, False)
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


def profile_extras(args=None):
  """Extra measurements: projection backward, reduction internals."""
  import argparse
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--size", type=int, default=2048)
  args = p.parse_args()

  from taichi_gaussian_rasterizer_tpu import (RasterConfig, map_to_tiles,
                                              project_to_image)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)
  from functools import partial

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=16, points_per_chunk=128)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)

  @jax.jit
  def proj_bwd(g, ct):
    def f(g):
      pts, depth, _ = project_to_image(g, camera, config)
      return jnp.vdot(pts, ct[0]) + jnp.vdot(depth, ct[1])
    return jax.grad(f)(g)

  ct = (jax.random.normal(jax.random.PRNGKey(2), (n, 7)),
        jax.random.normal(jax.random.PRNGKey(3), (n, 1)))
  _, ms = timeit(proj_bwd, g, ct)
  print(f"projection fwd+bwd: {ms:.2f} ms")

  pts, depth, _ = jax.jit(partial(project_to_image, config=config))(g, camera)
  mapping = map_to_tiles(pts, depth[:, 0], image_size, config,
                         capacity=3 * n)
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      reduce_slots_by_point)
  k_pad = mapping.overlap_to_point.shape[0]
  slots = jax.random.normal(jax.random.PRNGKey(4), (16, k_pad))

  sort_fn = jax.jit(lambda s: jax.lax.sort(
      (mapping.overlap_to_point,) + tuple(s[i] for i in range(s.shape[0])),
      num_keys=1))
  _, ms = timeit(sort_fn, slots)
  print(f"reduction: payload sort ({k_pad/1e6:.1f}M x {slots.shape[0]}): "
        f"{ms:.2f} ms")
  red = jax.jit(lambda s: reduce_slots_by_point(s, mapping))
  _, ms = timeit(red, slots)
  print(f"reduction total: {ms:.2f} ms")


if __name__ == "__main__" and __import__("sys").argv[0].endswith("nothing"):
  pass
