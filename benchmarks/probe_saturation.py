"""High-overdraw saturation measurements (VERDICT r1 weak #7).

Builds a heavily saturating scene (large, opaque gaussians) and measures:
  1. forward kernel: saturation_early_exit off vs on
  2. backward kernel: saturation chunk skipping (forward-tracked
     satchunks) vs full replay
Internal tool; run on the TPU.
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
  r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return r, (time.perf_counter() - t0) / iters * 1000


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--n", type=int, default=500_000)
  ap.add_argument("--size", type=int, default=2048)
  ap.add_argument("--cpu", action="store_true")
  args = ap.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  from taichi_gaussian_rasterizer_tpu import (
      RasterConfig, map_to_tiles, probe_emit_tails, project_to_image)
  from taichi_gaussian_rasterizer_tpu.ops.raster.backward import (
      raster_backward_pallas)
  from taichi_gaussian_rasterizer_tpu.ops.raster.forward import (
      gather_combined, rasterize_tiles_pallas, round_up)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)
  from dataclasses import replace as dreplace

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera,
                          scale_factor=4.0)
  # opaque: alpha ~ sigmoid(3) = 0.95 -> pixels saturate within a few hits
  g = dreplace(g, alpha_logit=jnp.full_like(g.alpha_logit, 3.0))

  for ee in (False, True):
    config = RasterConfig(tile_size=16, points_per_chunk=128,
                          saturation_early_exit=ee)
    pts, depth, _ = jax.jit(partial(project_to_image, config=config))(
        g, camera)
    tails = probe_emit_tails(pts, image_size, config)
    mapping = map_to_tiles(pts, depth[:, 0], image_size, config,
                           capacity=8 * n, emit_tails=tails)
    total = int(mapping.total_overlaps)

    fwd = jax.jit(lambda p, f: rasterize_tiles_pallas(
        p, f, mapping, config))
    (tiled, _, satchunks), ms_f = timeit(fwd, pts, g.feature)
    nch = (mapping.tile_ranges[:, 1]
           - (mapping.tile_ranges[:, 0] // 128) * 128 + 127) // 128
    skipped = int(jnp.sum(jnp.maximum(nch - satchunks, 0)))
    print(f"early_exit={ee}: overlaps={total} fwd {ms_f:.2f} ms  "
          f"(bwd-skippable chunks: {skipped}/{int(jnp.sum(nch))})")

    if not ee:
      f = g.feature.shape[1]
      f_pad = round_up(f + 1, 8)
      t_n, p_px = tiled.shape[0], tiled.shape[2]
      gt = jnp.concatenate([
          jax.random.normal(jax.random.PRNGKey(3), (t_n, f + 1, p_px)),
          jnp.zeros((t_n, f_pad - f - 1, p_px))], axis=1).astype(jnp.float32)
      e_tiles = jnp.sum(tiled * gt[:, :f + 1], axis=1)[..., None]
      gathered = gather_combined(pts, g.feature, mapping)

      bwd_skip = jax.jit(lambda a, b, c, s: raster_backward_pallas(
          a, b, c, mapping, f=f, config=config, satchunks=s))
      _, ms_skip = timeit(bwd_skip, gathered, gt, e_tiles, satchunks)
      _, ms_full = timeit(bwd_skip, gathered, gt, e_tiles,
                          jnp.full_like(satchunks, 1 << 30))
      print(f"  bwd with chunk skipping: {ms_skip:.2f} ms;"
            f" full replay: {ms_full:.2f} ms")


if __name__ == "__main__":
  main()
