"""Per-op benchmark CLIs (reference benchmarks/bench_{projection,
rasterizer,tilemapper,sh}.py, pyproject.toml:39-43).

Usage:
  python -m benchmarks.bench_ops projection  [--n 1000000] [--iters 50]
  python -m benchmarks.bench_ops sh          [--n 1000000] [--degree 3]
  python -m benchmarks.bench_ops tilemapper  [--n 1000000] [--size 2048]
  python -m benchmarks.bench_ops rasterizer  [--n 1000000] [--size 2048]
                                             [--backward] [--depth16]
"""

import argparse
from functools import partial

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu import (
    RasterConfig, evaluate_sh_at, map_to_tiles, project_to_image,
    rasterize_with_tiles)
from taichi_gaussian_rasterizer_tpu.utils.benchmark import benchmarked
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)


def make_scene(args):
  image_size = (args.size, args.size * 3 // 4)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  gaussians = random_3d_gaussians(
      jax.random.PRNGKey(1), args.n, camera,
      scale_factor=args.scale_factor,
      sh_degree=args.degree if args.op == "sh" else None)
  return camera, gaussians


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("op", choices=["projection", "sh", "tilemapper",
                                     "rasterizer"])
  parser.add_argument("--n", type=int, default=1_000_000)
  parser.add_argument("--size", type=int, default=2048)
  parser.add_argument("--iters", type=int, default=50)
  parser.add_argument("--degree", type=int, default=3)
  parser.add_argument("--tile_size", type=int, default=16)
  parser.add_argument("--scale_factor", type=float, default=1.0)
  parser.add_argument("--backward", action="store_true")
  parser.add_argument("--depth16", action="store_true")
  parser.add_argument("--profile", action="store_true")
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  config = RasterConfig(tile_size=args.tile_size)
  camera, gaussians = make_scene(args)
  bench = partial(benchmarked, iters=args.iters, profile=args.profile)

  if args.op == "projection":
    fn = jax.jit(partial(project_to_image, config=config))
    if args.backward:
      base = fn
      fn = jax.jit(jax.grad(
          lambda g, c: jnp.sum(base(g, c)[0] ** 2)))
    bench("projection", fn, gaussians, camera)
    return

  if args.op == "sh":
    pos = jax.lax.stop_gradient(gaussians.position)
    fn = jax.jit(evaluate_sh_at)
    if args.backward:
      fn = jax.jit(jax.grad(
          lambda p, x, c: jnp.sum(evaluate_sh_at(p, x, c) ** 2)))
    bench("sh", fn, gaussians.feature, pos, camera.camera_position)
    return

  # shared projection for the raster-side ops
  points, depth, _ = jax.jit(partial(project_to_image, config=config))(
      gaussians, camera)
  mapper = jax.jit(partial(map_to_tiles, image_size=camera.image_size,
                           config=config, use_depth16=args.depth16))

  if args.op == "tilemapper":
    _, ms = bench("tilemapper", mapper, points, depth[:, 0])
    mapping = mapper(points, depth[:, 0])
    total = int(mapping.total_overlaps)
    print(f"  overlaps: {total} ({total / args.n:.2f}/point), "
          f"overflow={bool(mapping.overflow)}")
    return

  mapping = mapper(points, depth[:, 0])
  feats = gaussians.feature

  if args.backward:
    @jax.jit
    def fn(points, feats):
      def loss(p, f):
        out = rasterize_with_tiles(p, f, mapping, camera.image_size, config)
        return jnp.sum(out.image ** 2)
      return jax.grad(loss, argnums=(0, 1))(points, feats)
  else:
    @jax.jit
    def fn(points, feats):
      return rasterize_with_tiles(points, feats, mapping,
                                  camera.image_size, config).image

  bench(f"rasterizer{'_bwd' if args.backward else ''}", fn, points, feats)


if __name__ == "__main__":
  main()
