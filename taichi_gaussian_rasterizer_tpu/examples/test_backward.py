"""Minimal forward+backward smoke CLI (reference
examples/test_backward.py:22-45): renders a random 2D scene and runs the
gradient once, printing timings and gradient norms.

Usage: python -m taichi_gaussian_rasterizer_tpu.examples.test_backward
       [--n 10000] [--size 512] [--tile_size 16] [--cpu]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from ..models.renderer2d import project_gaussians2d
from ..ops.raster import rasterize
from ..utils.random_data import random_2d_gaussians


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--n", type=int, default=10_000)
  parser.add_argument("--size", type=int, default=512)
  parser.add_argument("--tile_size", type=int, default=16)
  parser.add_argument("--points_per_chunk", type=int, default=128)
  parser.add_argument("--antialias", action="store_true")
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  image_size = (args.size, args.size)
  config = RasterConfig(tile_size=args.tile_size,
                        points_per_chunk=args.points_per_chunk,
                        antialias=args.antialias)

  g = random_2d_gaussians(jax.random.PRNGKey(0), args.n, image_size)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0, 1)

  @jax.jit
  def fwd_bwd(points, feats):
    def loss(p, f):
      out = rasterize(p, depth, f, image_size, config)
      return jnp.sum(out.image ** 2), out.image

    (l, img), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(points, feats)
    return l, img, grads

  t0 = time.perf_counter()
  l, img, (gp, gf) = fwd_bwd(points, g.feature)
  l = float(l)
  print(f"compile+run: {time.perf_counter() - t0:.2f}s loss={l:.4f}")

  t0 = time.perf_counter()
  iters = 10
  for _ in range(iters):
    l, img, (gp, gf) = fwd_bwd(points, g.feature)
  l = float(l)
  print(f"fwd+bwd: {(time.perf_counter() - t0) / iters * 1000:.2f} ms/iter")
  print(f"grad norms: points={float(jnp.linalg.norm(gp)):.4f} "
        f"features={float(jnp.linalg.norm(gf)):.4f}")


if __name__ == "__main__":
  main()
