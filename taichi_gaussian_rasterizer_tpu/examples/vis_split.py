"""Visual check of the 2D split operations (reference examples/vis_split.py):
renders a few gaussians before/after split_gaussians2d and
uniform_split_gaussians2d side by side and saves the result as .npy (no
GUI dependency).

Usage: python -m taichi_gaussian_rasterizer_tpu.examples.vis_split
       [--out /tmp/vis_split.npy] [--cpu]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..models.renderer2d import (render_gaussians, split_gaussians2d,
                                 uniform_split_gaussians2d)
from ..utils.random_data import random_2d_gaussians


def render(g, image_size, config):
  out = render_gaussians(g, image_size, config)
  return np.asarray(out.image)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--out", type=str, default="/tmp/vis_split.npy")
  parser.add_argument("--n", type=int, default=12)
  parser.add_argument("--size", type=int, default=256)
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  image_size = (args.size, args.size)
  config = RasterConfig(tile_size=16, points_per_chunk=8)

  g = random_2d_gaussians(jax.random.PRNGKey(0), args.n, image_size,
                          scale_factor=0.6, alpha_range=(0.8, 0.95))
  key = jax.random.PRNGKey(1)

  panels = [
      render(g, image_size, config),
      render(split_gaussians2d(key, g, n=2), image_size, config),
      render(uniform_split_gaussians2d(key, g, n=3), image_size, config),
  ]
  strip = np.concatenate(panels, axis=1)
  np.save(args.out, strip)
  print(f"saved {strip.shape} panel strip (original | random split | "
        f"uniform split) to {args.out}")


if __name__ == "__main__":
  main()
