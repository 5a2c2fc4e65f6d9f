"""Tile <-> image layout helpers.

The raster kernels produce images in tile-major packed layout
(T, C, P) with P = tile_size^2 pixels linearized row-major within the
tile; XLA reshapes/transposes assemble the final (H, W, C) image. Keeping
the kernel output tile-packed keeps the pixel axis on TPU lanes.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def tile_pixel_centers(tile_shape: Tuple[int, int], tile_size: int,
                       dtype=jnp.float32):
  """Pixel-center coordinates per tile: returns px, py each (T, P)."""
  th, tw = tile_shape
  p = tile_size * tile_size
  lin = jnp.arange(p, dtype=jnp.int32)
  off_x = (lin % tile_size).astype(dtype) + 0.5
  off_y = (lin // tile_size).astype(dtype) + 0.5
  t = jnp.arange(th * tw, dtype=jnp.int32)
  tx = (t % tw).astype(dtype) * tile_size
  ty = (t // tw).astype(dtype) * tile_size
  return tx[:, None] + off_x[None, :], ty[:, None] + off_y[None, :]


def tiles_to_image(tiled: jax.Array, tile_shape: Tuple[int, int],
                   tile_size: int, image_size: Tuple[int, int]) -> jax.Array:
  """(T, C, P) tile-packed -> (H, W, C), cropped to image_size (w, h)."""
  th, tw = tile_shape
  t, c, p = tiled.shape
  assert t == th * tw and p == tile_size * tile_size
  img = tiled.reshape(th, tw, c, tile_size, tile_size)
  img = img.transpose(0, 3, 1, 4, 2)  # (th, ts, tw, ts, c)
  img = img.reshape(th * tile_size, tw * tile_size, c)
  w, h = image_size
  return img[:h, :w, :]


def image_to_tiles(image: jax.Array, tile_shape: Tuple[int, int],
                   tile_size: int) -> jax.Array:
  """(H, W, C) -> (T, C, P), zero-padding partial edge tiles."""
  th, tw = tile_shape
  h, w, c = image.shape
  ph, pw = th * tile_size, tw * tile_size
  if (ph, pw) != (h, w):
    image = jnp.pad(image, ((0, ph - h), (0, pw - w), (0, 0)))
  img = image.reshape(th, tile_size, tw, tile_size, c)
  img = img.transpose(0, 2, 4, 1, 3)  # (th, tw, c, ts, ts)
  return img.reshape(th * tw, c, tile_size * tile_size)
