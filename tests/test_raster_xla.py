"""XLA tiled rasterizer vs an independent naive numpy blender.

The naive oracle blends every point at every pixel in global depth order
(no tiles). Because the tile mapper's cutoff ellipse is exactly the
alpha-threshold level set, (point, tile) pairs it excludes are always
below the alpha gate, so the tiled render must match the naive blend
*exactly* — this validates mapper + blend math together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops.mapper import map_to_tiles
from taichi_gaussian_rasterizer_tpu.ops.raster.xla_impl import rasterize_tiles_xla
from taichi_gaussian_rasterizer_tpu.models.renderer2d import project_gaussians2d
from taichi_gaussian_rasterizer_tpu.utils.random_data import random_2d_gaussians


def naive_blend(points, depths, features, image_size, config):
  pts = np.asarray(points, np.float64)
  depths = np.asarray(depths, np.float64).reshape(-1)
  feats = np.asarray(features, np.float64)
  w, h = image_size
  f = feats.shape[1]

  order = np.argsort(depths, kind="stable")
  image = np.zeros((h, w, f))
  weight = np.zeros((h, w))

  ys, xs = np.mgrid[0:h, 0:w]
  pxc, pyc = xs + 0.5, ys + 0.5

  T = np.ones((h, w))
  total_gate = lambda T: (1 - T) < config.saturate_threshold

  for i in order:
    mean, axis, sigma, alpha = pts[i, 0:2], pts[i, 2:4], pts[i, 4:6], pts[i, 6]
    dx, dy = pxc - mean[0], pyc - mean[1]
    tu = dx * axis[0] + dy * axis[1]
    tv = dy * axis[0] - dx * axis[1]
    if config.antialias:
      S = lambda x, s: 1 / (1 + np.exp(-(1.6 * (x / s) + 0.07 * (x / s) ** 3)))
      ix = sigma[0] * (S(tu + 0.5, sigma[0]) - S(tu - 0.5, sigma[0]))
      iy = sigma[1] * (S(tv + 0.5, sigma[1]) - S(tv - 0.5, sigma[1]))
      pdf = 2 * np.pi * ix * iy
    else:
      pdf = np.exp(-0.5 * ((tu / sigma[0]) ** 2 + (tv / sigma[1]) ** 2))
    a = np.minimum(alpha * pdf, config.clamp_max_alpha)
    accept = alpha * pdf > config.alpha_threshold
    a = np.where(accept, a, 0.0)

    wgt = a * T * total_gate(T)
    image += wgt[..., None] * feats[i]
    weight += wgt
    T = T * (1 - a)

  return image, weight


def scene(seed, n, image_size, num_channels=3, scale_factor=1.0):
  g = random_2d_gaussians(jax.random.PRNGKey(seed), n, image_size,
                          num_channels=num_channels,
                          scale_factor=scale_factor, dtype=jnp.float64)
  return project_gaussians2d(g), g.z_depth.reshape(-1), g.feature


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("antialias", [False, True])
def test_xla_raster_matches_naive(seed, antialias):
  image_size = (40, 24)
  config = RasterConfig(tile_size=8, points_per_chunk=8, antialias=antialias)
  points, depth, feats = scene(seed, 30, image_size)

  mapping = map_to_tiles(points, depth, image_size, config)
  assert not bool(mapping.overflow)

  image, weight, vis, _ = rasterize_tiles_xla(
      points, feats, mapping, image_size, config,
      max_points_per_tile=64, compute_visibility=True)

  ref_img, ref_w = naive_blend(points, depth, feats, image_size, config)
  np.testing.assert_allclose(np.asarray(image), ref_img, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(np.asarray(weight), ref_w, rtol=1e-9, atol=1e-12)

  # visibility identity (reference tests/test_visibility.py:34-64):
  # d(sum image)/d(features) summed per point == forward visibility
  def total(f):
    img, _, _, _ = rasterize_tiles_xla(points, f, mapping, image_size, config,
                                    max_points_per_tile=64)
    return jnp.sum(img)

  gf = jax.grad(total)(feats)
  # each feature channel's gradient equals the per-point visibility
  np.testing.assert_allclose(np.asarray(gf[:, 0]), np.asarray(vis),
                             rtol=1e-9, atol=1e-12)


def test_xla_raster_saturation():
  """Opaque stacked gaussians: far points behind a saturated pixel must
  contribute nothing, and weight must stop at saturate_threshold."""
  image_size = (16, 16)
  config = RasterConfig(tile_size=16, saturate_threshold=0.9)
  n = 40
  key = jax.random.PRNGKey(0)
  points = jnp.concatenate([
      jnp.full((n, 2), 8.0),                       # all at center
      jnp.tile(jnp.asarray([[1.0, 0.0]]), (n, 1)),  # axis
      jnp.full((n, 2), 6.0),                       # big sigma
      jnp.full((n, 1), 0.8),                       # alpha
  ], axis=1).astype(jnp.float64)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(key, (n, 3), jnp.float64)

  mapping = map_to_tiles(points, depth, image_size, config)
  image, weight, _, _ = rasterize_tiles_xla(points, feats, mapping, image_size,
                                         config, max_points_per_tile=64)
  ref_img, ref_w = naive_blend(points, depth, feats, image_size, config)
  np.testing.assert_allclose(np.asarray(image), ref_img, rtol=1e-9)
  assert np.asarray(weight).max() <= 0.9 + 0.8  # one step past threshold
  # center pixel saturates after ~3 points of alpha .8
  assert np.asarray(weight)[8, 8] > 0.9


def test_xla_raster_median_mode():
  """Non-blending mode picks the feature of the point crossing the
  quantile level (reference forward.py:109-114, renderer.py:202-208)."""
  image_size = (8, 8)
  config = RasterConfig(tile_size=8, use_alpha_blending=False,
                        saturate_threshold=0.5, alpha_threshold=1 / 255)
  n = 5
  points = jnp.concatenate([
      jnp.full((n, 2), 4.0),
      jnp.tile(jnp.asarray([[1.0, 0.0]]), (n, 1)),
      jnp.full((n, 2), 8.0),
      jnp.full((n, 1), 0.4),
  ], axis=1).astype(jnp.float64)
  depth = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5], jnp.float64)
  feats = depth[:, None]  # feature = depth -> median depth

  mapping = map_to_tiles(points, depth, image_size, config)
  image, weight, _, _ = rasterize_tiles_xla(points, feats, mapping, image_size,
                                         config, max_points_per_tile=16)
  # total weight after k points ~ 1-(1-.4)^k: crosses 0.5 at k=2 -> median
  # is the 2nd point's feature (0.2) at the center
  assert abs(float(image[4, 4, 0]) - 0.2) < 1e-9
  assert float(weight[4, 4]) == 1.0  # crossed -> indicator weight


def test_xla_raster_gradcheck():
  image_size = (24, 16)
  config = RasterConfig(tile_size=8, points_per_chunk=8)
  points, depth, feats = scene(11, 12, image_size)
  mapping = map_to_tiles(points, depth, image_size, config)

  def render(pts, f):
    img, w, _, _ = rasterize_tiles_xla(pts, f, mapping, image_size, config,
                                    max_points_per_tile=32)
    return jnp.sum(img ** 2)

  check_grads(render, (points, feats), order=1, modes=["rev"],
              atol=1e-4, rtol=1e-4, eps=1e-6)
