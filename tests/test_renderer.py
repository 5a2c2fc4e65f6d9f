"""End-to-end 3D renderer tests (project -> SH -> map -> rasterize)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu import Gaussians3D, RasterConfig
from taichi_gaussian_rasterizer_tpu.data_types import inverse_sigmoid
from taichi_gaussian_rasterizer_tpu.models.renderer import (
    Rendering, render_gaussians, viewspace_gradient)
from taichi_gaussian_rasterizer_tpu.ops.projection import CameraParams
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)

CONFIG = RasterConfig(tile_size=16, points_per_chunk=8)


def small_camera(w=64, h=48):
  return CameraParams(
      projection=jnp.asarray([60.0, 60.0, w / 2, h / 2], jnp.float64),
      T_camera_world=jnp.eye(4, dtype=jnp.float64),
      near_plane=0.1, far_plane=100.0, image_size=(w, h))


@pytest.mark.parametrize("use_sh", [False, True])
@pytest.mark.parametrize("render_depth", [False, True])
def test_render_gaussians_shapes(use_sh, render_depth):
  key = jax.random.PRNGKey(0)
  camera = random_camera(key, image_size=(96, 64), dtype=jnp.float64)
  g = random_3d_gaussians(jax.random.PRNGKey(1), 150, camera,
                          sh_degree=2 if use_sh else None,
                          dtype=jnp.float64)
  cfg = CONFIG.replace(compute_visibility=True)
  r = render_gaussians(g, camera, cfg, use_sh=use_sh,
                       render_depth=render_depth, render_median_depth=True)

  assert r.image.shape == (64, 96, 3)
  assert r.image_weight.shape == (64, 96)
  assert np.isfinite(np.asarray(r.image)).all()
  assert r.median_depth.shape == (64, 96)
  assert int(r.points_in_view.sum()) > 50
  assert (np.asarray(r.point_visibility) >= 0).all()
  if render_depth:
    assert r.depth.shape == (64, 96)
    assert np.isfinite(np.asarray(r.depth_var)).all()
    assert np.isfinite(np.asarray(r.ndc_depth)).all()
  # derived properties
  assert r.point_radii.shape == (150,)
  assert r.visible_mask.dtype == jnp.bool_
  assert r.num_points == 150


@pytest.mark.quick
def test_single_opaque_gaussian_depth():
  """One nearly-opaque gaussian at z=5 in front of the camera: blended
  and median depth at the center must be ~5, variance ~0."""
  camera = small_camera()
  z = 5.0
  g = Gaussians3D(
      position=jnp.asarray([[0.0, 0.0, z]], jnp.float64),
      log_scaling=jnp.log(jnp.full((1, 3), 0.5, jnp.float64)),
      rotation=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float64),
      alpha_logit=inverse_sigmoid(jnp.full((1, 1), 0.995, jnp.float64)),
      feature=jnp.asarray([[1.0, 0.5, 0.25]], jnp.float64))

  r = render_gaussians(g, camera, CONFIG, render_depth=True,
                       render_median_depth=True)
  cy, cx = 24, 32
  w = float(r.image_weight[cy, cx])
  assert w > 0.9
  assert abs(float(r.depth[cy, cx]) - z) < 0.05
  assert abs(float(r.median_depth[cy, cx]) - z) < 1e-6
  assert float(r.depth_var[cy, cx]) < 1e-3
  # color = alpha-weighted feature
  np.testing.assert_allclose(np.asarray(r.image[cy, cx]),
                             w * np.asarray([1.0, 0.5, 0.25]), rtol=1e-6)


def test_depth_ordering_two_gaussians():
  """A nearer opaque gaussian must dominate the blend over a farther one
  regardless of their order in the input arrays."""
  camera = small_camera()

  def make(z_order):
    return Gaussians3D(
        position=jnp.asarray([[0.0, 0.0, z_order[0]],
                              [0.0, 0.0, z_order[1]]], jnp.float64),
        log_scaling=jnp.log(jnp.full((2, 3), 0.4, jnp.float64)),
        rotation=jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float64),
                          (2, 1)),
        alpha_logit=inverse_sigmoid(jnp.full((2, 1), 0.9, jnp.float64)),
        feature=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                            jnp.float64))

  r1 = render_gaussians(make((3.0, 6.0)), camera, CONFIG)
  # swapped array order, same geometry (red at 3, green at 6 -> here
  # green at 6 first in the array)
  g2 = make((6.0, 3.0))
  g2 = g2.replace(feature=jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
                                      jnp.float64))
  r2 = render_gaussians(g2, camera, CONFIG)

  np.testing.assert_allclose(np.asarray(r1.image), np.asarray(r2.image),
                             atol=1e-10)
  c = np.asarray(r1.image[24, 32])
  assert c[0] > c[1], "near red must dominate far green"


def test_render_gaussians_gradcheck():
  """f64 finite-difference check through the whole pipeline including
  camera parameters (differentiable cameras)."""
  key = jax.random.PRNGKey(3)
  camera = small_camera(32, 24)
  g = random_3d_gaussians(key, 10, camera, dtype=jnp.float64)

  def loss(position, log_scaling, rotation, alpha_logit, feature, proj, T):
    gg = Gaussians3D(position, log_scaling, rotation, alpha_logit, feature)
    cam = CameraParams(projection=proj, T_camera_world=T,
                       near_plane=camera.near_plane,
                       far_plane=camera.far_plane,
                       image_size=camera.image_size)
    r = render_gaussians(gg, cam, CONFIG)
    return jnp.sum(r.image ** 2) + jnp.sum(r.image_weight)

  args = (*g.shape_tensors(), g.feature, camera.projection,
          camera.T_camera_world)
  check_grads(loss, args, order=1, modes=["rev"], atol=5e-4, rtol=5e-4,
              eps=1e-6)


def test_viewspace_gradient():
  key = jax.random.PRNGKey(4)
  camera = small_camera()
  g = random_3d_gaussians(key, 30, camera, dtype=jnp.float64)

  from taichi_gaussian_rasterizer_tpu.ops.projection import project_to_image
  from taichi_gaussian_rasterizer_tpu.ops.mapper import map_to_tiles
  from taichi_gaussian_rasterizer_tpu.ops.raster import rasterize_with_tiles

  pts2d, depth, _ = project_to_image(g, camera, CONFIG)
  mapping = map_to_tiles(pts2d, depth[:, 0], camera.image_size, CONFIG)

  def loss(p2d):
    out = rasterize_with_tiles(p2d, g.feature, mapping, camera.image_size,
                               CONFIG)
    return jnp.sum(out.image ** 2)

  vg = viewspace_gradient(jax.grad(loss)(pts2d))
  assert vg.shape == (30,)
  assert (np.asarray(vg) >= 0).all() and np.asarray(vg).sum() > 0


@pytest.mark.quick
def test_rendering_is_pytree():
  camera = small_camera()
  g = random_3d_gaussians(jax.random.PRNGKey(5), 20, camera,
                          dtype=jnp.float64)
  r = jax.jit(lambda g: render_gaussians(g, camera, CONFIG))(g)
  assert isinstance(r, Rendering)
  detached = r.detach()
  assert detached.image.shape == r.image.shape


def test_render_with_heuristics_populates_record():
  """The post-backward heuristics must be readable from the Rendering
  record, as in the reference (renderer.py:87-95): prune_cost/split_score
  are non-None, finite, and nonzero for visible points."""
  import jax.numpy as jnp
  from taichi_gaussian_rasterizer_tpu import (
      RasterConfig, render_with_heuristics)

  camera = small_camera()
  g = random_3d_gaussians(jax.random.PRNGKey(7), 40, camera,
                          dtype=jnp.float64)
  config = RasterConfig(tile_size=16, points_per_chunk=8)

  loss, grads, rendering = render_with_heuristics(
      lambda r: jnp.sum(r.image ** 2), g, camera, config)

  assert rendering.point_heuristic is not None
  pc, ss = rendering.prune_cost, rendering.split_score
  assert pc.shape == (40,) and ss.shape == (40,)
  assert bool(jnp.isfinite(pc).all()) and bool(jnp.isfinite(ss).all())
  assert float(jnp.abs(pc).sum()) > 0 and float(jnp.abs(ss).sum()) > 0
  assert bool(jnp.isfinite(loss))
  assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(grads))
  # visibility rides along with heuristics (compute_point_heuristic
  # implies compute_visibility)
  assert rendering.point_visibility is not None
