"""Projection op tests (reference tests/test_projection.py analog).

Dual-implementation equivalence against an independent numpy oracle that
builds the EWA covariance with explicit np.linalg matrix products, plus
float64 gradient checks of the full op including camera parameters
(differentiable cameras, reference projection.py:183-185).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops import lib
from taichi_gaussian_rasterizer_tpu.ops.projection import project_points, project_to_image
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)


def numpy_oracle(gaussians, camera, blur_cov, clamp_margin, alpha_threshold):
  """Independent numpy EWA projection (matrix form, no shortcuts)."""
  pos = np.asarray(gaussians.position, np.float64)
  scale = np.exp(np.asarray(gaussians.log_scaling, np.float64))
  rot = np.asarray(gaussians.rotation, np.float64)
  rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)
  alpha = 1 / (1 + np.exp(-np.asarray(gaussians.alpha_logit[:, 0], np.float64)))

  T = np.asarray(camera.T_camera_world, np.float64)
  fx, fy, cx, cy = np.asarray(camera.projection, np.float64)
  w, h = camera.image_size

  n = pos.shape[0]
  in_cam = (T[:3, :3] @ pos.T).T + T[:3, 3]
  z = in_cam[:, 2]
  uv = in_cam[:, :2] * [fx, fy] / z[:, None] + [cx, cy]

  # rotation matrices from quaternions (xyzw)
  x, y, zz, ww = rot.T
  R = np.stack([
      np.stack([1 - 2 * y**2 - 2 * zz**2, 2 * x * y - 2 * ww * zz, 2 * x * zz + 2 * ww * y], -1),
      np.stack([2 * x * y + 2 * ww * zz, 1 - 2 * x**2 - 2 * zz**2, 2 * y * zz - 2 * ww * x], -1),
      np.stack([2 * x * zz - 2 * ww * y, 2 * y * zz + 2 * ww * x, 1 - 2 * x**2 - 2 * y**2], -1),
  ], axis=1)

  t = np.clip(uv, np.array([-w, -h]) * clamp_margin,
              (np.array([w, h]) - 1) * (1 + clamp_margin))
  J = np.zeros((n, 2, 3))
  J[:, 0, 0] = fx / z
  J[:, 0, 2] = -(t[:, 0] - cx) / z
  J[:, 1, 1] = fy / z
  J[:, 1, 2] = -(t[:, 1] - cy) / z

  covs = []
  for i in range(n):
    S = np.diag(scale[i])
    sigma3 = R[i] @ S @ S @ R[i].T
    m = J[i] @ T[:3, :3]
    cov = m @ sigma3 @ m.T + np.eye(2) * blur_cov
    covs.append(cov)
  covs = np.stack(covs)

  eigvals, eigvecs = np.linalg.eigh(covs)
  sigma = np.sqrt(eigvals[:, ::-1])        # descending
  v1 = eigvecs[:, :, 1]                    # major

  return uv, z, sigma, v1, covs, alpha


@pytest.mark.parametrize("seed", range(10))
def test_projection_matches_oracle(seed):
  key = jax.random.PRNGKey(seed)
  k1, k2 = jax.random.split(key)
  camera = random_camera(k1, dtype=jnp.float64)
  gaussians = random_3d_gaussians(k2, 100, camera, dtype=jnp.float64)
  config = RasterConfig(blur_cov=0.3)

  points, depth, in_view = project_to_image(gaussians, camera, config)

  uv, z, sigma, v1, covs, alpha = numpy_oracle(
      gaussians, camera, config.blur_cov, config.clamp_margin,
      config.alpha_threshold)

  iv = np.asarray(in_view)
  assert iv.sum() > 10, "expected a mostly-visible random scene"

  mean_o, axis_o, sigma_o, alpha_o = (np.asarray(x) for x in
                                      lib.unpack_g2d(jnp.asarray(points)))
  np.testing.assert_allclose(mean_o[iv], uv[iv], rtol=1e-7, atol=1e-7)
  np.testing.assert_allclose(np.asarray(depth)[iv, 0], z[iv], rtol=1e-9)
  np.testing.assert_allclose(sigma_o[iv], sigma[iv], rtol=1e-6, atol=1e-9)
  np.testing.assert_allclose(alpha_o[iv], alpha[iv], rtol=1e-9)
  # axis defined up to sign
  dots = np.abs(np.einsum("ni,ni->n", axis_o[iv], v1[iv]))
  np.testing.assert_allclose(dots, 1.0, atol=1e-7)

  # culled rows are exact no-ops
  assert (alpha_o[~iv] == 0).all()
  assert (np.asarray(depth)[~iv, 0] == 0).all()


@pytest.mark.parametrize("seed", range(5))
def test_projection_gradcheck(seed):
  key = jax.random.PRNGKey(100 + seed)
  k1, k2 = jax.random.split(key)
  camera = random_camera(k1, image_size=(64, 48), dtype=jnp.float64)
  gaussians = random_3d_gaussians(k2, 15, camera, dtype=jnp.float64)

  def f(position, log_scaling, rotation, alpha_logit, T, proj):
    points, depth, in_view = project_points(
        position, log_scaling, rotation, alpha_logit, T, proj,
        camera.image_size, camera.depth_range, blur_cov=0.3)
    # sum-of-means loss over visible rows only (mask is data-independent
    # of the perturbation at this scale)
    return jnp.sum(points) + jnp.sum(depth)

  args = (*gaussians.shape_tensors(), camera.T_camera_world, camera.projection)
  check_grads(f, args, order=1, modes=["rev"], atol=2e-4, rtol=2e-4, eps=1e-6)


def test_projection_f32_close_to_f64():
  key = jax.random.PRNGKey(42)
  k1, k2 = jax.random.split(key)
  camera = random_camera(k1, dtype=jnp.float64)
  gaussians = random_3d_gaussians(k2, 200, camera, dtype=jnp.float64)

  p64, d64, v64 = project_to_image(gaussians, camera)
  g32 = jax.tree.map(lambda x: x.astype(jnp.float32), gaussians)
  p32, d32, v32 = project_to_image(g32, camera.astype(jnp.float32))

  agree = np.asarray(v64) == np.asarray(v32)
  assert agree.mean() > 0.98  # borderline culls may differ
  iv = np.asarray(v64) & np.asarray(v32)
  np.testing.assert_allclose(np.asarray(p32)[iv], np.asarray(p64)[iv],
                             rtol=1e-2, atol=1e-2)
  np.testing.assert_allclose(np.asarray(d32)[iv], np.asarray(d64)[iv],
                             rtol=1e-4)
