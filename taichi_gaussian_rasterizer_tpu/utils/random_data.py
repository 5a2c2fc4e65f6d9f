"""Random scene generators for tests and benchmarks.

Rebuild of /root/reference/taichi_splatting/tests/random_data.py: cameras
with random pose/fov/principal point, and 3D gaussians placed by
*unprojecting* uniform image uv at uniform NDC depth so most land in the
frustum, scale proportional to depth/fx (random_data.py:50-77).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..data_types import Gaussians2D, Gaussians3D, inverse_sigmoid
from ..ops import lib
from ..ops.projection import CameraParams


def unproject_points_camera(uv, depth, projection):
  """Image uv + depth -> camera-space xyz via closed-form K^-1."""
  fx, fy, cx, cy = (projection[i] for i in range(4))
  x = (uv[..., 0:1] - cx) * depth / fx
  y = (uv[..., 1:2] - cy) * depth / fy
  return jnp.concatenate([x, y, depth], axis=-1)


def unproject_points(uv, depth, camera: "CameraParams"):
  """Inverse of the full image projection (torch_lib/projection.py:57-62),
  using closed-form intrinsic and rigid inverses — a general 4x4
  `linalg.inv` of T_image_world is too ill-conditioned for f32 on TPU.

  The R^T (x - t) product is unrolled to elementwise ops: an `@` would
  hit the MXU at bf16 precision on TPU, making the generated scene
  backend-dependent (CPU vs TPU tests would diverge at the input)."""
  cam_xyz = unproject_points_camera(uv, depth, camera.projection)
  R, t = lib.split_rt(camera.T_camera_world)
  d = cam_xyz - t
  return jnp.stack(
      [d[..., 0] * R[0, i] + d[..., 1] * R[1, i] + d[..., 2] * R[2, i]
       for i in range(3)], axis=-1)


def random_camera(key, pos_scale: float = 1.0,
                  image_size: Optional[Tuple[int, int]] = None,
                  image_size_range: Tuple[int, int] = (256, 1024),
                  near_plane: float = 0.1,
                  dtype=jnp.float32) -> CameraParams:
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)

  q = lib.safe_normalize(jax.random.normal(k1, (4,), dtype))
  t = jax.random.normal(k2, (3,), dtype) * pos_scale
  # closed-form rigid inverse (f32 linalg.inv is inaccurate on TPU);
  # R^T t unrolled elementwise so the camera is backend-identical (an
  # `@` runs at bf16 on the TPU MXU)
  R = lib.quat_to_mat(q)
  rt_t = jnp.stack(
      [R[0, i] * t[0] + R[1, i] * t[1] + R[2, i] * t[2] for i in range(3)])
  T_camera_world = lib.join_rt(R.T, -rt_t)

  if image_size is None:
    min_size, max_size = image_size_range
    image_size = tuple(
        int(x) for x in jax.random.randint(k3, (2,), min_size, max_size))

  w, h = image_size
  c = (jnp.asarray([w / 2, h / 2], dtype)
       + jax.random.normal(k4, (2,), dtype) * (w / 20))

  fov = jnp.deg2rad(jax.random.uniform(k5, (), dtype) * 70 + 30)
  f = w / (2 * jnp.tan(fov / 2))

  projection = jnp.asarray([f, f * 1.0, c[0], c[1]], dtype)

  return CameraParams(
      T_camera_world=T_camera_world.astype(dtype),
      projection=projection,
      image_size=(w, h),
      near_plane=near_plane,
      far_plane=near_plane * 1000.0)


def random_3d_gaussians(key, n: int, camera_params: CameraParams,
                        scale_factor: float = 1.0,
                        alpha_range=(0.1, 0.9), margin: float = 0.0,
                        sh_degree: Optional[int] = None,
                        dtype=jnp.float32) -> Gaussians3D:
  keys = jax.random.split(key, 6)
  w, h = camera_params.image_size

  uv = ((jax.random.uniform(keys[0], (n, 2), dtype) * (1 + margin)
         - margin * 0.5) * jnp.asarray([w, h], dtype))
  depth = lib.inverse_ndc_depth(
      jax.random.uniform(keys[1], (n,), dtype),
      camera_params.near_plane, camera_params.far_plane)

  position = unproject_points(uv, depth[:, None], camera_params)
  fx = camera_params.projection[0]

  scale = (w / math.sqrt(max(n, 1))) * (depth / fx) * scale_factor
  scaling = (jax.random.uniform(keys[2], (n, 3), dtype) + 0.2) * scale[:, None]

  rotation = lib.safe_normalize(jax.random.normal(keys[3], (n, 4), dtype))

  low, high = alpha_range
  alpha = jax.random.uniform(keys[4], (n,), dtype) * (high - low) + low

  if sh_degree is None:
    feature = jax.random.uniform(keys[5], (n, 3), dtype)
  else:
    k = (sh_degree + 1) ** 2
    feature = jax.random.uniform(keys[5], (n, 3, k), dtype) - 0.5

  return Gaussians3D(
      position=position,
      log_scaling=jnp.log(scaling),
      rotation=rotation,
      alpha_logit=inverse_sigmoid(alpha)[:, None],
      feature=feature)


def random_2d_gaussians(key, n: int, image_size: Tuple[int, int],
                        num_channels: int = 3, scale_factor: float = 1.0,
                        alpha_range=(0.1, 0.9), depth_range=(0.0, 1.0),
                        dtype=jnp.float32) -> Gaussians2D:
  keys = jax.random.split(key, 6)
  w, h = image_size

  position = jax.random.uniform(keys[0], (n, 2), dtype) * jnp.asarray([w, h], dtype)
  depth = (jax.random.uniform(keys[1], (n, 1), dtype)
           * (depth_range[1] - depth_range[0]) + depth_range[0])

  density_scale = scale_factor * w / (1 + math.sqrt(n))
  scaling = (jax.random.uniform(keys[2], (n, 2), dtype) + 0.2) * density_scale

  rotation = lib.safe_normalize(jax.random.normal(keys[3], (n, 2), dtype))

  low, high = alpha_range
  alpha = jax.random.uniform(keys[4], (n,), dtype) * (high - low) + low

  return Gaussians2D(
      position=position,
      z_depth=depth,
      log_scaling=jnp.log(scaling),
      rotation=rotation,
      alpha_logit=inverse_sigmoid(alpha)[:, None],
      feature=jax.random.uniform(keys[5], (n, num_channels), dtype))
