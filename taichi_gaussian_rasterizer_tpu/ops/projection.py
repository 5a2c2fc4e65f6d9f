"""Perspective projection of 3D gaussians to screen space.

TPU-native rebuild of /root/reference/taichi_splatting/perspective/
(projection.py + params.py). Differences by design:

* Pure jnp + `jax.grad`: no custom kernel and no hand-written backward —
  XLA fuses the per-point math, and autodiff replaces the reference's
  Taichi-autodiff `indexed_project_kernel` (projection.py:84-118) and the
  `restore_grad` bridge.
* Static shapes: no `torch.nonzero` compaction (projection.py:146-148).
  All N points are returned along with an `in_view` mask; culled points
  get alpha = 0 and depth = 0, which makes them zero-overlap no-ops in the
  tile mapper and rasterizer.
* Gradients flow to all four gaussian tensors and to `T_camera_world` and
  the projection intrinsics (differentiable cameras; projection.py:183-185)
  simply because everything is traced.
"""

from dataclasses import dataclass, replace, fields
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from ..data_types import Gaussians3D
from . import lib


@dataclass(frozen=True)
class CameraParams:
  """Camera model (reference perspective/params.py:8-102)."""
  projection: jax.Array       # (4,) [fx, fy, cx, cy]
  T_camera_world: jax.Array   # (4, 4) world -> camera
  near_plane: float
  far_plane: float
  image_size: Tuple[int, int]  # (width, height) -- static

  @property
  def depth_range(self):
    return (self.near_plane, self.far_plane)

  @property
  def dtype(self):
    return self.projection.dtype

  @property
  def focal_length(self):
    return self.projection[0:2]

  @property
  def principal_point(self):
    return self.projection[2:4]

  @property
  def T_image_camera(self):
    fx, fy, cx, cy = (self.projection[i] for i in range(4))
    z, o = jnp.zeros_like(fx), jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([fx, z, cx]), jnp.stack([z, fy, cy]), jnp.stack([z, z, o])])

  @property
  def T_image_world(self):
    T = jnp.eye(4, dtype=self.dtype).at[0:3, 0:3].set(self.T_image_camera)
    return T @ self.T_camera_world

  @property
  def camera_position(self):
    """Camera origin in world coordinates (params.py:75-78), computed from
    the rigid inverse rather than a general 4x4 inversion. R^T t is
    unrolled elementwise: a 3x3 `@` runs at bf16 on the TPU MXU, which
    would make the camera position backend-dependent."""
    R, t = lib.split_rt(self.T_camera_world)
    return -jnp.stack(
        [R[0, i] * t[0] + R[1, i] * t[1] + R[2, i] * t[2] for i in range(3)])

  def transformed(self, t: jax.Array) -> "CameraParams":
    return replace(self, T_camera_world=t @ self.T_camera_world)

  def scale_image(self, scale: float) -> "CameraParams":
    w, h = self.image_size
    return replace(self, image_size=(int(w * scale), int(h * scale)),
                   projection=self.projection * scale)

  def astype(self, dtype) -> "CameraParams":
    return replace(self, projection=self.projection.astype(dtype),
                   T_camera_world=self.T_camera_world.astype(dtype))

  def __post_init__(self):
    assert len(self.image_size) == 2
    assert self.near_plane > 0 and self.far_plane > self.near_plane


jax.tree_util.register_dataclass(
    CameraParams,
    data_fields=["projection", "T_camera_world"],
    meta_fields=["near_plane", "far_plane", "image_size"])


def project_points(
    position: jax.Array,       # (N, 3)
    log_scaling: jax.Array,    # (N, 3)
    rotation: jax.Array,       # (N, 4)
    alpha_logit: jax.Array,    # (N, 1)
    T_camera_world: jax.Array,  # (4, 4) or (3, 4)
    projection: jax.Array,     # (4,)
    image_size: Tuple[int, int],
    depth_range: Tuple[float, float],
    blur_cov: float = 0.3,
    clamp_margin: float = 0.15,
    alpha_threshold: float = 1.0 / 255.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Project all N gaussians; the functional core (reference
  projection.py:32-80 `project_kernel`).

  Returns:
    points: (N, 7) packed 2D gaussians [mean, axis, sigma, alpha];
      culled rows have alpha = 0
    depth:  (N, 1) camera-space z; culled rows are 0 (reference convention,
      projection.py:71)
    in_view: (N,) bool visibility mask (replaces the reference's compacted
      `indexes`)
  """
  dtype = position.dtype
  cam = T_camera_world[:3, :].astype(dtype)
  proj = projection.astype(dtype)
  size = jnp.asarray(image_size, dtype=dtype)

  rot = lib.safe_normalize(rotation)
  scale = jnp.exp(log_scaling)

  mean, z, cov = lib.project_gaussian(
      cam, proj, size, position, rot, scale, clamp_margin)

  if blur_cov > 0:
    cov = cov + jnp.asarray([blur_cov, 0.0, blur_cov], dtype=dtype)

  sigma, v1, _ = lib.eig(cov)

  alpha = lib.sigmoid(alpha_logit[..., 0])

  # The cull decision is non-differentiable; stop_gradient keeps nan-prone
  # paths (sqrt at 0 in the adaptive cutoff) out of the backward graph.
  sg = jax.lax.stop_gradient
  mean_c, v1_c, sigma_c, alpha_c, z_c = map(sg, (mean, v1, sigma, alpha, z))
  gaussian_scale = lib.gaussian_scale_factor(alpha_c, alpha_threshold)

  radii = sigma_c * gaussian_scale[..., None]
  lower, upper = lib.ellipse_bounds(
      mean_c, v1_c * radii[..., 0:1], lib.perp(v1_c) * radii[..., 1:2])

  near, far = depth_range
  in_view = ((z_c > near) & (z_c < far)
             & jnp.all(upper > 0, axis=-1)
             & jnp.all(lower < size, axis=-1)
             & (alpha_c > alpha_threshold))

  keep = in_view[..., None]
  points = lib.pack_g2d(mean, v1, sigma, alpha) * keep
  depth = jnp.where(keep, z[..., None], 0.0)
  return points, depth, in_view


def project_to_image(
    gaussians: Gaussians3D, camera_params: CameraParams,
    config: RasterConfig = RasterConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Project 3D gaussians to 2D image-space gaussians using the EWA
  approximation (Zwicker et al., "EWA splatting", 2002). Public wrapper
  mirroring reference perspective/projection.py:218-248.

  Returns (points (N,7), depth (N,1), in_view (N,) bool mask).
  """
  return project_points(
      *gaussians.shape_tensors(),
      camera_params.T_camera_world,
      camera_params.projection,
      camera_params.image_size,
      camera_params.depth_range,
      blur_cov=config.blur_cov,
      clamp_margin=config.clamp_margin,
      alpha_threshold=config.alpha_threshold)
