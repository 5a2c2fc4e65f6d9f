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
  # Whole pipeline on flat 1-D component columns (cf. mapper._footprint):
  # the (N, 2)/(N, 3) stacked intermediates the generic lib builds run at
  # 2-3 of 128 vreg lanes; columns pack lanes fully. The math is
  # identical to lib.project_gaussian + lib.eig, reassociated per
  # component; only the final (N, 7) pack is a narrow write.
  dtype = position.dtype
  T = T_camera_world.astype(dtype)
  fx, fy, cx, cy = (projection.astype(dtype)[i] for i in range(4))
  w_size, h_size = image_size

  pxw = position[:, 0]
  pyw = position[:, 1]
  pzw = position[:, 2]

  # normalized quaternion -> rotation matrix components (generic.py:407)
  qx, qy, qz, qw = (rotation[:, i] for i in range(4))
  qn = jnp.sqrt(jnp.maximum(qx * qx + qy * qy + qz * qz + qw * qw, 1e-32))
  qx, qy, qz, qw = qx / qn, qy / qn, qz / qn, qw / qn
  xx, yy, zz = qx * qx, qy * qy, qz * qz
  R = ((1 - 2 * yy - 2 * zz, 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)),
       (2 * (qx * qy + qw * qz), 1 - 2 * xx - 2 * zz, 2 * (qy * qz - qw * qx)),
       (2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * xx - 2 * yy))
  s0 = jnp.exp(log_scaling[:, 0])
  s1 = jnp.exp(log_scaling[:, 1])
  s2 = jnp.exp(log_scaling[:, 2])

  # camera transform + pinhole projection (generic.py:95-121)
  in_cam = [pxw * T[i, 0] + pyw * T[i, 1] + pzw * T[i, 2] + T[i, 3]
            for i in range(3)]
  z = in_cam[2]
  inv_z = 1.0 / z
  mx = fx * in_cam[0] * inv_z + cx
  my = fy * in_cam[1] * inv_z + cy

  # position-clamped affine Jacobian rows (generic.py:109-118):
  # J = [[fx/z, 0, -(tx-cx)/z], [0, fy/z, -(ty-cy)/z]]
  tx = jnp.clip(mx, -w_size * clamp_margin,
                (w_size - 1) * (1 + clamp_margin))
  ty = jnp.clip(my, -h_size * clamp_margin,
                (h_size - 1) * (1 + clamp_margin))
  j00 = fx * inv_z
  j11 = fy * inv_z
  j02 = -(tx - cx) * inv_z
  j12 = -(ty - cy) * inv_z

  # EWA: m = J W (R S); cov = m m^T upper-tri (generic.py:125-143)
  jw0 = [j00 * T[0, k] + j02 * T[2, k] for k in range(3)]
  jw1 = [j11 * T[1, k] + j12 * T[2, k] for k in range(3)]
  s = (s0, s1, s2)
  m0 = [(jw0[0] * R[0][l] + jw0[1] * R[1][l] + jw0[2] * R[2][l]) * s[l]
        for l in range(3)]
  m1 = [(jw1[0] * R[0][l] + jw1[1] * R[1][l] + jw1[2] * R[2][l]) * s[l]
        for l in range(3)]
  cov_a = m0[0] * m0[0] + m0[1] * m0[1] + m0[2] * m0[2] + blur_cov
  cov_b = m0[0] * m1[0] + m0[1] * m1[1] + m0[2] * m1[2]
  cov_c = m1[0] * m1[0] + m1[1] * m1[1] + m1[2] * m1[2] + blur_cov

  # closed-form 2x2 symmetric eigendecomposition (lib.eig, columnized)
  tr = cov_a + cov_c
  det = cov_a * cov_c - cov_b * cov_b
  gap_floor = 1e-12 * tr * tr + 1e-36
  sqrt_gap = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, gap_floor))
  lam1 = (tr + sqrt_gap) * 0.5
  lam2 = (tr - sqrt_gap) * 0.5
  c1x, c1y = cov_a - lam2, cov_b                  # candidate eigenvectors
  c2x, c2y = cov_b, cov_c - lam2
  n1 = c1x * c1x + c1y * c1y
  n2 = c2x * c2x + c2y * c2y
  pick1 = n1 >= n2
  vx = jnp.where(pick1, c1x, c2x)
  vy = jnp.where(pick1, c1y, c2y)
  iso = (n1 + n2) < 1e-30
  vx = jnp.where(iso, 1.0, vx)
  vy = jnp.where(iso, 0.0, vy)
  vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy, 1e-32))
  ax = vx / vn
  ay = vy / vn
  sig1 = jnp.sqrt(jnp.maximum(lam1, 0.0))
  sig2 = jnp.sqrt(jnp.maximum(lam2, 0.0))

  alpha = lib.sigmoid(alpha_logit[:, 0])

  # The cull decision is non-differentiable; stop_gradient keeps nan-prone
  # paths (sqrt at 0 in the adaptive cutoff) out of the backward graph.
  sg = jax.lax.stop_gradient
  alpha_c = sg(alpha)
  gs = lib.gaussian_scale_factor(alpha_c, alpha_threshold)
  r0 = sg(sig1) * gs
  r1 = sg(sig2) * gs
  ax_c, ay_c = sg(ax), sg(ay)
  ext_x = jnp.sqrt((ax_c * r0) ** 2 + (ay_c * r1) ** 2)
  ext_y = jnp.sqrt((ay_c * r0) ** 2 + (ax_c * r1) ** 2)
  mx_c, my_c, z_c = sg(mx), sg(my), sg(z)

  near, far = depth_range
  in_view = ((z_c > near) & (z_c < far)
             & (mx_c + ext_x > 0) & (my_c + ext_y > 0)
             & (mx_c - ext_x < w_size) & (my_c - ext_y < h_size)
             & (alpha_c > alpha_threshold))

  keepf = in_view.astype(dtype)
  points = jnp.stack(
      [mx * keepf, my * keepf, ax * keepf, ay * keepf,
       sig1 * keepf, sig2 * keepf, alpha * keepf], axis=-1)
  depth = (z * keepf)[:, None]
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
