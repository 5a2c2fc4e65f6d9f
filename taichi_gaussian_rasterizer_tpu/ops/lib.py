"""Pure-jnp math library.

TPU-native rebuild of the reference's Taichi math namespace
(/root/reference/taichi_splatting/taichi_lib/generic.py). Unlike the
reference there is no dtype-specialized dual library: every function is
dtype-polymorphic (float64 comes from `jax.config.jax_enable_x64` in
tests), and gradients come from `jax.grad` instead of Taichi autodiff.

All functions are written batched: inputs may carry arbitrary leading
dimensions; the documented shapes are the trailing ones.
"""

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def sigmoid(x):
  return jax.nn.sigmoid(x)


def inverse_sigmoid(x):
  return -jnp.log(1.0 / x - 1.0)


def perp(v):
  """90-degree rotation of a 2D vector (generic.py:306-308)."""
  return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def dot(a, b):
  return jnp.sum(a * b, axis=-1)


def safe_normalize(v, eps=1e-32):
  """Normalize with a nan-free gradient at v == 0 (where-trick)."""
  sq = jnp.sum(v * v, axis=-1, keepdims=True)
  ok = sq > eps
  sq = jnp.where(ok, sq, 1.0)
  return jnp.where(ok, v / jnp.sqrt(sq), 0.0)


# ---------------------------------------------------------------------------
# quaternion algebra (generic.py:407-485); quaternion layout is xyzw
# ---------------------------------------------------------------------------


def quat_to_mat(q):
  """(..., 4) xyzw -> (..., 3, 3) rotation matrix (generic.py:407-416)."""
  x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  x2, y2, z2 = x * x, y * y, z * z
  rows = [
      [1 - 2 * y2 - 2 * z2, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
      [2 * x * y + 2 * w * z, 1 - 2 * x2 - 2 * z2, 2 * y * z - 2 * w * x],
      [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x2 - 2 * y2],
  ]
  return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def scaled_quat_to_mat(q, s):
  """R @ diag(s): rotation with scaled columns (generic.py:418-427)."""
  return quat_to_mat(q) * s[..., None, :]


def quat_mul(q1, q2):
  """Hamilton product, xyzw layout (generic.py:467-474)."""
  x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
  x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
  return jnp.stack([
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
  ], axis=-1)


def quat_conj(q):
  return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_rotate(q, v):
  qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
  return quat_mul(quat_mul(q, qv), quat_conj(q))[..., :3]


def join_rt(r, t):
  """(3,3) rotation + (3,) translation -> (4,4) homogeneous transform."""
  top = jnp.concatenate([r, t[..., :, None]], axis=-1)
  bottom = jnp.broadcast_to(
      jnp.array([0, 0, 0, 1], dtype=top.dtype), top.shape[:-2] + (1, 4))
  return jnp.concatenate([top, bottom], axis=-2)


def split_rt(rt):
  return rt[..., :3, :3], rt[..., :3, 3]


# ---------------------------------------------------------------------------
# 2x2 symmetric eigendecomposition & ellipse math (generic.py:207-273)
# covariances stored as upper-triangular vec3 (a, b, c) = [[a, b], [b, c]]
# ---------------------------------------------------------------------------


def upper(cov_mat):
  """(..., 2, 2) -> (..., 3) upper-triangular (generic.py:265-267)."""
  return jnp.stack(
      [cov_mat[..., 0, 0], cov_mat[..., 0, 1], cov_mat[..., 1, 1]], axis=-1)


def inverse_cov(cov):
  """Inverse of a symmetric 2x2 in vec3 form (generic.py:258-262)."""
  a, b, c = cov[..., 0], cov[..., 1], cov[..., 2]
  inv_det = 1.0 / (a * c - b * b)
  return jnp.stack([inv_det * c, -inv_det * b, inv_det * a], axis=-1)


def eig(cov):
  """Closed-form 2x2 symmetric eigendecomposition (generic.py:216-230).

  Returns (sigma (...,2) = sqrt eigenvalues desc, v1 (...,2) major
  eigenvector, v2 (...,2) = perp(v1)). More robust than the reference for
  near-axis-aligned covariances: picks the better-conditioned eigenvector
  formula of the two candidates instead of always normalize([a-l2, b]).
  """
  a, b, c = cov[..., 0], cov[..., 1], cov[..., 2]
  tr = a + c
  det = a * c - b * b
  # relative floor keeps d(sqrt)/d(gap) finite at repeated eigenvalues
  # (isotropic gaussians), where the eigenvector is ill-defined anyway;
  # the forward perturbation is O(1e-6 * tr)
  gap_floor = 1e-12 * tr * tr + 1e-36
  gap = jnp.maximum(tr * tr - 4 * det, gap_floor)
  sqrt_gap = jnp.sqrt(gap)
  lam1 = (tr + sqrt_gap) * 0.5
  lam2 = (tr - sqrt_gap) * 0.5

  # two algebraically-equivalent candidates for the major eigenvector;
  # pick per-element the one with larger norm (avoids 0/0 when b -> 0)
  cand1 = jnp.stack([a - lam2, b], axis=-1)       # reference's choice
  cand2 = jnp.stack([b, c - lam2], axis=-1)
  n1 = jnp.sum(cand1 * cand1, axis=-1)
  n2 = jnp.sum(cand2 * cand2, axis=-1)
  v = jnp.where((n1 >= n2)[..., None], cand1, cand2)
  # fully isotropic (b==0, a==c): any direction; use x-axis
  iso = (n1 + n2) < 1e-30
  v = jnp.where(iso[..., None],
                jnp.broadcast_to(jnp.array([1.0, 0.0], v.dtype), v.shape), v)
  v1 = safe_normalize(v)
  v2 = perp(v1)
  sigma = jnp.sqrt(jnp.maximum(jnp.stack([lam1, lam2], axis=-1), 0.0))
  return sigma, v1, v2


def radii_from_cov(cov):
  """sqrt of the larger eigenvalue (generic.py:207-214)."""
  a, b, c = cov[..., 0], cov[..., 1], cov[..., 2]
  d = a - c
  max_eig_sq = (a + c + jnp.sqrt(d * d + 4.0 * b * b)) / 2.0
  return jnp.sqrt(jnp.maximum(max_eig_sq, 0.0))


def radii_from_conic(conic):
  return radii_from_cov(inverse_cov(conic))


def ellipse_bounds(uv, v1, v2):
  """AABB of an ellipse given its scaled axes (generic.py:234-237)."""
  extent = jnp.sqrt(v1 ** 2 + v2 ** 2)
  return uv - extent, uv + extent


def cov_axes(cov):
  sigma, v1, v2 = eig(cov)
  return v1 * sigma[..., 0:1], v2 * sigma[..., 1:2]


def gaussian_scale_factor(alpha, alpha_threshold):
  """Adaptive cutoff radius factor sqrt(2 ln(alpha/threshold))
  (grid_query.py:76, projection.py:61); nan-guarded for alpha <= threshold."""
  ratio = jnp.maximum(alpha / alpha_threshold, 1.0)
  return jnp.sqrt(2.0 * jnp.log(ratio))


# ---------------------------------------------------------------------------
# gaussian pdfs (generic.py:276-404)
# ---------------------------------------------------------------------------


def conic_pdf(xy, uv, conic):
  """exp(-0.5 d^T C d) in conic form (generic.py:276-283)."""
  d = xy - uv
  a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
  dx, dy = d[..., 0], d[..., 1]
  inner = 0.5 * (dx * dx * a + dy * dy * c) + dx * dy * b
  return jnp.exp(-inner)


def gaussian_pdf(xy, mean, axis, sigma):
  """Eigen-basis gaussian pdf (generic.py:310-317).

  xy, mean, axis: (..., 2); sigma: (..., 2). axis is the unit major
  eigenvector; sigma the per-axis standard deviations.
  """
  d = xy - mean
  tx = dot(d, axis) / sigma[..., 0]
  ty = dot(d, perp(axis)) / sigma[..., 1]
  return jnp.exp(-0.5 * (tx * tx + ty * ty))


def approx_gaussian_cdf(x, sigma=1.0):
  """Sigmoid approximation of the gaussian CDF (generic.py:340-344)."""
  z = x / sigma
  return jax.nn.sigmoid(1.6 * z + 0.07 * z ** 3)


def gaussian_pdf_antialias(xy, mean, axis, sigma):
  """Analytic antialiased pdf: per-axis box integral over a 1px footprint
  using the sigmoid CDF approximation (generic.py:347-357)."""
  d = xy - mean
  sx, sy = sigma[..., 0], sigma[..., 1]
  tx = dot(d, axis)
  ty = dot(d, perp(axis))

  ix = sx * (approx_gaussian_cdf(tx + 0.5, sx) - approx_gaussian_cdf(tx - 0.5, sx))
  iy = sy * (approx_gaussian_cdf(ty + 0.5, sy) - approx_gaussian_cdf(ty - 0.5, sy))
  return 2.0 * jnp.pi * ix * iy


# ---------------------------------------------------------------------------
# perspective projection / EWA (generic.py:95-158)
# ---------------------------------------------------------------------------


def project_with_jacobian(position, camera_t_world, projection, image_size,
                          clamp_margin):
  """Pinhole projection + position-clamped affine Jacobian
  (generic.py:95-121).

  position: (..., 3); camera_t_world: (..., 3, 4); projection: (..., 4)
  [fx, fy, cx, cy]; image_size: (2,) [w, h].
  Returns uv (..., 2), z (...), J (..., 2, 3).
  """
  f = projection[..., 0:2]
  c = projection[..., 2:4]

  if camera_t_world.ndim == 2:
    # unbatched camera: unrolled affine transform (broadcasted scalar ops
    # fuse on the VPU; a batched (N,4)x(4,3) matmul would waste the MXU)
    T = camera_t_world
    in_camera = jnp.stack(
        [position[..., 0] * T[i, 0] + position[..., 1] * T[i, 1]
         + position[..., 2] * T[i, 2] + T[i, 3] for i in range(3)],
        axis=-1)
  else:
    homog = jnp.concatenate(
        [position, jnp.ones_like(position[..., :1])], axis=-1)
    in_camera = jnp.einsum("...ij,...j->...i", camera_t_world, homog)

  z = in_camera[..., 2]
  uv = f * in_camera[..., 0:2] / z[..., None] + c

  t = jnp.clip(uv, -image_size * clamp_margin,
               (image_size - 1) * (1 + clamp_margin))

  zero = jnp.zeros_like(z)
  row0 = jnp.stack([f[..., 0] / z, zero, -(t[..., 0] - c[..., 0]) / z], axis=-1)
  row1 = jnp.stack([zero, f[..., 1] / z, -(t[..., 1] - c[..., 1]) / z], axis=-1)
  J = jnp.stack([row0, row1], axis=-2)
  return uv, z, J


def gaussian_covariance_in_image(camera_t_world, cov_rotation, cov_scale, J):
  """EWA projected covariance: m = J W (R S); cov = m m^T
  (generic.py:125-143). Returns upper-triangular vec3.

  Unrolled to elementwise ops over the batch: batched 2x3 * 3x3 einsums
  lower to tiny MXU matmuls with ~2% utilization; as scalar vector math
  the whole chain stays on the VPU and fuses."""
  W = camera_t_world[..., :3, :3]
  RS = scaled_quat_to_mat(cov_rotation, cov_scale)
  # jw[..., i, k] = sum_j J[..., i, j] * W[j, k]  (W unbatched or batched)
  jw = jnp.einsum("...ij,...jk->...ik", J, W) if W.ndim > 2 else None
  if jw is None:
    jw = jnp.stack([
        jnp.stack([sum(J[..., i, j] * W[j, k] for j in range(3))
                   for k in range(3)], axis=-1)
        for i in range(2)], axis=-2)
  # m[..., i, l] = sum_k jw[..., i, k] * RS[..., k, l]
  m = [[sum(jw[..., i, k] * RS[..., k, l] for k in range(3))
        for l in range(3)] for i in range(2)]
  a = m[0][0] * m[0][0] + m[0][1] * m[0][1] + m[0][2] * m[0][2]
  b = m[0][0] * m[1][0] + m[0][1] * m[1][1] + m[0][2] * m[1][2]
  c = m[1][0] * m[1][0] + m[1][1] * m[1][1] + m[1][2] * m[1][2]
  return jnp.stack([a, b, c], axis=-1)


def project_gaussian(camera_t_world, projection, image_size, position,
                     rotation, scale, clamp_margin):
  """Full EWA gaussian projection (generic.py:145-158).
  Returns uv (...,2), depth (...), cov vec3 (...,3)."""
  uv, depth, J = project_with_jacobian(
      position, camera_t_world, projection, image_size, clamp_margin)
  cov = gaussian_covariance_in_image(camera_t_world, rotation, scale, J)
  return uv, depth, cov


# ---------------------------------------------------------------------------
# depth parameterizations (torch_lib/projection.py:119-135)
# ---------------------------------------------------------------------------


def ndc_depth(depth, near, far):
  """NDC depth in [0 (near), 1 (far)] (torch_lib/projection.py:121-123)."""
  return 1.0 - (1.0 / depth - 1.0 / far) / (1.0 / near - 1.0 / far)


def inverse_ndc_depth(ndc, near, far):
  return 1.0 / ((1.0 - ndc) * (1.0 / near - 1.0 / far) + 1.0 / far)


# ---------------------------------------------------------------------------
# packing helpers for the 7-float 2D gaussian wire format
# ---------------------------------------------------------------------------


def pack_g2d(mean, axis, sigma, alpha):
  """(...,2),(...,2),(...,2),(...,) -> (...,7)"""
  return jnp.concatenate([mean, axis, sigma, alpha[..., None]], axis=-1)


def unpack_g2d(vec):
  """(...,7) -> mean, axis, sigma, alpha"""
  return vec[..., 0:2], vec[..., 2:4], vec[..., 4:6], vec[..., 6]
