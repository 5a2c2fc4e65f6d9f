"""Unit tests of the pure-jnp math library against independent numpy oracles.

Mirrors the reference's dual-implementation strategy (SURVEY.md §4): every
closed-form routine is checked against a generic numpy/linalg computation,
plus float64 gradient checks via jax.test_util.check_grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu.ops import lib

pytestmark = pytest.mark.quick


def rand(key, *shape):
  return jax.random.normal(key, shape, dtype=jnp.float64)


def random_cov(key, n):
  m = jax.random.normal(key, (n, 2, 2), dtype=jnp.float64)
  cov = jnp.einsum("nij,nkj->nik", m, m) + 0.05 * jnp.eye(2)
  return lib.upper(cov)


@pytest.mark.parametrize("seed", range(5))
def test_eig_against_numpy(seed):
  key = jax.random.PRNGKey(seed)
  cov = random_cov(key, 100)
  sigma, v1, v2 = lib.eig(cov)

  mats = np.array(
      [[cov[:, 0], cov[:, 1]], [cov[:, 1], cov[:, 2]]]).transpose(2, 0, 1)
  w, v = np.linalg.eigh(mats)  # ascending eigenvalues

  np.testing.assert_allclose(np.asarray(sigma[:, 0]), np.sqrt(w[:, 1]), rtol=1e-9)
  np.testing.assert_allclose(np.asarray(sigma[:, 1]), np.sqrt(np.maximum(w[:, 0], 0)),
                             rtol=1e-7, atol=1e-9)
  # eigenvector parity: v1 parallel to numpy's major eigenvector
  dots = np.abs(np.einsum("ni,ni->n", np.asarray(v1), v[:, :, 1]))
  np.testing.assert_allclose(dots, 1.0, atol=1e-9)
  # v2 is perpendicular
  np.testing.assert_allclose(
      np.einsum("ni,ni->n", np.asarray(v1), np.asarray(v2)), 0.0, atol=1e-12)


def test_eig_axis_aligned():
  # degenerate case the reference formula nan's on: b == 0 with a < c
  cov = jnp.array([[1.0, 0.0, 4.0], [4.0, 0.0, 1.0], [2.0, 0.0, 2.0]])
  sigma, v1, _ = lib.eig(cov)
  assert np.isfinite(np.asarray(v1)).all()
  np.testing.assert_allclose(np.abs(np.asarray(v1[0])), [0.0, 1.0], atol=1e-12)
  np.testing.assert_allclose(np.abs(np.asarray(v1[1])), [1.0, 0.0], atol=1e-12)
  np.testing.assert_allclose(np.asarray(sigma[0]), [2.0, 1.0], atol=1e-12)


def test_eig_reconstruction_and_grads():
  key = jax.random.PRNGKey(3)
  cov = random_cov(key, 50)
  sigma, v1, v2 = lib.eig(cov)
  # reconstruct: cov = s1^2 v1 v1^T + s2^2 v2 v2^T
  s1 = (sigma[:, 0] ** 2)[:, None, None]
  s2 = (sigma[:, 1] ** 2)[:, None, None]
  rec = (s1 * v1[:, :, None] * v1[:, None, :]
         + s2 * v2[:, :, None] * v2[:, None, :])
  np.testing.assert_allclose(np.asarray(lib.upper(rec)), np.asarray(cov),
                             rtol=1e-8, atol=1e-10)
  check_grads(lambda c: lib.eig(c)[0], (cov,), order=1, modes=["rev"],
              atol=1e-5, rtol=1e-5)


def test_inverse_cov():
  key = jax.random.PRNGKey(0)
  cov = random_cov(key, 20)
  inv = lib.inverse_cov(cov)
  a, b, c = cov[:, 0], cov[:, 1], cov[:, 2]
  ia, ib, ic = inv[:, 0], inv[:, 1], inv[:, 2]
  # product == identity
  np.testing.assert_allclose(np.asarray(a * ia + b * ib), 1.0, rtol=1e-9)
  np.testing.assert_allclose(np.asarray(a * ib + b * ic), 0.0, atol=1e-9)
  np.testing.assert_allclose(np.asarray(b * ib + c * ic), 1.0, rtol=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_conic_vs_eigen_pdf(seed):
  """The eigen-basis pdf must agree with the conic-form pdf on the same
  covariance (reference test_conic.py analog)."""
  key = jax.random.PRNGKey(seed)
  k1, k2, k3 = jax.random.split(key, 3)
  cov = random_cov(k1, 30)
  mean = rand(k2, 30, 2) * 5
  xy = rand(k3, 30, 2) * 5

  sigma, v1, _ = lib.eig(cov)
  p_eig = lib.gaussian_pdf(xy, mean, v1, sigma)
  p_conic = lib.conic_pdf(xy, mean, lib.inverse_cov(cov))
  np.testing.assert_allclose(np.asarray(p_eig), np.asarray(p_conic),
                             rtol=1e-8, atol=1e-12)

  check_grads(lib.gaussian_pdf, (xy, mean, v1, sigma), order=1,
              modes=["rev"], atol=1e-5, rtol=1e-5)
  check_grads(lib.conic_pdf, (xy, mean, lib.inverse_cov(cov)), order=1,
              modes=["rev"], atol=1e-5, rtol=1e-5)


def test_antialias_pdf_matches_box_integral():
  """The analytic antialiased pdf approximates the box integral of the pdf
  over a 1px footprint, times 2*pi*sx*sy (generic.py:347-357)."""
  key = jax.random.PRNGKey(1)
  k1, k2 = jax.random.split(key)
  mean = jnp.zeros((16, 2), jnp.float64)
  axis = lib.safe_normalize(rand(k1, 16, 2))
  sigma = jnp.exp(rand(k2, 16, 2) * 0.3 + 1.0)  # sigma >~ 1px
  xy = rand(key, 16, 2) * 2

  aa = lib.gaussian_pdf_antialias(xy, mean, axis, sigma)

  # numerical box integral in the gaussian's eigen frame (vectorized grid)
  ticks = jnp.linspace(-0.5, 0.5, 41, dtype=jnp.float64)
  dx, dy = jnp.meshgrid(ticks, ticks)                      # (41, 41)
  offs = (dx[..., None, None] * axis + dy[..., None, None] * lib.perp(axis))
  vals = lib.gaussian_pdf(xy + offs, mean, axis, sigma)    # (41, 41, 16)
  # integral over the unit box == 2*pi*sx*sy * dPhi_x * dPhi_y == the
  # antialiased pdf itself, so the box *mean* (area 1) compares directly
  box = np.asarray(vals.mean(axis=(0, 1)))

  np.testing.assert_allclose(np.asarray(aa), box, rtol=0.06, atol=0.05)
  check_grads(lib.gaussian_pdf_antialias, (xy, mean, axis, sigma), order=1,
              modes=["rev"], atol=1e-5, rtol=1e-5)


def test_quat_to_mat_orthonormal():
  key = jax.random.PRNGKey(2)
  q = lib.safe_normalize(rand(key, 40, 4))
  R = lib.quat_to_mat(q)
  eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (40, 3, 3))
  np.testing.assert_allclose(
      np.asarray(jnp.einsum("nij,nkj->nik", R, R)), np.asarray(eye), atol=1e-12)
  np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, rtol=1e-12)
  # rotation via matrix == rotation via quaternion sandwich
  v = rand(jax.random.PRNGKey(5), 40, 3)
  np.testing.assert_allclose(
      np.asarray(jnp.einsum("nij,nj->ni", R, v)),
      np.asarray(lib.quat_rotate(q, v)), atol=1e-12)


def test_scaled_quat_to_mat():
  key = jax.random.PRNGKey(7)
  q = lib.safe_normalize(rand(key, 10, 4))
  s = jnp.exp(rand(jax.random.PRNGKey(8), 10, 3))
  RS = lib.scaled_quat_to_mat(q, s)
  R = lib.quat_to_mat(q)
  np.testing.assert_allclose(
      np.asarray(RS), np.asarray(R * s[:, None, :]), atol=1e-12)


def test_ndc_depth_roundtrip():
  d = jnp.geomspace(0.11, 99.0, 50, dtype=jnp.float64)
  ndc = lib.ndc_depth(d, 0.1, 100.0)
  assert (np.diff(np.asarray(ndc)) > 0).all()
  assert np.asarray(ndc).min() >= 0 and np.asarray(ndc).max() <= 1
  np.testing.assert_allclose(
      np.asarray(lib.inverse_ndc_depth(ndc, 0.1, 100.0)), np.asarray(d), rtol=1e-12)


def test_project_with_jacobian_fd():
  """The clamped Jacobian equals the true projection Jacobian for in-bounds
  points (finite differences)."""
  key = jax.random.PRNGKey(4)
  pos = jnp.asarray([[0.1, -0.2, 2.0], [0.5, 0.3, 5.0]], jnp.float64)
  cam = jnp.eye(4, dtype=jnp.float64)[:3]
  proj = jnp.asarray([100.0, 110.0, 64.0, 60.0], jnp.float64)
  size = jnp.asarray([128.0, 120.0], jnp.float64)

  uv, z, J = lib.project_with_jacobian(pos, cam, proj, size, 0.15)

  def g(p):  # (3,) -> (2,)
    return lib.project_with_jacobian(p[None], cam, proj, size, 0.15)[0][0]

  J_auto = jax.vmap(jax.jacobian(g))(pos)  # (n, 2, 3)
  # identity camera frame here, so d(uv)/d(position) == J directly
  np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-7)
  _ = uv, z
