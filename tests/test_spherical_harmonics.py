"""SH shading tests (reference tests/test_spherical_harmonics.py analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu.ops import lib
from taichi_gaussian_rasterizer_tpu.ops.sh import (
    check_sh_degree, evaluate_sh_at, rsh_cart)


def numpy_rsh_cart3(xyz):
  """Independent numpy implementation of the real cartesian SH basis
  (standard constants)."""
  x, y, z = xyz.T
  x2, y2, z2 = x * x, y * y, z * z
  return np.stack([
      0.282094791773878 * np.ones_like(x),
      -0.48860251190292 * y,
      0.48860251190292 * z,
      -0.48860251190292 * x,
      1.09254843059208 * x * y,
      -1.09254843059208 * y * z,
      0.94617469575756 * z2 - 0.31539156525252,
      -1.09254843059208 * x * z,
      0.54627421529604 * (x2 - y2),
      -0.590043589926644 * y * (3.0 * x2 - y2),
      2.89061144264055 * x * y * z,
      0.304697199642977 * y * (1.5 - 7.5 * z2),
      1.24392110863372 * z * (1.5 * z2 - 0.5) - 0.497568443453487 * z,
      0.304697199642977 * x * (1.5 - 7.5 * z2),
      1.44530572132028 * z * (x2 - y2),
      -0.590043589926644 * x * (x2 - 3.0 * y2),
  ], axis=-1)


def test_basis_orthonormality():
  """Monte-Carlo check that the basis is orthonormal over the sphere —
  catches any wrong constant."""
  key = jax.random.PRNGKey(0)
  dirs = lib.safe_normalize(jax.random.normal(key, (200_000, 3), jnp.float64))
  basis = rsh_cart(dirs, 3)
  gram = np.asarray(basis.T @ basis) / dirs.shape[0] * (4 * np.pi)
  np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_basis_against_numpy(degree):
  key = jax.random.PRNGKey(degree)
  dirs = lib.safe_normalize(jax.random.normal(key, (100, 3), jnp.float64))
  expected = numpy_rsh_cart3(np.asarray(dirs))[:, :(degree + 1) ** 2]
  np.testing.assert_allclose(np.asarray(rsh_cart(dirs, degree)), expected,
                             rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
@pytest.mark.parametrize("dimension", [3, 8])
def test_evaluate_sh(degree, dimension):
  key = jax.random.PRNGKey(degree * 10 + dimension)
  k1, k2, k3 = jax.random.split(key, 3)
  n = 50
  params = jax.random.normal(
      k1, (n, dimension, (degree + 1) ** 2), jnp.float64) * 0.2
  positions = jax.random.normal(k2, (n, 3), jnp.float64) * 5
  camera_pos = jax.random.normal(k3, (3,), jnp.float64)

  assert check_sh_degree(params) == degree
  out = evaluate_sh_at(params, positions, camera_pos)
  assert out.shape == (n, dimension)
  assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()

  # oracle: direct einsum with numpy basis
  dirs = np.array(positions - camera_pos)
  dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
  basis = numpy_rsh_cart3(dirs)[:, :(degree + 1) ** 2]
  expected = np.clip(
      np.einsum("nck,nk->nc", np.asarray(params), basis) + 0.5, 0, 1)
  np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10, atol=1e-12)


def test_evaluate_sh_gradcheck():
  key = jax.random.PRNGKey(7)
  k1, k2, k3 = jax.random.split(key, 3)
  n = 10
  # small params keep outputs strictly inside (0,1): clamp is inactive so
  # finite differences are valid
  params = jax.random.normal(k1, (n, 3, 16), jnp.float64) * 0.02
  positions = jax.random.normal(k2, (n, 3), jnp.float64) * 5
  camera_pos = jax.random.normal(k3, (3,), jnp.float64)

  check_grads(lambda p, pos, c: evaluate_sh_at(p, pos, c),
              (params, positions, camera_pos), order=1, modes=["rev"],
              atol=1e-5, rtol=1e-5, eps=1e-7)


def test_evaluate_sh_indexes():
  key = jax.random.PRNGKey(9)
  params = jax.random.normal(key, (20, 3, 4), jnp.float64) * 0.1
  positions = jax.random.normal(key, (20, 3), jnp.float64)
  camera_pos = jnp.zeros(3, jnp.float64)
  idx = jnp.asarray([3, 7, 11])

  full = evaluate_sh_at(params, positions, camera_pos)
  sub = evaluate_sh_at(params, positions, camera_pos, indexes=idx)
  np.testing.assert_allclose(np.asarray(sub), np.asarray(full)[np.asarray(idx)])
