"""Spherical-harmonics shading.

TPU-native rebuild of /root/reference/taichi_splatting/spherical_harmonics.py.
Real cartesian SH bases of degree 0-3 (the standard real-SH constants, as in
cheind/torch-spherical-harmonics which the reference derives from). Pure jnp:
`jax.grad` replaces the reference's Taichi-autodiff backward
(spherical_harmonics.py:153-161), and all N points are evaluated (static
shapes) instead of a gathered visible subset — shading culled points is
harmless and cheaper than a gather on TPU.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from . import lib


def check_sh_degree(sh_features: jax.Array) -> int:
  """(N, C, K) -> degree; K must be a square (reference :14-21)."""
  assert sh_features.ndim == 3, \
      f"SH features must have 3 dimensions, got {sh_features.shape}"
  n_sh = sh_features.shape[2]
  n = int(math.sqrt(n_sh))
  assert n * n == n_sh, f"SH feature count must be square, got {n_sh}"
  return n - 1


def num_sh_coeffs(degree: int) -> int:
  return (degree + 1) ** 2


def rsh_cart(xyz: jax.Array, degree: int) -> jax.Array:
  """Real cartesian spherical harmonics basis, degree 0..3.

  xyz: (..., 3) unit directions -> (..., (degree+1)^2) basis values
  (reference spherical_harmonics.py:38-106).
  """
  assert 0 <= degree <= 3
  x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
  one = jnp.ones_like(x)

  out = [0.282094791773878 * one]
  if degree >= 1:
    out += [
        -0.48860251190292 * y,
        0.48860251190292 * z,
        -0.48860251190292 * x,
    ]
  if degree >= 2:
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    out += [
        1.09254843059208 * xy,
        -1.09254843059208 * yz,
        0.94617469575756 * z2 - 0.31539156525252,
        -1.09254843059208 * xz,
        0.54627421529604 * (x2 - y2),
    ]
  if degree >= 3:
    out += [
        -0.590043589926644 * y * (3.0 * x2 - y2),
        2.89061144264055 * xy * z,
        0.304697199642977 * y * (1.5 - 7.5 * z2),
        1.24392110863372 * z * (1.5 * z2 - 0.5) - 0.497568443453487 * z,
        0.304697199642977 * x * (1.5 - 7.5 * z2),
        1.44530572132028 * z * (x2 - y2),
        -0.590043589926644 * x * (x2 - 3.0 * y2),
    ]
  return jnp.stack(out, axis=-1)


def evaluate_sh_at(
    sh_params: jax.Array,   # (N, C, (d+1)^2) coefficients
    positions: jax.Array,   # (N, 3) gaussian positions (detach upstream if
                            # position grads through shading are unwanted)
    camera_pos: jax.Array,  # (3,)
    indexes: Optional[jax.Array] = None,  # optional (M,) gather indices
) -> jax.Array:
  """Evaluate view-dependent SH color, clamped to [0, 1]
  (reference spherical_harmonics.py:118-134, 166-178).

  Returns (N, C) (or (M, C) when `indexes` given, for API parity with the
  reference's gathered evaluation).
  """
  degree = check_sh_degree(sh_params)
  if indexes is not None:
    sh_params = jnp.take(sh_params, indexes, axis=0)
    positions = jnp.take(positions, indexes, axis=0)

  view_dir = lib.safe_normalize(positions - camera_pos)
  basis = rsh_cart(view_dir, degree)                       # (N, K)
  color = jnp.einsum("nck,nk->nc", sh_params, basis)       # (N, C)
  return jnp.clip(color + 0.5, 0.0, 1.0)
