"""2D toy gaussian pipeline: projection, basis helpers, split/prune ops.

TPU-native rebuild of /root/reference/taichi_splatting/misc/renderer2d.py.
Pure jnp throughout; split ops take explicit PRNG keys (functional
randomness) instead of relying on a global torch generator.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from ..data_types import Gaussians2D
from ..ops import lib


def project_gaussians2d(points: Gaussians2D,
                        image_size: Optional[Tuple[int, int]] = None
                        ) -> jax.Array:
  """Pack Gaussians2D into the (N, 7) [mean, axis, sigma, alpha] wire
  format (reference misc/renderer2d.py:16-33). Differentiable.

  `image_size` is accepted for API symmetry but unused (no culling in the
  2D toy path)."""
  del image_size
  alpha = jax.nn.sigmoid(points.alpha_logit.reshape(-1))
  sigma = points.scaling
  v1 = lib.safe_normalize(points.rotation)
  return lib.pack_g2d(points.position, v1, sigma, alpha)


def point_rotation(points: Gaussians2D) -> jax.Array:
  """(N, 2, 2) rotation whose rows are the gaussian's unit axes
  (renderer2d.py:46-51)."""
  v1 = lib.safe_normalize(points.rotation)
  return jnp.stack([v1, lib.perp(v1)], axis=1)


def point_basis(points: Gaussians2D, eps: float = 1e-4) -> jax.Array:
  """(N, 2, 2) basis with *columns* = scaled axes (renderer2d.py:37-42):
  basis @ e_i = axis_i * scale_i."""
  scale = jnp.maximum(points.scaling, eps)
  v1 = lib.safe_normalize(points.rotation)
  return jnp.stack([v1, lib.perp(v1)], axis=2) * scale[:, None, :]


def point_covariance(points: Gaussians2D) -> jax.Array:
  basis = point_basis(points)
  return jnp.einsum("nij,nkj->nik", basis, basis)


def _repeat(points: Gaussians2D, n: int) -> Gaussians2D:
  return jax.tree.map(lambda x: jnp.repeat(x, n, axis=0), points)


def split_with_offsets(key, points: Gaussians2D, offsets: jax.Array,
                       depth_noise: float = 1e-2) -> Gaussians2D:
  """Replicate each gaussian to its offset samples, jitter depth
  (renderer2d.py:60-71)."""
  num_points, n, _ = offsets.shape
  g = _repeat(points, n)
  noise = jax.random.normal(key, g.z_depth.shape, g.z_depth.dtype)
  return g.replace(
      position=g.position + offsets.reshape(-1, 2),
      z_depth=jnp.maximum(g.z_depth + noise * depth_noise, 1e-6))


def _sample_in_basis(points: Gaussians2D, samples: jax.Array) -> jax.Array:
  """Map (N, n, 2) eigen-frame samples to image-space offsets."""
  basis = point_basis(points)                       # (N, 2, 2)
  return jnp.einsum("nij,nsj->nsi", basis, samples)


def split_gaussians2d(key, points: Gaussians2D, n: int = 2,
                      scaling: Optional[float] = None,
                      depth_noise: float = 1e-2) -> Gaussians2D:
  """Random-sample split (renderer2d.py:74-99): each gaussian becomes n
  copies at gaussian-distributed offsets in its own basis, scaled by
  1/sqrt(n) by default."""
  k1, k2 = jax.random.split(key)
  num = points.position.shape[0]
  samples = 0.5 * jax.random.normal(k1, (num, n, 2), points.position.dtype)
  offsets = _sample_in_basis(points, samples)

  if scaling is None:
    scaling = 1 / math.sqrt(n)
  points = points.replace(log_scaling=points.log_scaling + math.log(scaling))
  return split_with_offsets(k2, points, offsets, depth_noise)


def uniform_split_gaussians2d(key, points: Gaussians2D, n: int = 2,
                              scaling: Optional[float] = None,
                              depth_noise: float = 1e-2, sep: float = 0.7,
                              random_axis: bool = False,
                              eps: float = 1e-6) -> Gaussians2D:
  """Split along the dominant (or randomly chosen, scale-weighted) axis
  with evenly spaced offsets +-sep (renderer2d.py:113-132)."""
  k1, k2 = jax.random.split(key)
  num = points.position.shape[0]

  if random_axis:
    probs = points.scaling + eps
    probs = probs / probs.sum(axis=1, keepdims=True)
    axis_idx = jax.random.categorical(k1, jnp.log(probs), axis=1)
  else:
    axis_idx = jnp.argmax(points.log_scaling, axis=1)

  axis = jax.nn.one_hot(axis_idx, 2, dtype=points.position.dtype)  # (N, 2)
  values = jnp.linspace(-sep, sep, n, dtype=points.position.dtype)
  samples = values[None, :, None] * axis[:, None, :]               # (N, n, 2)
  offsets = _sample_in_basis(points, samples)

  if scaling is None:
    scaling = math.sqrt(n) / n
  points = points.set_scaling(points.scaling * (axis * scaling + (1 - axis)))
  return split_with_offsets(k2, points, offsets, depth_noise)


def render_gaussians(gaussians: Gaussians2D,
                     image_size: Tuple[int, int],
                     raster_config: RasterConfig = RasterConfig(),
                     **raster_kwargs):
  """Project + rasterize the 2D toy scene (renderer2d.py:135-149)."""
  from ..ops.raster import rasterize  # late import: raster depends on mapper

  gaussians2d = project_gaussians2d(gaussians)
  return rasterize(
      gaussians2d=gaussians2d,
      depth=jnp.clip(gaussians.z_depth.reshape(-1), 0.0, 1.0),
      features=gaussians.feature,
      image_size=image_size,
      config=raster_config,
      **raster_kwargs)
