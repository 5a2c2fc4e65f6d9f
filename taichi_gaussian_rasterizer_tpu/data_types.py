"""Gaussian pytree dataclasses.

TPU-native rebuild of the reference tensorclasses
(/root/reference/taichi_splatting/data_types.py:52-123). Instead of
tensordict tensorclasses these are plain dataclasses registered as JAX
pytrees, so they pass transparently through `jit` / `grad` / `vmap` /
`shard_map`.

Packed 2D gaussian wire format (produced by projection, consumed by the
tile mapper and rasterizer; reference taichi_lib/generic.py:30-58):

  7 floats = mean(2), axis(2: unit major eigenvector), sigma(2: sqrt of
  eigenvalues), alpha(1)

i.e. the eigendecomposed form, not the conic form of the original 3DGS.
"""

from dataclasses import dataclass, replace, fields

import jax
import jax.numpy as jnp


def _register(cls):
  data = [f.name for f in fields(cls)]
  return jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=[])


def inverse_sigmoid(x):
  return jnp.log(x / (1 - x))


@_register
@dataclass(frozen=True)
class Gaussians3D:
  """3D gaussians (reference data_types.py:52-94)."""
  position: jax.Array     # (N, 3) xyz
  log_scaling: jax.Array  # (N, 3) scale = exp(log_scaling)
  rotation: jax.Array     # (N, 4) quaternion xyzw (as used by the kernels)
  alpha_logit: jax.Array  # (N, 1) alpha = sigmoid(alpha_logit)
  feature: jax.Array      # (N, C) or (N, 3, (d+1)^2) spherical harmonics

  def __post_init__(self):
    for name, width in (("position", 3), ("log_scaling", 3),
                        ("rotation", 4), ("alpha_logit", 1)):
      v = getattr(self, name)
      if hasattr(v, "ndim") and v.ndim >= 1 and not isinstance(v, jax.core.Tracer):
        assert v.shape[-1] == width, f"{name}: expected (..., {width}), got {v.shape}"

  def packed(self) -> jax.Array:
    """(N, 11) packed layout [position, log_scaling, rotation, alpha_logit]."""
    return jnp.concatenate(
        [self.position, self.log_scaling, self.rotation, self.alpha_logit], axis=-1)

  def shape_tensors(self):
    return (self.position, self.log_scaling, self.rotation, self.alpha_logit)

  @property
  def scale(self):
    return jnp.exp(self.log_scaling)

  @property
  def alpha(self):
    return jax.nn.sigmoid(self.alpha_logit)

  @property
  def batch_size(self):
    return self.position.shape[:-1]

  def replace(self, **kwargs) -> "Gaussians3D":
    return replace(self, **kwargs)

  def concat(self, other: "Gaussians3D") -> "Gaussians3D":
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self, other)

  def __getitem__(self, idx) -> "Gaussians3D":
    return jax.tree.map(lambda a: a[idx], self)

  @staticmethod
  def unpack(packed: jax.Array, feature: jax.Array) -> "Gaussians3D":
    assert packed.shape[-1] == 11, f"expected (..., 11), got {packed.shape}"
    return Gaussians3D(
        position=packed[..., 0:3], log_scaling=packed[..., 3:6],
        rotation=packed[..., 6:10], alpha_logit=packed[..., 10:11],
        feature=feature)


@_register
@dataclass(frozen=True)
class Gaussians2D:
  """2D toy gaussians (reference data_types.py:100-123)."""
  position: jax.Array     # (N, 2) xy
  z_depth: jax.Array      # (N, 1) for sorting
  log_scaling: jax.Array  # (N, 2)
  rotation: jax.Array     # (N, 2) unit complex number
  alpha_logit: jax.Array  # (N, 1)
  feature: jax.Array      # (N, C)

  @property
  def opacity(self):
    return jax.nn.sigmoid(self.alpha_logit)

  @property
  def scaling(self):
    return jnp.exp(self.log_scaling)

  @property
  def batch_size(self):
    return self.position.shape[:-1]

  def set_scaling(self, scaling) -> "Gaussians2D":
    return replace(self, log_scaling=jnp.log(scaling))

  def replace(self, **kwargs) -> "Gaussians2D":
    return replace(self, **kwargs)

  def concat(self, other: "Gaussians2D") -> "Gaussians2D":
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self, other)

  def __getitem__(self, idx) -> "Gaussians2D":
    return jax.tree.map(lambda a: a[idx], self)


def check_packed3d(packed: jax.Array):
  assert packed.ndim == 2 and packed.shape[1] == 11, \
      f"Expected shape (N, 11), got {packed.shape}"


def check_packed2d(packed: jax.Array):
  # note: the reference's own check (data_types.py:48) stale-asserts 6 columns;
  # the real packed width is 7 (SURVEY.md §2.1)
  assert packed.ndim == 2 and packed.shape[1] == 7, \
      f"Expected shape (N, 7), got {packed.shape}"
