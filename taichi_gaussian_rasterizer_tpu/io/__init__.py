"""Host-side IO: native library bindings and 3DGS scene loading."""


import numpy as np

from . import native
from .native import (full_cumsum, load_ply, morton3d, ply_info,
                     radix_argsort, radix_sort_pairs, segmented_sort_pairs)


def load_gaussians_ply(path: str, morton_order: bool = True):
  """Load a standard 3DGS .ply checkpoint into a Gaussians3D (positions,
  log scales, rotations, opacity logits, SH coefficients), optionally
  Morton-reordered on host for memory-coherent device layout (the
  reference uses misc/morton_sort.py for the same purpose)."""
  import jax.numpy as jnp
  from ..data_types import Gaussians3D

  data, names = load_ply(path)
  col = {n: i for i, n in enumerate(names)}

  def cols(prefix, count):
    idx = [col[f"{prefix}{i}"] for i in range(count)]
    return data[:, idx]

  position = data[:, [col["x"], col["y"], col["z"]]]
  log_scaling = cols("scale_", 3)
  rotation = cols("rot_", 4)
  alpha_logit = data[:, [col["opacity"]]]

  dc = cols("f_dc_", 3)                                   # (n, 3)
  n_rest = sum(1 for n in names if n.startswith("f_rest_"))
  if n_rest:
    rest = cols("f_rest_", n_rest).reshape(data.shape[0], 3, n_rest // 3)
    feature = np.concatenate([dc[:, :, None], rest], axis=2)
  else:
    feature = dc[:, :, None]

  if morton_order:
    order = np.argsort(morton3d(position), kind="stable")
    position, log_scaling, rotation, alpha_logit, feature = (
        x[order] for x in (position, log_scaling, rotation, alpha_logit,
                           feature))

  # 3DGS stores quaternions wxyz; the kernels use xyzw
  rotation = rotation[:, [1, 2, 3, 0]]

  return Gaussians3D(
      position=jnp.asarray(position),
      log_scaling=jnp.asarray(log_scaling),
      rotation=jnp.asarray(rotation),
      alpha_logit=jnp.asarray(alpha_logit),
      feature=jnp.asarray(feature))


__all__ = ["native", "full_cumsum", "load_ply", "morton3d", "ply_info",
           "radix_argsort", "radix_sort_pairs", "segmented_sort_pairs",
           "load_gaussians_ply"]
