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


def save_gaussians_ply(path: str, gaussians) -> None:
  """Write a Gaussians3D as a standard binary-LE 3DGS .ply checkpoint
  (the column layout 3DGS viewers and load_gaussians_ply expect:
  x/y/z, nx/ny/nz zeros, f_dc_*, f_rest_* SH bands, opacity, scale_*,
  rot_* in wxyz order). Inverse of load_gaussians_ply."""
  g = gaussians
  pos = np.asarray(g.position, np.float32)
  n = pos.shape[0]
  feat = np.asarray(g.feature, np.float32)
  if feat.ndim == 2:                        # plain RGB -> single DC band
    feat = feat[:, :, None]
  k = feat.shape[2]
  dc = feat[:, :, 0]                                        # (n, 3)
  rest = feat[:, :, 1:].reshape(n, 3 * (k - 1))             # (n, 3*(k-1))
  rot = np.asarray(g.rotation, np.float32)[:, [3, 0, 1, 2]]  # xyzw -> wxyz

  cols = [("x", pos[:, 0]), ("y", pos[:, 1]), ("z", pos[:, 2]),
          ("nx", np.zeros(n, np.float32)), ("ny", np.zeros(n, np.float32)),
          ("nz", np.zeros(n, np.float32))]
  cols += [(f"f_dc_{i}", dc[:, i]) for i in range(3)]
  cols += [(f"f_rest_{i}", rest[:, i]) for i in range(rest.shape[1])]
  cols += [("opacity", np.asarray(g.alpha_logit, np.float32)[:, 0])]
  cols += [(f"scale_{i}", np.asarray(g.log_scaling, np.float32)[:, i])
           for i in range(3)]
  cols += [(f"rot_{i}", rot[:, i]) for i in range(4)]

  header = ["ply", "format binary_little_endian 1.0",
            f"element vertex {n}"]
  header += [f"property float {name}" for name, _ in cols]
  header += ["end_header"]
  body = np.stack([c for _, c in cols], axis=1).astype("<f4")
  with open(path, "wb") as f:
    f.write(("\n".join(header) + "\n").encode())
    f.write(body.tobytes())


__all__ = ["native", "full_cumsum", "load_ply", "morton3d", "ply_info",
           "radix_argsort", "radix_sort_pairs", "segmented_sort_pairs",
           "load_gaussians_ply", "save_gaussians_ply"]
