"""3D Morton-code spatial sorting.

Rebuild of /root/reference/taichi_splatting/misc/morton_sort.py: quantize
points into a grid, interleave the cell coordinate bits into a Morton
code, and (arg)sort for memory-coherent point ordering. Pure jnp — the
bit-spread ladders are vectorized integer ops, and the sort is lax.sort
(the reference uses its CUB radix sorter here).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def spread_bits32(x: jax.Array) -> jax.Array:
  """Spread the low 10 bits of x so consecutive bits are 3 apart
  (standard 3D Morton interleave; cf. morton_sort.py:13-20)."""
  x = x.astype(jnp.uint32) & 0x3FF
  x = (x | (x << 16)) & 0x030000FF
  x = (x | (x << 8)) & 0x0300F00F
  x = (x | (x << 4)) & 0x030C30C3
  x = (x | (x << 2)) & 0x09249249
  return x


def morton_codes(points: jax.Array,
                 lower: Optional[jax.Array] = None,
                 upper: Optional[jax.Array] = None,
                 resolution: int = 1024) -> jax.Array:
  """(N, 3) points -> (N,) uint32 Morton codes over a bounding grid
  (morton_sort.py:33-118). resolution <= 1024 (10 bits per axis)."""
  assert resolution <= 1024
  if lower is None:
    lower = jnp.min(points, axis=0)
  if upper is None:
    upper = jnp.max(points, axis=0)
  inc = (upper - lower) / resolution
  cell = jnp.clip(((points - lower) / inc).astype(jnp.int32),
                  0, resolution - 1).astype(jnp.uint32)
  return (spread_bits32(cell[:, 0])
          | (spread_bits32(cell[:, 1]) << 1)
          | (spread_bits32(cell[:, 2]) << 2))


def argsort(points: jax.Array, **kwargs) -> jax.Array:
  """Indices that sort points along the Morton curve
  (morton_sort.py:121-133)."""
  codes = morton_codes(points, **kwargs)
  idx = jnp.arange(points.shape[0], dtype=jnp.int32)
  _, order = jax.lax.sort((codes, idx), num_keys=1)
  return order


def sort(points: jax.Array, *arrays, **kwargs):
  """Reorder points (and any parallel arrays) along the Morton curve
  (morton_sort.py:136-142)."""
  order = argsort(points, **kwargs)
  out = tuple(a[order] for a in (points,) + arrays)
  return out if arrays else out[0]


def argsort_unique(points: jax.Array, **kwargs) -> Tuple[jax.Array, jax.Array]:
  """Morton argsort plus a mask marking the first point of each occupied
  cell (the reference's argsort_dedup, morton_sort.py:145-152)."""
  codes = morton_codes(points, **kwargs)
  idx = jnp.arange(points.shape[0], dtype=jnp.int32)
  sorted_codes, order = jax.lax.sort((codes, idx), num_keys=1)
  first = jnp.concatenate([
      jnp.ones((1,), bool), sorted_codes[1:] != sorted_codes[:-1]])
  return order, first
