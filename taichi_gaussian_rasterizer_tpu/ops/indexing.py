"""Differentiable feature gather.

The reference implements `index_features` as a Taichi-autodiff kernel
(misc/indexing.py:9-58 — broken as shipped, see SURVEY.md §2.8); in JAX a
gather is natively differentiable, so this is a thin wrapper kept for API
parity plus a mask-based variant fitting the static-shape pipeline."""

import jax
import jax.numpy as jnp


def index_features(features: jax.Array, indexes: jax.Array) -> jax.Array:
  """(N, ...) gathered at (M,) indexes; differentiable (scatter-add VJP)."""
  return jnp.take(features, indexes, axis=0)


def mask_features(features: jax.Array, mask: jax.Array,
                  fill_value: float = 0.0) -> jax.Array:
  """Zero (or fill) rows where mask is False, keeping static shape."""
  shape = (-1,) + (1,) * (features.ndim - 1)
  return jnp.where(mask.reshape(shape), features, fill_value)


def segmented_sort_pairs(keys: jax.Array, values: jax.Array,
                         offsets: jax.Array, stable: bool = True):
  """Sort (keys, values) pairs within segments [offsets[i], offsets[i+1]).

  Device-side analog of the reference's cuda_lib/segmented_sort_pairs.cu
  (exported but never called by its own pipeline — cuda_lib/__init__.py;
  kept for the same API-parity reason, and used the TPU way: a segmented
  sort IS one flat `lax.sort` on a (segment_id, key) composite, since
  segment ids are non-decreasing across segment order and XLA has no
  faster segment-local primitive — see PERF.md "batched independent
  sorts" probe: partitioning buys only ~21% at large segment counts).
  A host/native variant for numpy preprocessing lives in io.native.

  offsets: (S+1,) int, rows outside [offsets[0], offsets[-1]) keep their
  position's segment (clamped), matching the host variant's contract of
  only permuting within segments.
  """
  n = keys.shape[0]
  # segment id per row: how many interior boundaries precede it
  seg = jnp.searchsorted(offsets[1:-1], jnp.arange(n, dtype=offsets.dtype),
                         side="right").astype(jnp.int32)
  _, k_sorted, v_sorted = jax.lax.sort((seg, keys, values), num_keys=2,
                                       is_stable=stable)
  return k_sorted, v_sorted
