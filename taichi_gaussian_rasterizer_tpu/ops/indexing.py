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
