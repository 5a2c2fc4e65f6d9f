"""ops.indexing: differentiable gather + device-side segmented sort.

Reference analogs: misc/indexing.py (index_features) and
cuda_lib/segmented_sort_pairs.cu (segmented_sort_pairs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu.ops import (index_features,
                                                mask_features,
                                                segmented_sort_pairs)

pytestmark = pytest.mark.quick


def test_index_features_gather_and_grad():
  """Gather matches numpy; VJP scatter-adds duplicate indexes."""
  rng = np.random.default_rng(0)
  feats = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
  idx = jnp.asarray([0, 7, 7, 49, 3])
  out = index_features(feats, idx)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(feats)[idx])

  g = jax.grad(lambda f: index_features(f, idx).sum())(feats)
  expected = np.zeros((50, 3), np.float32)
  np.add.at(expected, np.asarray(idx), 1.0)
  np.testing.assert_array_equal(np.asarray(g), expected)


def test_mask_features_static_shape():
  feats = jnp.ones((6, 2))
  mask = jnp.asarray([True, False, True, True, False, True])
  out = mask_features(feats, mask, fill_value=-1.0)
  assert out.shape == feats.shape
  np.testing.assert_array_equal(np.asarray(out[1]), [-1.0, -1.0])
  np.testing.assert_array_equal(np.asarray(out[0]), [1.0, 1.0])


def test_segmented_sort_pairs_matches_host():
  """Device composite-key segmented sort == the host/native variant
  (including empty segments and a stable tie order)."""
  from taichi_gaussian_rasterizer_tpu.io import native

  rng = np.random.default_rng(2)
  keys = rng.integers(0, 100, size=4096, dtype=np.uint32)  # many ties
  vals = np.arange(keys.size, dtype=np.int32)
  offsets = np.asarray([0, 300, 300, 2100, 4096], np.int64)

  hk, hv = native.segmented_sort_pairs(keys, vals, offsets)
  dk, dv = jax.jit(segmented_sort_pairs)(
      jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(offsets))
  np.testing.assert_array_equal(np.asarray(dk), hk)
  np.testing.assert_array_equal(np.asarray(dv), hv)


def test_segmented_sort_pairs_single_segment_is_plain_sort():
  rng = np.random.default_rng(3)
  keys = rng.integers(0, 2 ** 31, size=1000, dtype=np.uint32)
  vals = np.arange(keys.size, dtype=np.int32)
  offsets = jnp.asarray([0, 1000])
  dk, dv = segmented_sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                                offsets)
  order = np.argsort(keys, kind="stable")
  np.testing.assert_array_equal(np.asarray(dk), keys[order])
  np.testing.assert_array_equal(np.asarray(dv), vals[order])
