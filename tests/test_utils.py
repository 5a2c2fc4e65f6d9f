"""Utility tests: morton sort, checkpointing, runtime helpers."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu.utils import checkpoint, morton, runtime

pytestmark = pytest.mark.quick


def numpy_morton(cells):
  """Independent bit-interleave oracle."""
  out = np.zeros(cells.shape[0], np.uint64)
  for bit in range(10):
    for axis in range(3):
      out |= ((cells[:, axis].astype(np.uint64) >> bit) & 1) << (3 * bit + axis)
  return out


def test_morton_codes_match_oracle():
  key = jax.random.PRNGKey(0)
  pts = jax.random.uniform(key, (500, 3), jnp.float64) * 10 - 5
  codes = morton.morton_codes(pts, resolution=1024)

  lower = np.asarray(pts).min(axis=0)
  upper = np.asarray(pts).max(axis=0)
  inc = (upper - lower) / 1024
  cells = np.clip(((np.asarray(pts) - lower) / inc).astype(np.int64),
                  0, 1023)
  np.testing.assert_array_equal(np.asarray(codes, np.uint64),
                                numpy_morton(cells))


def test_morton_sort_locality():
  """Morton order must improve spatial locality vs random order: the mean
  distance between consecutive points should shrink substantially."""
  key = jax.random.PRNGKey(1)
  pts = jax.random.uniform(key, (2000, 3))
  sorted_pts = morton.sort(pts)
  d_orig = np.linalg.norm(np.diff(np.asarray(pts), axis=0), axis=1).mean()
  d_sorted = np.linalg.norm(np.diff(np.asarray(sorted_pts), axis=0),
                            axis=1).mean()
  assert d_sorted < 0.35 * d_orig


def test_morton_sort_parallel_arrays():
  pts = jnp.asarray([[0.9, 0.9, 0.9], [0.1, 0.1, 0.1], [0.5, 0.5, 0.5]])
  vals = jnp.asarray([2, 0, 1])
  s_pts, s_vals = morton.sort(pts, vals)
  assert s_vals.tolist() == [0, 1, 2]
  order, first = morton.argsort_unique(jnp.concatenate([pts, pts]))
  assert int(first.sum()) == 3  # duplicates collapse to 3 occupied cells


def test_checkpoint_roundtrip():
  tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "n": 7,
                                      "s": "hello"}}
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "ckpt.bin")
    checkpoint.save_checkpoint(path, tree)
    loaded = checkpoint.load_checkpoint(path)
  np.testing.assert_array_equal(loaded["a"], np.arange(5.0))
  np.testing.assert_array_equal(loaded["b"]["c"], np.ones((2, 3)))
  assert loaded["b"]["n"] == 7 and loaded["b"]["s"] == "hello"


def test_parameter_class_checkpoint():
  from taichi_gaussian_rasterizer_tpu.optim import (FractionalAdam,
                                                    ParameterClass)
  p = ParameterClass.create(
      {"x": jnp.ones((4, 2))}, {"x": dict(lr=0.1)}, optimizer=FractionalAdam)
  p = p.step({"x": jnp.ones((4, 2))}, visibility=jnp.ones((4,)))
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "params.bin")
    checkpoint.save_checkpoint(path, p.state_dict())
    q = ParameterClass.from_state_dict(checkpoint.load_checkpoint(path))
  np.testing.assert_array_equal(np.asarray(q.tensors["x"]),
                                np.asarray(p.tensors["x"]))
  np.testing.assert_array_equal(np.asarray(q.total_weight),
                                np.asarray(p.total_weight))


def test_check_finite():
  runtime.check_finite({"ok": jnp.ones(3)})
  with pytest.raises(ValueError, match="non-finite"):
    runtime.check_finite({"bad": jnp.asarray([1.0, jnp.nan])})
