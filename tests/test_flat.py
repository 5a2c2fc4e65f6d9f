"""Unit tests of the flat (tile, chunk) iteration list (ops/raster/flat.py).

Regression coverage for the round-3 chunk-owner bug: the owner scatter
index was clamped to the last capacity chunk, so a tile whose bin starts
strictly inside the final chunk (snug capacity == total, or any overflow
frame) stole that chunk's a-entry from the true owner — its head slots
silently dropped from the image and gradients. The production flow that
hits this is the documented "probe total_overlaps, re-jit with a snug
capacity" path (bench.py uses it every run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu.ops.mapper import TileMapping
from taichi_gaussian_rasterizer_tpu.ops.raster.flat import (
    build_iteration_list, cdiv)


def make_mapping(starts, ends, k_cap):
  starts = np.asarray(starts, np.int32)
  ends = np.asarray(ends, np.int32)
  n_tiles = starts.shape[0]
  total = int(ends[-1])
  return TileMapping(
      overlap_to_point=jnp.zeros((k_cap,), jnp.int32),
      overlap_to_tile=jnp.zeros((k_cap,), jnp.int32),
      tile_ranges=jnp.stack([jnp.asarray(np.minimum(starts, k_cap)),
                             jnp.asarray(np.minimum(ends, k_cap))], axis=1),
      tile_shape=(1, n_tiles),
      total_overlaps=jnp.asarray(min(total, k_cap), jnp.int32),
      overflow=jnp.asarray(total > k_cap),
      point_sentinel=0,
      point_offsets=jnp.zeros((1,), jnp.int32))


def check_coverage(starts, ends, k_cap, g):
  """Every real slot must be visited exactly once, by its own tile."""
  mapping = make_mapping(starts, ends, k_cap)
  iters = build_iteration_list(mapping, g)
  n_iter = int(iters.n_iter[0])
  tiles = np.asarray(iters.iter_tile)[:n_iter]
  offs = np.asarray(iters.iter_off)[:n_iter]

  starts = np.minimum(np.asarray(starts, np.int64), k_cap)
  ends = np.minimum(np.asarray(ends, np.int64), k_cap)
  total = int(ends[-1])
  visits = np.zeros(min(total, k_cap), np.int32)
  for t, o in zip(tiles, offs):
    # the kernels mask each entry's chunk to the owning tile's bin
    lo, hi = max(o, starts[t]), min(o + g, ends[t], len(visits))
    assert starts[t] <= o + g and ends[t] >= o, (
        f"entry (tile {t}, off {o}) outside its bin [{starts[t]},{ends[t]})")
    if hi > lo:
      visits[lo:hi] += 1
  np.testing.assert_array_equal(
      visits, 1, err_msg=f"slots visited != once: {np.nonzero(visits != 1)}")
  # padding entries must be sentinels
  n_tiles = len(np.asarray(mapping.tile_ranges))
  assert np.all(np.asarray(iters.iter_tile)[n_iter:] >= n_tiles)


def test_owner_snug_capacity_regression():
  # advisor's exact case: tile 1 starts strictly inside the final chunk
  # (starts=5, k_cap=8, g=4) and trailing empty tiles start at total==8.
  # With the old clamp, chunk 1's owner came out as tile 3 (empty) and
  # tile 0's slots 4..4 were dropped.
  check_coverage(starts=[0, 5, 8, 8], ends=[5, 8, 8, 8], k_cap=8, g=4)


def test_owner_overflow_crop():
  # capacity crops mid-stream: tiles whose (cropped) bins start at or
  # past k_cap own nothing
  check_coverage(starts=[0, 3, 9, 15], ends=[3, 9, 15, 21], k_cap=12, g=4)


def test_owner_exact_chunk_boundaries():
  check_coverage(starts=[0, 4, 8], ends=[4, 8, 16], k_cap=16, g=4)


@pytest.mark.parametrize("seed", range(8))
def test_owner_random_property(seed):
  rng = np.random.default_rng(seed)
  g = int(rng.choice([4, 8]))
  n_tiles = int(rng.integers(1, 20))
  # random abutting bins with empty tiles mixed in
  lens = rng.integers(0, 3 * g, size=n_tiles)
  lens[rng.random(n_tiles) < 0.3] = 0
  ends = np.cumsum(lens).astype(np.int64)
  starts = np.concatenate([[0], ends[:-1]])
  total = int(ends[-1]) if n_tiles else 0
  for k_cap in {max(g, cdiv(total, g) * g),            # snug
                max(g, cdiv(total, g) * g + 2 * g),    # slack
                max(g, (total // (2 * g)) * g or g)}:  # cropped
    check_coverage(starts, ends, k_cap, g)
