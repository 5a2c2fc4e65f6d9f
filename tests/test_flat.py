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
    build_iteration_list, cdiv, pack_iters, unpack_iters)


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


def iter_arrays(mapping, g):
  iters = build_iteration_list(mapping, g)
  starts_ext = jnp.concatenate(
      [mapping.tile_ranges[:, 0], mapping.tile_ranges[-1:, 1]])
  return iters, starts_ext


@pytest.mark.parametrize("seed", range(4))
def test_pack_iters_modes_agree(seed):
  """Both packed encodings must decode to the raw (tile, offset) arrays
  for every valid entry. j15 is forced by lying about k_cap (the mode
  choice uses only the static (n_tiles+1) * (k_cap // g) product)."""
  rng = np.random.default_rng(seed)
  g = 4
  n_tiles = int(rng.integers(2, 24))
  lens = rng.integers(0, 3 * g, size=n_tiles)
  lens[rng.random(n_tiles) < 0.3] = 0
  ends = np.cumsum(lens).astype(np.int64)
  starts = np.concatenate([[0], ends[:-1]])
  k_cap = max(g, cdiv(int(ends[-1]), g) * g)
  mapping = make_mapping(starts, ends, k_cap)
  iters, starts_ext = iter_arrays(mapping, g)
  n_iter = int(iters.n_iter[0])

  for fake_cap in (k_cap, 2 ** 31):   # "nc" mode, then forced "j15"
    packed, mode = pack_iters(iters, g, n_tiles, fake_cap, starts_ext)
    assert mode[0] == ("nc" if fake_cap == k_cap else "j15")
    it = np.asarray(packed)
    se = np.asarray(starts_ext)
    iter_tile, iter_off = unpack_iters(mode, g, it, se)
    for i in range(n_iter):
      assert int(iter_tile(i)) == int(iters.iter_tile[i]), (mode, i)
      assert int(iter_off(i)) == int(iters.iter_off[i]), (mode, i)


def test_forced_j15_render_matches(monkeypatch):
  """Full render + grads through the Pallas kernels with the j15 packing
  forced (normally only reached at 49k-tile / multi-million-slot scales):
  must be bit-identical to the nc-mode render."""
  import taichi_gaussian_rasterizer_tpu as tgr
  from taichi_gaussian_rasterizer_tpu.ops.raster import backward, forward
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  cfg = tgr.RasterConfig(tile_size=16, points_per_chunk=8)
  cam = random_camera(jax.random.PRNGKey(0), image_size=(96, 64))
  g = random_3d_gaussians(jax.random.PRNGKey(1), 500, cam)

  def loss(g):
    r = tgr.render_gaussians(g, cam, cfg, capacity=8192)
    return jnp.sum(r.image ** 2), r.image

  (v0, img0), gr0 = jax.jit(jax.value_and_grad(loss, has_aux=True))(g)

  orig = pack_iters
  force = lambda iters, gg, n_tiles, k_cap, se: orig(
      iters, gg, n_tiles, 2 ** 31, se)
  monkeypatch.setattr(forward, "pack_iters", force)
  monkeypatch.setattr(backward, "pack_iters", force)
  (v1, img1), gr1 = jax.jit(jax.value_and_grad(loss, has_aux=True))(g)

  np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
  for a, b in zip(jax.tree.leaves(gr0), jax.tree.leaves(gr1)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
