"""Tile mapper tests against an independent numpy oracle.

The oracle does a full 4-axis OBB-vs-AABB separating-axis test in numpy;
within the ellipse's AABB tile span this is equivalent to the reference's
2-axis test (grid_query.py:30-43) because the x/y axes never separate
inside the span.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops import lib
from taichi_gaussian_rasterizer_tpu.ops import mapper
from taichi_gaussian_rasterizer_tpu.ops.mapper import (
    map_to_tiles, num_tiles, pad_to_tile)
from taichi_gaussian_rasterizer_tpu.models.renderer2d import project_gaussians2d
from taichi_gaussian_rasterizer_tpu.utils.random_data import random_2d_gaussians


def oracle_bins(points, depths, image_size, config):
  """Per-tile point lists, depth-sorted, via brute-force numpy."""
  pts = np.asarray(points, np.float64)
  depths = np.asarray(depths, np.float64).reshape(-1)
  ts = config.tile_size
  tw, th = num_tiles(image_size, ts)

  bins = [[] for _ in range(tw * th)]
  for i in range(pts.shape[0]):
    mean, axis, sigma, alpha = pts[i, 0:2], pts[i, 2:4], pts[i, 4:6], pts[i, 6]
    if alpha <= config.alpha_threshold:
      continue
    gs = np.sqrt(2 * np.log(alpha / config.alpha_threshold))
    r = sigma * gs
    u1 = axis * r[0]
    u2 = np.array([-axis[1], axis[0]]) * r[1]
    extent = np.sqrt(u1 ** 2 + u2 ** 2)
    lo, hi = mean - extent, mean + extent

    tx0 = max(int(np.floor(lo[0] / ts)), 0)
    ty0 = max(int(np.floor(lo[1] / ts)), 0)
    tx1 = min(max(int(np.ceil(hi[0] / ts)), tx0 + 1), tw)
    ty1 = min(max(int(np.ceil(hi[1] / ts)), ty0 + 1), th)

    for ty in range(ty0, ty1):
      for tx in range(tx0, tx1):
        # exact OBB (rotated rect spanned by u1,u2) vs tile AABB SAT
        cx, cy = tx * ts + ts / 2 - mean[0], ty * ts + ts / 2 - mean[1]
        sep = False
        for ax, rad in ((axis, r[0]), (np.array([-axis[1], axis[0]]), r[1])):
          centre = cx * ax[0] + cy * ax[1]
          tile_r = abs(ax[0]) * ts / 2 + abs(ax[1]) * ts / 2
          if abs(centre) > tile_r + rad:
            sep = True
        if not sep:
          bins[tx + ty * tw].append(i)

  for b in bins:
    b.sort(key=lambda i: depths[i])
  return bins


def make_scene(seed, n, image_size, dtype=jnp.float64):
  g = random_2d_gaussians(jax.random.PRNGKey(seed), n, image_size,
                          dtype=dtype)
  points = project_gaussians2d(g, image_size)
  return points, g.z_depth


@pytest.mark.parametrize(
    "seed", [pytest.param(0, marks=pytest.mark.quick)] + list(range(1, 8)))
def test_mapper_matches_oracle(seed):
  image_size = (160, 96)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(seed, 60, image_size)

  mapping = map_to_tiles(points, depth, image_size, config)
  assert not bool(mapping.overflow)

  bins = oracle_bins(points, depth, image_size, config)
  otp = np.asarray(mapping.overlap_to_point)
  ranges = np.asarray(mapping.tile_ranges)
  n = points.shape[0]
  depths = np.asarray(depth).reshape(-1)

  total = 0
  prev_end = 0
  for t, expected in enumerate(bins):
    s, e = ranges[t]
    assert s == prev_end, "bins must abut contiguously"
    prev_end = e
    got = otp[s:e].tolist()
    assert n not in got, "sentinel inside a live range"
    # same set of points
    assert sorted(got) == sorted(expected), f"tile {t}"
    # sorted by depth (ties in any order)
    got_d = depths[got]
    assert (np.diff(got_d) >= -1e-12).all(), f"tile {t} not depth sorted"
    total += len(expected)

  assert int(mapping.total_overlaps) == total
  # every slot past the live range is sentinel
  assert (otp[total:] == n).all()


def test_mapper_depth16_ordering():
  image_size = (64, 64)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(3, 40, image_size)
  # depth16 requires depth in [0,1]; random z_depth already is
  m32 = map_to_tiles(points, depth, image_size, config)
  m16 = map_to_tiles(points, depth, image_size, config, use_depth16=True)

  r32, r16 = np.asarray(m32.tile_ranges), np.asarray(m16.tile_ranges)
  np.testing.assert_array_equal(r32[:, 1] - r32[:, 0], r16[:, 1] - r16[:, 0])
  depths = np.asarray(depth).reshape(-1)
  otp = np.asarray(m16.overlap_to_point)
  for t in range(r16.shape[0]):
    s, e = r16[t]
    got = otp[s:e]
    q = np.floor(np.clip(depths[got], 0, 1) * 65535)
    assert (np.diff(q) >= 0).all(), "depth16 bins must be quantized-sorted"


def test_mapper_empty_and_culled():
  image_size = (64, 64)
  config = RasterConfig(tile_size=16)
  pts = jnp.zeros((10, 7))  # alpha 0 -> all culled
  mapping = map_to_tiles(pts, jnp.ones((10,)), image_size, config)
  assert int(mapping.total_overlaps) == 0
  assert (np.asarray(mapping.tile_ranges)[:, 0]
          == np.asarray(mapping.tile_ranges)[:, 1]).all()
  assert (np.asarray(mapping.overlap_to_point) == 10).all()


def test_mapper_overflow_flag():
  image_size = (128, 128)
  # capacity far below the real overlap count: must flag
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(0, 200, image_size)
  mapping = map_to_tiles(points, depth, image_size, config, capacity=8)
  assert bool(mapping.overflow)


def test_mapper_big_gaussian_cropped_flag():
  """A gaussian spanning more than max_tile_span tiles sets overflow."""
  image_size = (512, 512)
  config = RasterConfig(tile_size=16, max_tile_span=4)
  pts = jnp.asarray([[256.0, 256.0, 1.0, 0.0, 300.0, 300.0, 0.9]])
  mapping = map_to_tiles(pts, jnp.ones((1,)), image_size, config)
  assert bool(mapping.overflow)
  # still emits its (cropped) footprint
  assert int(mapping.total_overlaps) > 0


def test_pad_to_tile():
  assert pad_to_tile((100, 33), 16) == (112, 48)
  assert pad_to_tile((128, 64), 16) == (128, 64)


def test_mapper_snug_emit_tails_match_oracle():
  """probe_emit_tails + emit_tails must reproduce the default mapping
  exactly (same bins) while emitting a smaller candidate stream."""
  from taichi_gaussian_rasterizer_tpu.ops.mapper import probe_emit_tails

  image_size = (160, 96)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(5, 120, image_size)

  tails = probe_emit_tails(points, image_size, config, quantum=8)
  assert tails[0] == 120 and all(
      tails[r] <= tails[r - 1] for r in range(1, len(tails)))

  m_def = map_to_tiles(points, depth, image_size, config)
  m_snug = map_to_tiles(points, depth, image_size, config,
                        emit_tails=tails)
  assert not bool(m_snug.overflow)
  assert int(m_def.total_overlaps) == int(m_snug.total_overlaps)
  np.testing.assert_array_equal(np.asarray(m_def.tile_ranges),
                                np.asarray(m_snug.tile_ranges))
  np.testing.assert_array_equal(np.asarray(m_def.overlap_to_point),
                                np.asarray(m_snug.overlap_to_point))


def test_mapper_emit_tails_crop_flags_overflow():
  """Footprints beyond a too-small tail must set the overflow flag (crop
  is reported, never silent)."""
  image_size = (160, 96)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(6, 120, image_size)
  # starve every round past the first: only budget-1 candidates emitted
  mapping = map_to_tiles(points, depth, image_size, config,
                         emit_tails=(120,) + (0,) * (mapper._N_ROUNDS - 1))
  assert bool(mapping.overflow)


def test_mapper_stale_emit_tails_rejected():
  """emit_tails tuples whose length mismatches the emission-round count
  are stale (from an older probe) and must raise, not silently crop."""
  image_size = (160, 96)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth = make_scene(6, 120, image_size)
  with pytest.raises(ValueError, match="stale"):
    map_to_tiles(points, depth, image_size, config,
                 emit_tails=(120, 0, 0, 0, 0))


def test_mapper_zero_points():
  image_size = (64, 64)
  config = RasterConfig(tile_size=16)
  pts = jnp.zeros((0, 7))
  mapping = map_to_tiles(pts, jnp.zeros((0,)), image_size, config)
  assert int(mapping.total_overlaps) == 0
  assert not bool(mapping.overflow)
  assert (np.asarray(mapping.overlap_to_point) == 0).all()  # sentinel == n
  assert mapping.point_offsets.shape == (1,)
