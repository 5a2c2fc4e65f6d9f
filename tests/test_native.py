"""Native host library tests (csrc/tgr_host.cpp via ctypes)."""

import os
import struct

import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu.io import native

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def lib():
  lib = native.try_load()
  if lib is None:
    pytest.skip("no native toolchain")
  return lib


def test_radix_sort_pairs_u32(lib):
  rng = np.random.default_rng(0)
  keys = rng.integers(0, 2 ** 32, size=100_000, dtype=np.uint32)
  vals = np.arange(keys.size, dtype=np.int32)
  k, v = native.radix_sort_pairs(keys, vals)
  order = np.argsort(keys, kind="stable")
  np.testing.assert_array_equal(k, keys[order])
  np.testing.assert_array_equal(v, vals[order])


def test_radix_sort_pairs_u64_bit_window(lib):
  """Sorting on bits [0, 48) must ignore the top 16 bits (the reference's
  end_bit=48 tile-key sort, tile_mapper.py:154) while remaining stable."""
  rng = np.random.default_rng(1)
  keys = rng.integers(0, 2 ** 64 - 1, size=50_000, dtype=np.uint64)
  vals = np.arange(keys.size, dtype=np.int32)
  k, v = native.radix_sort_pairs(keys, vals, begin_bit=0, end_bit=48)
  low48 = keys & np.uint64((1 << 48) - 1)
  order = np.argsort(low48, kind="stable")
  np.testing.assert_array_equal(v, vals[order])
  np.testing.assert_array_equal(k, keys[order])


def test_full_cumsum(lib):
  counts = np.asarray([3, 0, 5, 2], np.int32)
  out, total = native.full_cumsum(counts)
  np.testing.assert_array_equal(out, [0, 3, 3, 8, 10])
  assert total == 10


def test_segmented_sort(lib):
  rng = np.random.default_rng(2)
  keys = rng.integers(0, 1000, size=10_000, dtype=np.uint32)
  vals = np.arange(keys.size, dtype=np.int32)
  offsets = np.asarray([0, 100, 100, 5000, 10_000], np.int64)
  k, v = native.segmented_sort_pairs(keys, vals, offsets)
  for s in range(4):
    lo, hi = offsets[s], offsets[s + 1]
    assert (np.diff(k[lo:hi]) >= 0).all()
    np.testing.assert_array_equal(np.sort(v[lo:hi]),
                                  np.sort(vals[lo:hi]))


def test_morton_matches_jax(lib):
  import jax
  import jax.numpy as jnp
  from taichi_gaussian_rasterizer_tpu.utils import morton

  pts = np.random.default_rng(3).uniform(-4, 7, size=(5000, 3)).astype(
      np.float32)
  native_codes = native.morton3d(pts)
  jax_codes = np.asarray(morton.morton_codes(jnp.asarray(pts)))
  match = (native_codes == jax_codes).mean()
  # float quantization at cell borders may differ by one cell
  assert match > 0.999


def write_test_ply(path, n=100, sh_rest=9):
  rng = np.random.default_rng(4)
  props = (["x", "y", "z"] + [f"f_dc_{i}" for i in range(3)]
           + [f"f_rest_{i}" for i in range(3 * sh_rest)]
           + ["opacity"] + [f"scale_{i}" for i in range(3)]
           + [f"rot_{i}" for i in range(4)])
  data = rng.normal(size=(n, len(props))).astype(np.float32)
  with open(path, "wb") as f:
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {p}" for p in props]
    header += ["end_header"]
    f.write(("\n".join(header) + "\n").encode())
    f.write(data.tobytes())
  return data, props


def test_ply_roundtrip(lib, tmp_path):
  path = str(tmp_path / "test.ply")
  data, props = write_test_ply(path)
  n, names = native.ply_info(path)
  assert n == 100 and names == props
  out, names2 = native.load_ply(path)
  np.testing.assert_array_equal(out, data)


def test_load_gaussians_ply(lib, tmp_path):
  from taichi_gaussian_rasterizer_tpu.io import load_gaussians_ply
  path = str(tmp_path / "scene.ply")
  data, props = write_test_ply(path, n=50, sh_rest=15)
  g = load_gaussians_ply(path, morton_order=True)
  assert g.position.shape == (50, 3)
  assert g.feature.shape == (50, 3, 16)   # dc + 15 rest = degree 3
  assert g.rotation.shape == (50, 4)
  # morton order actually permutes
  assert not np.allclose(np.asarray(g.position),
                         data[:, :3])


def test_save_gaussians_ply_roundtrip(lib, tmp_path):
  """save_gaussians_ply must write checkpoints load_gaussians_ply (and
  standard 3DGS viewers) read back bit-exactly."""
  import jax
  from taichi_gaussian_rasterizer_tpu.io import (load_gaussians_ply,
                                                 save_gaussians_ply)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)
  cam = random_camera(jax.random.PRNGKey(0), image_size=(64, 48))
  g = random_3d_gaussians(jax.random.PRNGKey(1), 40, cam, sh_degree=2)
  path = str(tmp_path / "out.ply")
  save_gaussians_ply(path, g)
  g2 = load_gaussians_ply(path, morton_order=False)
  for name in ("position", "log_scaling", "rotation", "alpha_logit",
               "feature"):
    np.testing.assert_array_equal(np.asarray(getattr(g2, name)),
                                  np.asarray(getattr(g, name)),
                                  err_msg=name)


def test_ply_truncated_read_fails(lib, tmp_path):
  """A PLY whose payload is shorter than the header promises must raise,
  not silently return garbage in the tail (tgr_host.cpp short-read)."""
  path = str(tmp_path / "trunc.ply")
  write_test_ply(path, n=100)
  size = os.path.getsize(path)
  with open(path, "r+b") as f:
    f.truncate(size - 64)
  with pytest.raises(IOError):
    native.load_ply(path)
