"""ctypes bindings for the native host library (csrc/tgr_host.cpp).

The reference JIT-compiles its CUDA extension at import
(cuda_lib/__init__.py:6-10); here the C++ host library is compiled on
first use with g++ and cached next to the source. All entry points have
numpy signatures; None is returned from `try_load` when no toolchain is
available so callers can fall back to pure-numpy paths.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "tgr_host.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(_SRC)),
                         "libtgr_host.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
  src = os.path.abspath(_SRC)
  if (not os.path.exists(_LIB_PATH)
      or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-pthread", src, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
  return _LIB_PATH


def try_load() -> Optional[ctypes.CDLL]:
  """Compile (if needed) and load the native library; None on failure."""
  global _lib
  with _lock:
    if _lib is not None:
      return _lib
    try:
      lib = ctypes.CDLL(_build())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
      return None

    i64, i32p, u32p, u64p, f32p, i64p, charp = (
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p)
    lib.tgr_radix_sort_pairs_u32.argtypes = [u32p, i32p, i64, ctypes.c_int,
                                             ctypes.c_int]
    lib.tgr_radix_sort_pairs_u64.argtypes = [u64p, i32p, i64, ctypes.c_int,
                                             ctypes.c_int]
    lib.tgr_full_cumsum_i32.argtypes = [i32p, i64p, i64]
    lib.tgr_full_cumsum_i32.restype = i64
    lib.tgr_segmented_sort_pairs_u32.argtypes = [u32p, i32p, i64p, i64]
    lib.tgr_morton3d.argtypes = [f32p, i64, f32p, f32p, u32p]
    lib.tgr_ply_info.argtypes = [charp, i64p, ctypes.c_char_p, i64]
    lib.tgr_ply_info.restype = ctypes.c_int
    lib.tgr_ply_read.argtypes = [charp, f32p, i64]
    lib.tgr_ply_read.restype = ctypes.c_int
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ct):
  return a.ctypes.data_as(ctypes.POINTER(ct))


def radix_sort_pairs(keys: np.ndarray, values: np.ndarray,
                     begin_bit: int = 0,
                     end_bit: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
  """In-place-free sort of (keys, values) by a key bit window
  (cuda_lib/radix_sort_pairs.cu analog). keys: uint32/uint64."""
  lib = try_load()
  keys = np.ascontiguousarray(keys)
  values = np.ascontiguousarray(values, dtype=np.int32)
  if end_bit is None:
    end_bit = keys.dtype.itemsize * 8
  if lib is None:
    order = np.argsort((keys >> begin_bit) & ((1 << (end_bit - begin_bit)) - 1
                                              if end_bit - begin_bit < 64
                                              else ~np.uint64(0)),
                       kind="stable")
    return keys[order], values[order]
  k = keys.copy()
  v = values.copy()
  if keys.dtype == np.uint32:
    lib.tgr_radix_sort_pairs_u32(_ptr(k, ctypes.c_uint32),
                                 _ptr(v, ctypes.c_int32), k.size,
                                 begin_bit, end_bit)
  elif keys.dtype == np.uint64:
    lib.tgr_radix_sort_pairs_u64(_ptr(k, ctypes.c_uint64),
                                 _ptr(v, ctypes.c_int32), k.size,
                                 begin_bit, end_bit)
  else:
    raise TypeError(f"unsupported key dtype {keys.dtype}")
  return k, v


def radix_argsort(keys: np.ndarray, **kw) -> np.ndarray:
  """(cuda_lib/__init__.py:38-41 analog)"""
  values = np.arange(keys.size, dtype=np.int32)
  _, order = radix_sort_pairs(keys, values, **kw)
  return order


def full_cumsum(counts: np.ndarray) -> Tuple[np.ndarray, int]:
  """(N,) -> ((N+1,) exclusive scan, grand total)
  (cuda_lib/full_cumsum.cu analog)."""
  lib = try_load()
  counts = np.ascontiguousarray(counts, dtype=np.int32)
  if lib is None:
    out = np.zeros(counts.size + 1, np.int64)
    np.cumsum(counts, out=out[1:])
    return out, int(out[-1])
  out = np.empty(counts.size + 1, np.int64)
  total = lib.tgr_full_cumsum_i32(_ptr(counts, ctypes.c_int32),
                                  _ptr(out, ctypes.c_int64), counts.size)
  return out, int(total)


def segmented_sort_pairs(keys: np.ndarray, values: np.ndarray,
                         offsets: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
  """Sort pairs within segments [offsets[i], offsets[i+1])
  (cuda_lib/segmented_sort_pairs.cu analog)."""
  lib = try_load()
  k = np.ascontiguousarray(keys, dtype=np.uint32).copy()
  v = np.ascontiguousarray(values, dtype=np.int32).copy()
  offsets = np.ascontiguousarray(offsets, dtype=np.int64)
  if lib is None:
    for s in range(offsets.size - 1):
      lo, hi = offsets[s], offsets[s + 1]
      order = np.argsort(k[lo:hi], kind="stable")
      k[lo:hi] = k[lo:hi][order]
      v[lo:hi] = v[lo:hi][order]
    return k, v
  lib.tgr_segmented_sort_pairs_u32(_ptr(k, ctypes.c_uint32),
                                   _ptr(v, ctypes.c_int32),
                                   _ptr(offsets, ctypes.c_int64),
                                   offsets.size - 1)
  return k, v


def morton3d(xyz: np.ndarray, resolution: int = 1024) -> np.ndarray:
  """(N, 3) float32 -> (N,) uint32 Morton codes (host preprocessing)."""
  lib = try_load()
  xyz = np.ascontiguousarray(xyz, dtype=np.float32)
  lower = xyz.min(axis=0)
  inv_cell = resolution / np.maximum(xyz.max(axis=0) - lower, 1e-12)
  inv_cell = inv_cell.astype(np.float32)
  if lib is None:
    cells = np.clip(((xyz - lower) * inv_cell).astype(np.int64), 0,
                    resolution - 1).astype(np.uint32)
    def spread(x):
      x = x & 0x3FF
      x = (x | (x << 16)) & 0x030000FF
      x = (x | (x << 8)) & 0x0300F00F
      x = (x | (x << 4)) & 0x030C30C3
      x = (x | (x << 2)) & 0x09249249
      return x
    return (spread(cells[:, 0]) | (spread(cells[:, 1]) << 1)
            | (spread(cells[:, 2]) << 2))
  out = np.empty(xyz.shape[0], np.uint32)
  lib.tgr_morton3d(_ptr(xyz, ctypes.c_float), xyz.shape[0],
                   _ptr(lower, ctypes.c_float),
                   _ptr(inv_cell, ctypes.c_float),
                   _ptr(out, ctypes.c_uint32))
  return out


def ply_info(path: str) -> Tuple[int, list]:
  """(n_vertices, property names) of a binary-LE PLY vertex element."""
  lib = try_load()
  assert lib is not None, "native library unavailable"
  n = ctypes.c_int64()
  buf = ctypes.create_string_buffer(65536)
  rc = lib.tgr_ply_info(path.encode(), ctypes.byref(n), buf, len(buf))
  if rc != 0:
    raise IOError(f"tgr_ply_info({path}) failed with {rc}")
  return n.value, buf.value.decode().split(",")


def load_ply(path: str) -> Tuple[np.ndarray, list]:
  """Read all float vertex properties of a binary-LE PLY as a dense
  (n, n_props) array (3DGS checkpoint loader)."""
  n, names = ply_info(path)
  out = np.empty((n, len(names)), np.float32)
  lib = try_load()
  rc = lib.tgr_ply_read(path.encode(), _ptr(out, ctypes.c_float),
                        len(names))
  if rc != 0:
    raise IOError(f"tgr_ply_read({path}) failed with {rc}")
  return out, names
