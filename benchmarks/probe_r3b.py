"""Round-3b plumbing probes on the real TPU (internal tool).

The flat-kernel frame trace (1M @2048, snug) leaves: bwd kernel 29.5 ms,
fwd kernel 26.4 ms, combined gather 18.9 ms, reduction sort 13.3 ms,
candidate sort 10.0 ms, segment-sum 8.3 ms. These probes size the next
moves:

  A. lax.sort is_stable True vs False at the two sort shapes
     (candidate: u32 key + i32 payload; reduction: i32 key + 5 u32).
  B. gather row-count scaling at today's exact shapes (8 / 9 / 10 f32
     rows x 3.06M indices) — is an 8-row packed layout worth it?
  C. segment-sum with 512-lane input chunks vs the current 128.

Readback-forced timing (the axon relay's block_until_ready under-reports).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()


def timeit(fn, *args, iters=10, warmup=2):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


K = 3_063_808
N = 1_000_000


def probe_sort_stability():
  key = jax.random.PRNGKey(0)
  u32k = jax.random.randint(key, (K,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
  i32p = jnp.arange(K, dtype=jnp.int32)
  payloads5 = tuple(
      jax.random.randint(jax.random.PRNGKey(i), (K,), 0, 1 << 30,
                         jnp.int32).astype(jnp.uint32) for i in range(5))
  i32key = jax.random.randint(key, (K,), 0, N, jnp.int32)
  f32d = jax.random.uniform(key, (K,), jnp.float32)

  for stable in (True, False):
    f = jax.jit(lambda a, b, s=stable: jax.lax.sort((a, b), num_keys=1,
                                                    is_stable=s))
    ms = timeit(f, u32k, i32p)
    print(f"cand sort u32+1payload stable={stable}: {ms:.2f} ms")

  for stable in (True, False):
    f = jax.jit(lambda a, b, c, s=stable: jax.lax.sort(
        (a, b, c), num_keys=2, is_stable=s))
    ms = timeit(f, i32key, f32d, i32p)
    print(f"cand sort 2key(i32,f32)+1payload stable={stable}: {ms:.2f} ms")

  for stable in (True, False):
    f = jax.jit(lambda k, *ps, s=stable: jax.lax.sort(
        (k,) + ps, num_keys=1, is_stable=s))
    ms = timeit(f, i32key, *payloads5)
    print(f"reduction sort i32+5xu32 stable={stable}: {ms:.2f} ms")


def probe_gather_rows():
  idx = jax.random.randint(jax.random.PRNGKey(3), (K,), 0, N, jnp.int32)
  for rows in (6, 8, 9, 10, 12):
    src = jax.random.uniform(jax.random.PRNGKey(4), (rows, N + 1), jnp.float32)
    f = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
    ms = timeit(f, src, idx)
    print(f"gather {rows} rows x {K} idx: {ms:.2f} ms ({ms * 1e6 / K:.1f} ns/idx)")


def probe_segment_sum_width():
  from taichi_gaussian_rasterizer_tpu.ops.raster.reduce import (
      segment_sums_by_sorted_key)
  # realistic sorted keys: ~3 slots per point, sentinel tail
  counts = jnp.clip(
      jax.random.poisson(jax.random.PRNGKey(5), 2.55, (N,)), 0, 64)
  offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(counts).astype(jnp.int32)])
  offs = jnp.minimum(offs, K)
  keys = jnp.searchsorted(
      offs[1:], jnp.arange(K, dtype=jnp.int32), side="right").astype(jnp.int32)
  keys = jnp.minimum(keys, N)
  vals = jax.random.randint(jax.random.PRNGKey(6), (6, K), 0, 1 << 30,
                            jnp.int32).astype(jnp.uint32)

  f = jax.jit(lambda k, v, o: segment_sums_by_sorted_key(k, v, o, N))
  ms = timeit(f, keys, vals, offs)
  print(f"segment-sum 6 packed rows, g=128 (current): {ms:.2f} ms")


def main():
  print(f"devices: {jax.devices()}")
  probe_sort_stability()
  probe_gather_rows()
  probe_segment_sum_width()


if __name__ == "__main__":
  main()
