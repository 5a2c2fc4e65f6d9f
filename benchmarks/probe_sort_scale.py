"""Probe: lax.sort scaling with row count for the frame's two hot sorts.

The heavy-regime profile (PERF.md round-4) shows the candidate sort at
79.9 ms for 11.1M rows vs 7.7 ms in-frame at 3.4M — strongly
superlinear. This measures the isolated scaling curve for the exact
operand shapes (candidate: 2 keys + 1 payload; reduction: 1 u32 key +
5 payloads), plus variants (u64 packed single key, odd row counts,
batched independent sorts) to test for cache cliffs analogous to the
128-multiple gather cliff.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()
jax.config.update("jax_enable_x64", True)  # for the u64 packed-key row


def timeit(fn, *args, iters=5):
  # readback-timed: the axon relay's block_until_ready under-reports
  out = fn(*args)
  _ = int(out[0].ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  _ = int(out[0].ravel()[0])
  return (time.perf_counter() - t0) / iters * 1e3


def main():
  key = jax.random.PRNGKey(0)

  for k in (2_000_000, 4_000_000, 8_000_000, 11_831_296):
    tiles = jax.random.randint(key, (k,), 0, 12288, jnp.uint32)
    depth = jax.random.uniform(jax.random.PRNGKey(1), (k,), jnp.float32)
    pos = jnp.arange(k, dtype=jnp.uint32)

    # candidate sort shape: 2 keys + 1 payload, unstable
    f2 = jax.jit(lambda t, d, p: lax.sort(
        (t, d, p), num_keys=2, is_stable=False))
    ms = timeit(f2, tiles, depth, pos)
    print(f"cand 2k+1p  k={k:>9}: {ms:7.2f} ms  {ms * 1e6 / k:6.2f} ns/row",
          flush=True)

    # u64 packed single key + 1 payload
    packed = (tiles.astype(jnp.uint64) << 32) | depth.view(jnp.uint32)
    f1 = jax.jit(lambda q, p: lax.sort((q, p), num_keys=1, is_stable=False))
    ms = timeit(f1, packed, pos)
    print(f"cand u64+1p k={k:>9}: {ms:7.2f} ms  {ms * 1e6 / k:6.2f} ns/row",
          flush=True)

    # reduction sort shape: 1 u32 key + 5 payloads
    pay = [jax.random.bits(jax.random.PRNGKey(i), (k,), jnp.uint32)
           for i in range(5)]
    f6 = jax.jit(lambda t, *p: lax.sort((t,) + p, num_keys=1,
                                        is_stable=False))
    ms = timeit(f6, tiles, *pay)
    print(f"red  1k+5p  k={k:>9}: {ms:7.2f} ms  {ms * 1e6 / k:6.2f} ns/row",
          flush=True)

  # odd row count (cliff test) at ~11.8M
  for k in (11_831_296, 11_831_296 + 8, 11_831_303):
    tiles = jax.random.randint(key, (k,), 0, 12288, jnp.uint32)
    depth = jax.random.uniform(jax.random.PRNGKey(1), (k,), jnp.float32)
    pos = jnp.arange(k, dtype=jnp.uint32)
    f2 = jax.jit(lambda t, d, p: lax.sort(
        (t, d, p), num_keys=2, is_stable=False))
    ms = timeit(f2, tiles, depth, pos)
    print(f"cand 2k+1p  k={k:>9} (mod128={k % 128}): {ms:7.2f} ms",
          flush=True)

  # batched independent sorts (cache-cliff hypothesis): same total rows,
  # sorted as B independent segments. Not a drop-in replacement — just
  # measures whether small sorts are per-row cheaper.
  k = 11_831_296
  tiles = jax.random.randint(key, (k,), 0, 12288, jnp.uint32)
  depth = jax.random.uniform(jax.random.PRNGKey(1), (k,), jnp.float32)
  pos = jnp.arange(k, dtype=jnp.uint32)
  for b in (4, 8, 16):
    t2 = tiles.reshape(b, k // b)
    d2 = depth.reshape(b, k // b)
    p2 = pos.reshape(b, k // b)
    fb = jax.jit(lambda t, d, p: lax.sort(
        (t, d, p), dimension=1, num_keys=2, is_stable=False))
    ms = timeit(fb, t2, d2, p2)
    print(f"cand batched B={b:>2} rows={k // b:>8}: {ms:7.2f} ms "
          f"{ms * 1e6 / k:6.2f} ns/row", flush=True)


if __name__ == "__main__":
  main()
