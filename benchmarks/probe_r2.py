"""Round-2 primitive probes on the real TPU (internal tool).

Measures the candidate primitives for the round-2 perf redesign:
  * gather cost vs index count / width / axis / sortedness
  * lax.sort cost vs operand count and length
  * cumsum / elementwise bandwidth sanity
Readback-forced timing (the axon relay's block_until_ready under-reports).
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=1):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--iters", type=int, default=5)
  args = p.parse_args()
  key = jax.random.PRNGKey(0)

  print(f"backend={jax.default_backend()}")

  # ---- gathers ----------------------------------------------------------
  K = 3_500_000
  for rows in (8, 16, 32):
    src = jax.random.normal(key, (K, rows), jnp.float32)
    idx = jax.random.permutation(key, K).astype(jnp.int32)
    f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    ms = timeit(f, src, idx, iters=args.iters)
    print(f"gather axis0 (K={K/1e6:.1f}M rows, width {rows}): {ms:.2f} ms "
          f"({ms * 1e6 / K:.1f} ns/idx)")

  for rows in (16,):
    src = jax.random.normal(key, (rows, K), jnp.float32)
    idx = jax.random.permutation(key, K).astype(jnp.int32)
    f = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
    ms = timeit(f, src, idx, iters=args.iters)
    print(f"gather axis1 ({rows}, K={K/1e6:.1f}M): {ms:.2f} ms "
          f"({ms * 1e6 / K:.1f} ns/idx)")

  # sorted (monotone) indices vs random, narrow rows
  src = jax.random.normal(key, (K, 16), jnp.float32)
  idx_sorted = jnp.sort(jax.random.randint(key, (K,), 0, K, jnp.int32))
  f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
  ms = timeit(f, src, idx_sorted, iters=args.iters)
  print(f"gather axis0 sorted idx (width 16): {ms:.2f} ms "
        f"({ms * 1e6 / K:.1f} ns/idx)")

  # fewer, wider: same bytes as (3.5M, 16)
  for k2, w2 in ((K // 8, 128), (K // 4, 64), (K // 32, 512)):
    src = jax.random.normal(key, (k2, w2), jnp.float32)
    idx = jax.random.permutation(key, k2).astype(jnp.int32)
    ms = timeit(f, src, idx, iters=args.iters)
    print(f"gather axis0 (K={k2/1e6:.2f}M, width {w2}): {ms:.2f} ms "
          f"({ms * 1e6 / k2:.1f} ns/idx)")

  # index count scaling at width 16
  for k2 in (500_000, 1_000_000, 7_000_000):
    src = jax.random.normal(key, (k2, 16), jnp.float32)
    idx = jax.random.permutation(key, k2).astype(jnp.int32)
    ms = timeit(f, src, idx, iters=args.iters)
    print(f"gather axis0 (K={k2/1e6:.2f}M, width 16): {ms:.2f} ms "
          f"({ms * 1e6 / k2:.1f} ns/idx)")

  # gather of int32 single column (overlap_to_point-style relayout)
  src1 = jax.random.randint(key, (K,), 0, K, jnp.int32)
  idx = jax.random.permutation(key, K).astype(jnp.int32)
  f1 = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
  ms = timeit(f1, src1, idx, iters=args.iters)
  print(f"gather 1-col int32 (K={K/1e6:.1f}M): {ms:.2f} ms "
        f"({ms * 1e6 / K:.1f} ns/idx)")

  # ---- sorts -------------------------------------------------------------
  for n, nops in ((4_000_000, 2), (4_000_000, 3), (4_000_000, 4),
                  (7_000_000, 2), (7_000_000, 3)):
    keys = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
    payloads = [jnp.arange(n, dtype=jnp.int32) for _ in range(nops - 1)]
    f = jax.jit(lambda k, *ps: jax.lax.sort((k,) + ps, num_keys=1))
    ms = timeit(f, keys, *payloads, iters=args.iters)
    print(f"lax.sort {nops}-op n={n/1e6:.1f}M: {ms:.2f} ms")

  # segmented u32 key sort (depth16-style packed key)
  n = 7_000_000
  ku = jax.random.randint(key, (n,), 0, 1 << 30, jnp.uint32)
  pv = jnp.arange(n, dtype=jnp.int32)
  f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
  ms = timeit(f, ku, pv, iters=args.iters)
  print(f"lax.sort u32-key 2-op n={n/1e6:.1f}M: {ms:.2f} ms")

  # ---- bandwidth sanity ---------------------------------------------------
  x = jax.random.normal(key, (16, 4_000_000), jnp.float32)
  f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
  ms = timeit(f, x, iters=args.iters)
  gb = 16 * 4e6 * 4 * 2 / 1e9
  print(f"cumsum (16, 4M) f32: {ms:.2f} ms ({gb / ms * 1000:.0f} GB/s)")

  xb = x.astype(jnp.bfloat16)
  f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
  ms = timeit(f, xb, iters=args.iters)
  print(f"cumsum (16, 4M) bf16: {ms:.2f} ms")


if __name__ == "__main__":
  main()
