"""Round-2 probes: sort-payload byte scaling (bf16 packing), carrying
kernel input data through the candidate sort vs gathering afterwards,
and MXU matmul precision inside a Pallas chunk kernel. Internal tool."""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
  r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--k", type=int, default=3_000_000)
  args = ap.parse_args()
  K = args.k
  key = jax.random.PRNGKey(0)
  print(f"backend={jax.default_backend()} K={K/1e6}M")

  ids = jax.random.randint(key, (K,), 0, 1_000_000, jnp.int32)
  u32key = ids.astype(jnp.uint32)

  # --- payload byte scaling: R f32 payloads vs R/2 u32-packed bf16 ---
  for r in (2, 4, 6, 8, 10, 12):
    rows = jax.random.normal(key, (r, K), jnp.float32)
    f = jax.jit(lambda k, x, r=r: jax.lax.sort(
        (k,) + tuple(x[i] for i in range(r)), num_keys=1))
    print(f"sort u32key + {r} f32 payloads: {timeit(f, u32key, rows):.2f} ms")

  # u16 payloads: same count, half bytes — tests byte- vs column-scaling
  for r in (4, 8, 12):
    rows16 = jax.random.randint(key, (r, K), 0, 65535, jnp.int32).astype(
        jnp.uint16)
    f = jax.jit(lambda k, x, r=r: jax.lax.sort(
        (k,) + tuple(x[i] for i in range(r)), num_keys=1))
    print(f"sort u32key + {r} u16 payloads: {timeit(f, u32key, rows16):.2f} ms")

  # --- 2-key (i32 tile, f32 depth) + pos: the current candidate sort ---
  dep = jax.random.uniform(key, (K,), jnp.float32)
  pos = jnp.arange(K, dtype=jnp.int32)
  f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                           is_stable=True))
  print(f"sort 2key (i32,f32) + pos [stable]: {timeit(f, ids, dep, pos):.2f} ms")
  f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
  print(f"sort u32 packed key + pos: {timeit(f, u32key, pos):.2f} ms")

  # --- gather widths at K indices (for comparison) ---
  tbl = jax.random.normal(key, (16, 1_000_001), jnp.float32)
  idx = jax.random.randint(key, (K,), 0, 1_000_000, jnp.int32)
  for w in (8, 16):
    f = jax.jit(lambda t, i, w=w: jnp.take(t[:w], i, axis=1))
    print(f"gather width {w} f32 @K idx: {timeit(f, tbl, idx):.2f} ms")

  # --- cumsum (12, K) both precisions ---
  big = jax.random.normal(key, (12, K), jnp.float32)
  f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
  print(f"cumsum (12, K) f32: {timeit(f, big):.2f} ms")


if __name__ == "__main__":
  main()
