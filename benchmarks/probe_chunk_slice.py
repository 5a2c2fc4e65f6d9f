"""Probe: chunk-granular relayout via vmapped dynamic_slice.

The mapper's padded relayout moves contiguous 128-slot runs (padded
chunks never span bins), so instead of a per-slot gather (9.2 ns/idx)
it can be ~26k gathered slices of 128 contiguous elements. Measures
vmapped dynamic_slice on 1-D int32 and on wide (rows, K) buffers.
Internal tool.
"""

import time

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
  key = jax.random.PRNGKey(0)
  stream = 3_000_000
  g = 128
  n_chunks = 26_000
  print(f"backend={jax.default_backend()}")

  src1 = jax.random.randint(key, (stream,), 0, 1 << 20, jnp.int32)
  starts = jax.random.randint(key, (n_chunks,), 0, stream - g, jnp.int32)

  f = jax.jit(lambda s, st: jax.vmap(
      lambda o: jax.lax.dynamic_slice(s, (o,), (g,)))(st))
  ms = timeit(f, src1, starts)
  print(f"vmap dynamic_slice 1-D int32 ({n_chunks} x {g}): {ms:.2f} ms "
        f"({ms * 1e6 / n_chunks:.0f} ns/slice)")

  # per-slot gather baseline for the same output size
  idx = jax.random.randint(key, (n_chunks * g,), 0, stream, jnp.int32)
  fb = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
  ms = timeit(fb, src1, idx)
  print(f"per-slot 1-col gather ({n_chunks * g / 1e6:.2f}M idx): {ms:.2f} ms")

  # same trick expressed as a 2-level take: out[j, l] = src[starts[j] + l]
  lane = jnp.arange(g, dtype=jnp.int32)
  f2 = jax.jit(lambda s, st: jnp.take(s, st[:, None] + lane[None, :],
                                      axis=0))
  ms = timeit(f2, src1, starts)
  print(f"take with (J, g) computed idx: {ms:.2f} ms")

  # wide buffer: slices along axis 1 of (16, K)
  rows = 16
  src2 = jax.random.normal(key, (rows, stream), jnp.float32)
  fw = jax.jit(lambda s, st: jax.vmap(
      lambda o: jax.lax.dynamic_slice(s, (0, o), (rows, g)))(st))
  ms = timeit(fw, src2, starts)
  print(f"vmap dynamic_slice (16,K) axis1 ({n_chunks} x (16,{g})): {ms:.2f} ms")

  # wide buffer transposed: slices along axis 0 of (K, 16)
  src3 = jax.random.normal(key, (stream, rows), jnp.float32)
  ft = jax.jit(lambda s, st: jax.vmap(
      lambda o: jax.lax.dynamic_slice(s, (o, 0), (g, rows)))(st))
  ms = timeit(ft, src3, starts)
  print(f"vmap dynamic_slice (K,16) axis0: {ms:.2f} ms")


if __name__ == "__main__":
  main()
