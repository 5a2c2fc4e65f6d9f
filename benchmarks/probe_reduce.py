"""Probe: layout variants for the sort-payload point reduction.

Decides the orientation of the round-2 reduction (sort gradient values
by point id, cumsum, boundary gather): (R, K) minor-axis vs (K, R)
major-axis cumsum, boundary gather axis, stack cost, and the full
composed reduction both ways. Internal tool.
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
  K, R, N = 4_000_000, 12, 1_000_000
  print(f"backend={jax.default_backend()} K={K/1e6}M R={R} N={N/1e6}M")

  rows = jax.random.normal(key, (R, K), jnp.float32)
  ids = jax.random.randint(key, (K,), 0, N, jnp.int32)
  offs = jnp.sort(jax.random.randint(key, (N + 1,), 0, K, jnp.int32))

  # full sort: key + R payloads
  f = jax.jit(lambda k, x: jax.lax.sort(
      (k,) + tuple(x[i] for i in range(R)), num_keys=1))
  ms = timeit(f, ids, rows)
  print(f"sort 1key+{R}payloads: {ms:.2f} ms")

  # stack orientations
  f = jax.jit(lambda x: jnp.stack([x[i] for i in range(R)], axis=0))
  print(f"stack to (R, K): {timeit(f, rows):.2f} ms")
  f = jax.jit(lambda x: jnp.stack([x[i] for i in range(R)], axis=1))
  print(f"stack to (K, R): {timeit(f, rows):.2f} ms")

  # cumsum orientations
  big = jax.random.normal(key, (R, K), jnp.float32)
  f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
  print(f"cumsum (R, K) axis1: {timeit(f, big):.2f} ms")
  bigT = jax.random.normal(key, (K, R), jnp.float32)
  f = jax.jit(lambda x: jnp.cumsum(x, axis=0))
  print(f"cumsum (K, R) axis0: {timeit(f, bigT):.2f} ms")

  # boundary gathers
  f = jax.jit(lambda x, i: jnp.take(x, i, axis=1))
  print(f"boundary take (R, K) axis1 @N+1 idx: {timeit(f, big, offs):.2f} ms")
  f = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
  print(f"boundary take (K, R) axis0 @N+1 idx: {timeit(f, bigT, offs):.2f} ms")

  # composed reduction, minor-axis layout
  @jax.jit
  def reduce_minor(k, x, offs):
    ops = jax.lax.sort((k,) + tuple(x[i] for i in range(R)), num_keys=1)
    s = jnp.stack(ops[1:], axis=0)
    pref = jnp.cumsum(s, axis=1)
    pref = jnp.concatenate([jnp.zeros((R, 1), s.dtype), pref], axis=1)
    at = jnp.take(pref, offs, axis=1)
    return (at[:, 1:] - at[:, :-1]).T

  print(f"composed minor (R,K): {timeit(reduce_minor, ids, rows, offs):.2f} ms")

  @jax.jit
  def reduce_major(k, x, offs):
    ops = jax.lax.sort((k,) + tuple(x[i] for i in range(R)), num_keys=1)
    s = jnp.stack(ops[1:], axis=1)
    pref = jnp.cumsum(s, axis=0)
    pref = jnp.concatenate([jnp.zeros((1, R), s.dtype), pref], axis=0)
    at = jnp.take(pref, offs, axis=0)
    return at[1:] - at[:-1]

  print(f"composed major (K,R): {timeit(reduce_major, ids, rows, offs):.2f} ms")

  # single-row (visibility) variants
  one = rows[0]
  @jax.jit
  def reduce_one(k, v, offs):
    sk, sv = jax.lax.sort((k, v), num_keys=1)
    pref = jnp.concatenate([jnp.zeros((1,), v.dtype), jnp.cumsum(sv)])
    at = pref[offs]
    return at[1:] - at[:-1]

  print(f"composed 1-row: {timeit(reduce_one, ids, one, offs):.2f} ms")


if __name__ == "__main__":
  main()
