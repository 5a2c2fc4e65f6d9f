"""Probe: XLA gather throughput vs TABLE size (TPU).

Motivates emission-side saturation-depth culling: accepting a candidate
only while its depth precedes its tile's (probed) saturation depth
would shrink the candidate stream BEFORE the frame's largest sort
(heavy regime: ~13M rows -> ~4M), but the test is a per-candidate
lookup sat_depth[tile_id] over a (n_tiles,) table. Large-table gathers
cost ~5-7 ns/idx (PERF.md) which would exceed the sort savings; this
measures whether tiny cache-resident tables are materially faster.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u probe_small_gather.py
"""
import time

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()


def bench(fn, *args, iters=30):
  fn = jax.jit(fn)
  r = fn(*args)
  _ = float(jnp.asarray(r).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jnp.asarray(r).ravel()[0])
  return (time.perf_counter() - t0) / iters


def main():
  n_idx = 14_000_000 + 8   # heavy-regime candidate-stream scale, off-128
  key = jax.random.PRNGKey(0)
  for n_tab in (1024, 12_288, 49_152, 196_608, 3_000_000):
    tab = jax.random.normal(key, (n_tab,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0, n_tab,
                             jnp.int32)
    dt = bench(lambda t, i: jnp.sum(jnp.take(t, i)), tab, idx)
    print(f"table {n_tab:>9}: {dt * 1e9 / n_idx:6.2f} ns/idx "
          f"({dt * 1e3:7.2f} ms)")
  # the emission-shaped variant: compare against an elementwise baseline
  # of the same column shape (what the accept mask costs without lookup)
  tab = jax.random.normal(key, (12_288,), jnp.float32)
  idx = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0, 12_288,
                           jnp.int32)
  d = jax.random.normal(jax.random.PRNGKey(2), (n_idx,), jnp.float32)
  dt = bench(lambda t, i, d: jnp.sum((d <= jnp.take(t, i)).astype(
      jnp.float32)), tab, idx, d)
  print(f"lookup+compare     : {dt * 1e9 / n_idx:6.2f} ns/idx")
  dt = bench(lambda d: jnp.sum((d <= 0.5).astype(jnp.float32)), d)
  print(f"compare only       : {dt * 1e9 / n_idx:6.2f} ns/idx")


if __name__ == "__main__":
  main()
