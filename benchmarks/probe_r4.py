"""Round-4 probes on the real TPU (internal tool).

A. Lane-UNALIGNED HBM->VMEM chunk DMA: legality + cost. The flat
   iteration list pays one boundary-duplicate entry per tile (38% of all
   kernel iterations at 1M@2048) ONLY because chunks are forced to
   128-lane-aligned offsets. If a DMA can read (R, 128) slices at
   arbitrary lane offsets at ~aligned cost, entries can start exactly at
   each tile's bin start: no shared chunks, no boundary merges, ~26k
   entries instead of 32.1k.

B. Same question for VMEM->HBM output flushes (the gradient chunks).

Readback-forced timing (the axon relay's block_until_ready under-reports).
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=10, warmup=1):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


ROWS = 32
G = 128
DEPTH = 4


def make_read_probe(n_chunks, mode):
  """fori over n_chunks ring-DMA'd (ROWS, G) reads at aligned or
  unaligned offsets; body sums the chunk into an accumulator."""

  def kernel(off_ref, x_hbm, o_ref, x_vmem, acc, sem):
    def dma(i, slot):
      off = off_ref[i]
      if mode == "aligned":
        off = pl.multiple_of(off, G)
      return pltpu.make_async_copy(
          x_hbm.at[:, pl.ds(off, G)], x_vmem.at[slot], sem.at[slot])

    for d in range(DEPTH - 1):
      dma(d, d).start()

    def body(i, carry):
      slot = jax.lax.rem(i, DEPTH)

      @pl.when(i + DEPTH - 1 < n_chunks)
      def _():
        dma(i + DEPTH - 1, jax.lax.rem(i + DEPTH - 1, DEPTH)).start()

      dma(i, slot).wait()
      acc[...] += x_vmem[slot]
      return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[...] = acc[...]

  @jax.jit
  def f(offs, x):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((DEPTH, ROWS, G), jnp.float32),
                pltpu.VMEM((ROWS, G), jnp.float32),
                pltpu.SemaphoreType.DMA((DEPTH,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(offs, x)

  return f


def make_write_probe(n_chunks, mode, k_cap):
  """fori over n_chunks: write a (ROWS, G) VMEM block to HBM at aligned
  or unaligned offsets (disjoint regions, like the gradient flushes)."""

  def kernel(off_ref, o_hbm, dummy_ref, blk, sem):
    blk[...] = jnp.ones((ROWS, G), jnp.float32)

    def dma(i, slot):
      off = off_ref[i]
      if mode == "aligned":
        off = pl.multiple_of(off, G)
      return pltpu.make_async_copy(
          blk, o_hbm.at[:, pl.ds(off, G)], sem.at[slot])

    def body(i, carry):
      slot = jax.lax.rem(i, 2)

      @pl.when(i >= 2)
      def _():
        dma(i - 2, slot).wait()

      dma(i, slot).start()
      return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 1)
    def _():
      dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

    @pl.when(n_chunks >= 2)
    def _():
      dma(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    dummy_ref[0] = 1.0

  @jax.jit
  def f(offs):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((ROWS, G), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((ROWS, k_cap), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(offs)

  return f


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--iters", type=int, default=20)
  ap.add_argument("--chunks", type=int, default=20000)
  args = ap.parse_args()

  n = args.chunks
  k_cap = (n + 2) * G
  rng = np.random.default_rng(0)

  # offsets: aligned = i*G; unaligned = i*G + random 0..G-1 (disjoint
  # strided reads/writes, like bin-start entries)
  offs_aligned = (np.arange(n, dtype=np.int32) * G)
  jitter = rng.integers(0, G, size=n, dtype=np.int32)
  offs_unaligned = offs_aligned + jitter
  offs_8aligned = offs_aligned + (jitter // 8) * 8

  x = jnp.asarray(rng.normal(size=(ROWS, k_cap)).astype(np.float32))

  for mode, offs in [("aligned", offs_aligned),
                     ("8-aligned", offs_8aligned),
                     ("unaligned", offs_unaligned)]:
    f = make_read_probe(n, "aligned" if mode == "aligned" else "any")
    try:
      ms = timeit(f, jnp.asarray(offs), x, iters=args.iters)
      # correctness: compare against numpy for a small slice
      got = np.asarray(f(jnp.asarray(offs), x))
      want = sum(np.asarray(x)[:, o:o + G] for o in offs)
      ok = np.allclose(got, want, rtol=1e-4, atol=1e-2)
      print(f"A read {mode:10s}: {ms:7.3f} ms = {ms / n * 1e6:6.1f} ns/chunk"
            f"  correct={ok}")
    except Exception as e:
      print(f"A read {mode:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")

  for mode, offs in [("aligned", offs_aligned),
                     ("unaligned", offs_unaligned)]:
    f = make_write_probe(n, "aligned" if mode == "aligned" else "any", k_cap)
    try:
      ms = timeit(f, jnp.asarray(offs), iters=args.iters)
      print(f"B write {mode:10s}: {ms:7.3f} ms = {ms / n * 1e6:6.1f} ns/chunk")
    except Exception as e:
      print(f"B write {mode:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
  main()
