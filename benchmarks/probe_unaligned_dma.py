"""Probe: Pallas DMA from HBM at arbitrary (unaligned) dynamic offsets.

The round-2 mapper redesign wants raster kernels to read each tile's bin
directly from the depth-sorted candidate stream (bins start at arbitrary
offsets) instead of from a chunk-aligned padded relayout. This measures a
kernel that streams (rows, g) blocks at per-tile unaligned offsets vs the
aligned equivalent, on realistic shapes. Correctness is checked against a
jnp oracle. Internal tool.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5):
  r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


def make_kernel(rows, g, aligned_hint):
  def kernel(starts_ref, nchunks_ref, src_hbm, out_ref, vmem, sem):
    t = pl.program_id(0)
    start = starts_ref[t]
    nch = nchunks_ref[t]
    k_total = src_hbm.shape[1]

    def dma(c, slot):
      off = jnp.minimum(start + c * g, k_total - g)
      if aligned_hint:
        off = pl.multiple_of(off, g)
      return pltpu.make_async_copy(
          src_hbm.at[:, pl.ds(off, g)], vmem.at[slot], sem.at[slot])

    @pl.when(nch > 0)
    def _():
      dma(0, 0).start()

    out_ref[0] = jnp.zeros((1, g), jnp.float32)

    def body(c, acc):
      slot = jax.lax.rem(c, jnp.asarray(2, c.dtype))

      @pl.when(c + 1 < nch)
      def _():
        dma(c + 1, 1 - slot).start()

      dma(c, slot).wait()
      return acc + jnp.sum(vmem[slot], axis=0, keepdims=True)

    out_ref[0] = jax.lax.fori_loop(0, nch, body, out_ref[0])

  return kernel


def run(rows, g, n_tiles, k, aligned, iters, interpret=False):
  key = jax.random.PRNGKey(0)
  src = jax.random.normal(key, (rows, k), jnp.float32)
  # per-tile bins: random partition of [0, k)
  cuts = np.sort(np.random.RandomState(0).randint(0, k, n_tiles - 1))
  starts = np.concatenate([[0], cuts]).astype(np.int32)
  ends = np.concatenate([cuts, [k]]).astype(np.int32)
  if aligned:
    starts = (starts // g) * g
  counts = ends - starts
  nchunks = -(-counts // g)
  starts_j = jnp.asarray(starts)
  nchunks_j = jnp.asarray(nchunks.astype(np.int32))

  kernel = make_kernel(rows, g, aligned)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(n_tiles,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((1, 1, g), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2, rows, g), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )
  f = jax.jit(lambda s, n, x: pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_tiles, 1, g), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=interpret)(s, n, x))
  out = f(starts_j, nchunks_j, src)
  ms = timeit(f, starts_j, nchunks_j, src, iters=iters)
  total_chunks = int(nchunks.sum())
  gb = total_chunks * rows * g * 4 / 1e9
  label = "aligned" if aligned else "UNALIGNED"
  print(f"{label} rows={rows} g={g} tiles={n_tiles} chunks={total_chunks}: "
        f"{ms:.2f} ms ({gb / ms * 1000:.0f} GB/s)")
  return out, src, starts, nchunks


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--check", action="store_true")
  args = p.parse_args()

  interpret = jax.default_backend() == "cpu"
  rows, g = 24, 128
  if args.check or interpret:
    out, src, starts, nchunks = run(8, 8, 7, 256, False, 2,
                                    interpret=interpret)
    # oracle
    src_n = np.asarray(src)
    for t in range(7):
      acc = np.zeros((8,), np.float32)
      for c in range(int(nchunks[t])):
        off = min(starts[t] + c * 8, 256 - 8)
        acc += src_n[:, off:off + 8].sum(axis=0)
      np.testing.assert_allclose(np.asarray(out[t, 0]), acc, rtol=1e-5)
    print("correctness OK")
    if interpret:
      return

  run(rows, g, 12288, 3_500_000, True, args.iters)
  run(rows, g, 12288, 3_500_000, False, args.iters)
  run(rows, g, 12288, 7_000_000, False, args.iters)


if __name__ == "__main__":
  main()
