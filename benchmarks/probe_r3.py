"""Round-3 kernel-floor probes on the real TPU (internal tool).

The round-2 profile left ~64 ms in the Pallas kernels at ~1-2 us/chunk
with single-digit MFU, plus ~50 ms of sort/gather plumbing. These probes
split the floor into its suspected parts so round 3 optimizes the right
one:

  A. Mosaic grid-step overhead: same total output written by 12288 tiny
     grid steps vs 16x fewer, 16x larger steps.
  B. Per-chunk floor without grid overhead: one grid step, fori over C
     double-buffered chunk DMAs, body = nothing / forward blend math /
     cheaper variants.
  C. Transcendental unit cost: exp / log1p / mul-add per (256, 128)
     block inside one kernel.
  D. Gather width scaling (axis 1, the combined-gather shape) and
     lax.sort payload scaling on current jax.

Readback-forced timing (the axon relay's block_until_ready under-reports).
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from taichi_gaussian_rasterizer_tpu.config import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops.raster import blend


def timeit(fn, *args, iters=10, warmup=1):
  for _ in range(warmup):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*args)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return (time.perf_counter() - t0) / iters * 1000


# ---------------------------------------------------------------- A: grid
def probe_grid(iters):
  total = 12288

  def make(nsteps):
    per = total // nsteps

    def kernel(x_ref, o_ref):
      o_ref[...] = x_ref[...] * 2.0

    @jax.jit
    def f(x):
      return pl.pallas_call(
          kernel,
          grid=(nsteps,),
          in_specs=[pl.BlockSpec((per, 8, 256), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec((per, 8, 256), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((total, 8, 256), jnp.float32),
          compiler_params=pltpu.CompilerParams(
              dimension_semantics=("arbitrary",)),
      )(x)

    return f

  x = jnp.ones((total, 8, 256), jnp.float32)
  base = None
  for nsteps in (total, total // 4, total // 16, total // 64):
    ms = timeit(make(nsteps), x, iters=iters)
    if base is None:
      base = ms
    print(f"A grid steps={nsteps:6d} (block {total // nsteps:3d} tiles): "
          f"{ms:7.2f} ms  -> {ms * 1e6 / nsteps:7.0f} ns/step")


# ------------------------------------------------------- B: chunk floor
def _chunk_kernel(c_chunks, variant, rows, g, p):
  cfg = RasterConfig()

  def kernel(comb_hbm, out_ref, comb_vmem, acc, sem_c):
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % 16).astype(jnp.float32) + 0.5
    py = (lin // 16).astype(jnp.float32) + 0.5
    basis = blend.pixel_basis(px, py)
    acc[...] = jnp.zeros((rows, p), jnp.float32)
    two = jnp.asarray(2, jnp.int32)

    def dma(c, slot):
      return pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(c * g, g)], comb_vmem.at[slot],
          sem_c.at[slot])

    dma(0, 0).start()

    def body(c, t_carry):
      slot = jax.lax.rem(c, two)

      @pl.when(c + 1 < c_chunks)
      def _():
        dma(c + 1, 1 - slot).start()

      dma(c, slot).wait()
      pts = comb_vmem[slot, 0:8, :]
      feats = comb_vmem[slot, 8:, :]

      if variant == "dma_only":
        acc[0:1, 0:1] += pts[0:1, 0:1]
        return t_carry
      if variant == "fwd":
        coeffs = blend.quad_coeffs(pts)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        w = blend.chunk_weights_raw(a_raw, t_carry, cfg, blending=True)
        img = blend.dot_split(feats, w.weight, (((1,), (1,)), ((), ())),
                              passes=3)
        acc[...] += img
        return w.t_carry
      if variant == "fwd_1pass":
        coeffs = blend.quad_coeffs(pts)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        w = blend.chunk_weights_raw(a_raw, t_carry, cfg, blending=True,
                                    cumsum_passes=1)
        img = blend.dot_split(feats, w.weight, (((1,), (1,)), ((), ())),
                              passes=1)
        acc[...] += img
        return w.t_carry
      if variant == "field_only":
        # alpha field, no cumprod/transcendental chain past the exp
        coeffs = blend.quad_coeffs(pts)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        acc[...] += blend.dot_split(feats, a_raw, (((1,), (1,)), ((), ())),
                                    passes=1)
        return t_carry
      if variant == "matmul_only":
        # no transcendentals at all: coeffs + matmuls + weightless blend
        coeffs = blend.quad_coeffs(pts)
        la = blend.chunk_log_alpha(basis, coeffs)
        acc[...] += blend.dot_split(feats, la, (((1,), (1,)), ((), ())),
                                    passes=1)
        return t_carry
      raise ValueError(variant)

    jax.lax.fori_loop(0, c_chunks, body, jnp.ones((p, 1), jnp.float32))
    out_ref[...] = acc[...]

  return kernel


def probe_chunks(iters):
  g, p = 128, 256
  c_chunks = 24576
  rows = 8
  comb = jax.random.normal(jax.random.PRNGKey(0), (16, c_chunks * g),
                           jnp.float32) * 0.01

  for variant in ("dma_only", "matmul_only", "field_only", "fwd_1pass",
                  "fwd"):
    kernel = _chunk_kernel(c_chunks, variant, rows, g, p)

    @jax.jit
    def f(x, kernel=kernel):
      return pl.pallas_call(
          kernel,
          grid=(1,),
          in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((rows, p), jnp.float32),
          scratch_shapes=[
              pltpu.VMEM((2, 16, g), jnp.float32),
              pltpu.VMEM((rows, p), jnp.float32),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      )(x)

    ms = timeit(f, comb, iters=iters)
    print(f"B chunks variant={variant:12s}: {ms:7.2f} ms "
          f"-> {ms * 1e6 / c_chunks:6.0f} ns/chunk")


# ------------------------------------------------- C: transcendental cost
def probe_transcendentals(iters):
  p, g = 256, 128
  reps = 512

  def make(op):
    def kernel(x_ref, o_ref):
      def body(i, x):
        if op == "muladd":
          return x * 1.000001 + 1e-7
        if op == "exp":
          return jnp.exp(x * 1e-6) - 1.0
        if op == "exp2":
          return jnp.exp2(x * 1e-6) - 1.0
        if op == "log1p":
          return jnp.log1p(x * 1e-6)
        if op == "fastexp":
          # Schraudolph: exp(v) ~ bitcast(i32(A * v + B))
          v = x * 1e-6
          a = jnp.float32(12102203.0)     # 2^23 / ln 2
          b = jnp.float32(1064986316.0)   # 127 * 2^23 - 60801 * 8
          i = (v * a + b).astype(jnp.int32)
          return jax.lax.bitcast_convert_type(i, jnp.float32) - 1.0
        if op == "divide":
          return x / (x + 1.5)
        if op == "rsqrt":
          return jax.lax.rsqrt(jnp.abs(x) + 1.5)
        raise ValueError(op)

      o_ref[...] = jax.lax.fori_loop(0, reps, body, x_ref[...])

    @jax.jit
    def f(x):
      return pl.pallas_call(
          kernel,
          out_shape=jax.ShapeDtypeStruct((p, g), jnp.float32),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      )(x)

    return f

  x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (p, g), jnp.float32))
  base = None
  for op in ("muladd", "exp", "exp2", "log1p", "fastexp", "divide",
             "rsqrt"):
    ms = timeit(make(op), x, iters=iters)
    ns = ms * 1e6 / reps
    if base is None:
      base = ns
    print(f"C transcendental {op:8s}: {ns:7.1f} ns per (256,128) block "
          f"({ns / base:5.1f}x muladd)")


# --------------------------------------------------- D: gather/sort scale
def probe_gather_sort(iters):
  key = jax.random.PRNGKey(0)
  k = 3_100_000
  n = 1_000_000
  idx = jax.random.randint(key, (k,), 0, n, jnp.int32)
  f = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
  for rows in (1, 2, 4, 7, 8, 10, 12, 16):
    src = jax.random.normal(key, (rows, n), jnp.float32)
    ms = timeit(f, src, idx, iters=iters)
    print(f"D gather axis1 rows={rows:2d} (K={k/1e6:.1f}M): {ms:6.2f} ms "
          f"({ms * 1e6 / k:5.2f} ns/idx)")

  # one wide u32 gather vs several f32 gathers (packing candidates)
  src = jax.random.randint(key, (5, n), 0, 1 << 30, jnp.uint32)
  ms = timeit(f, src, idx, iters=iters)
  print(f"D gather axis1 rows= 5 u32: {ms:6.2f} ms ({ms * 1e6 / k:5.2f} ns/idx)")

  for npay, length in ((1, 3_400_000), (2, 3_400_000), (5, 3_100_000),
                       (3, 3_100_000)):
    keys_u = jax.random.randint(key, (length,), 0, 1 << 30, jnp.uint32)
    pays = [jax.random.randint(key, (length,), 0, 1 << 30, jnp.uint32)
            for _ in range(npay)]
    fs = jax.jit(lambda kk, *ps: jax.lax.sort((kk,) + ps, num_keys=1))
    ms = timeit(fs, keys_u, *pays, iters=iters)
    print(f"D sort u32 + {npay} u32 payloads n={length/1e6:.1f}M: {ms:6.2f} ms")




# ------------------------------------------------ E: DMA structure probes
def probe_dma(iters):
  g, p = 128, 256
  c_chunks = 24576
  rows = 16
  comb = jax.random.normal(jax.random.PRNGKey(0), (rows, c_chunks * g),
                           jnp.float32) * 0.01

  def run(kernel, scratch_shapes, label):
    @jax.jit
    def f(x):
      return pl.pallas_call(
          kernel,
          grid=(1,),
          in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((8, p), jnp.float32),
          scratch_shapes=scratch_shapes,
      )(x)
    ms = timeit(f, comb, iters=iters)
    print(f"E {label}: {ms:7.2f} ms -> {ms * 1e6 / c_chunks:6.0f} ns/chunk")

  # ring-buffered per-chunk DMA, depth D
  def make_ring(depth):
    def kernel(comb_hbm, out_ref, comb_vmem, acc, sem_c):
      acc[...] = jnp.zeros((8, p), jnp.float32)
      dd = jnp.asarray(depth, jnp.int32)

      def dma(c, slot):
        return pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(c * g, g)], comb_vmem.at[slot],
            sem_c.at[slot])

      for c0 in range(depth - 1):
        dma(c0, c0).start()

      def body(c, carry):
        slot = jax.lax.rem(c, dd)

        @pl.when(c + depth - 1 < c_chunks)
        def _():
          dma(c + depth - 1, jax.lax.rem(c + depth - 1, dd)).start()

        dma(c, slot).wait()
        acc[0:1, 0:1] += comb_vmem[slot, 0:1, 0:1]
        return carry

      jax.lax.fori_loop(0, c_chunks, body, 0)
      out_ref[...] = acc[...]
    return kernel

  for depth in (2, 4, 8):
    run(make_ring(depth),
        [pltpu.VMEM((depth, rows, g), jnp.float32),
         pltpu.VMEM((8, p), jnp.float32),
         pltpu.SemaphoreType.DMA((depth,))],
        f"ring depth={depth} per-chunk DMA")

  # windowed: one (rows, W*g) DMA per W chunks, static sub-slices
  def make_window(w):
    nwin = c_chunks // w

    def kernel(comb_hbm, out_ref, win_vmem, acc, sem_w):
      acc[...] = jnp.zeros((8, p), jnp.float32)
      two = jnp.asarray(2, jnp.int32)

      def dma(wi, slot):
        return pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(wi * (w * g), w * g)], win_vmem.at[slot],
            sem_w.at[slot])

      dma(0, 0).start()

      def body(wi, carry):
        slot = jax.lax.rem(wi, two)

        @pl.when(wi + 1 < nwin)
        def _():
          dma(wi + 1, 1 - slot).start()

        dma(wi, slot).wait()
        for k in range(w):
          acc[0:1, 0:1] += win_vmem[slot, 0:1, k * g:k * g + 1]
        return carry

      jax.lax.fori_loop(0, nwin, body, 0)
      out_ref[...] = acc[...]
    return kernel

  for w in (4, 16):
    run(make_window(w),
        [pltpu.VMEM((2, rows, w * g), jnp.float32),
         pltpu.VMEM((8, p), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))],
        f"window {w} chunks/DMA")

  # windowed + full fwd compute per sub-chunk (the real candidate)
  cfg = RasterConfig()

  def make_window_fwd(w):
    nwin = c_chunks // w

    def kernel(comb_hbm, out_ref, win_vmem, acc, sem_w):
      lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
      px = (lin % 16).astype(jnp.float32) + 0.5
      py = (lin // 16).astype(jnp.float32) + 0.5
      basis = blend.pixel_basis(px, py)
      acc[...] = jnp.zeros((8, p), jnp.float32)
      two = jnp.asarray(2, jnp.int32)

      def dma(wi, slot):
        return pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(wi * (w * g), w * g)], win_vmem.at[slot],
            sem_w.at[slot])

      dma(0, 0).start()

      def body(wi, t_carry):
        slot = jax.lax.rem(wi, two)

        @pl.when(wi + 1 < nwin)
        def _():
          dma(wi + 1, 1 - slot).start()

        dma(wi, slot).wait()
        for k in range(w):
          pts = win_vmem[slot, 0:8, k * g:(k + 1) * g]
          feats = win_vmem[slot, 8:, k * g:(k + 1) * g]
          coeffs = blend.quad_coeffs(pts)
          a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
          wts = blend.chunk_weights_raw(a_raw, t_carry, cfg, blending=True)
          img = blend.dot_split(feats, wts.weight, (((1,), (1,)), ((), ())),
                                passes=3)
          acc[...] += img
          t_carry = wts.t_carry
        return t_carry

      jax.lax.fori_loop(0, nwin, body, jnp.ones((p, 1), jnp.float32))
      out_ref[...] = acc[...]
    return kernel

  for w in (4, 16):
    run(make_window_fwd(w),
        [pltpu.VMEM((2, rows, w * g), jnp.float32),
         pltpu.VMEM((8, p), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))],
        f"window {w} chunks/DMA + fwd math")

  # whole-window coeffs (one (rows, W*g) coeff/field pass, 4 sub-cumsums)
  def make_window_fwd_wide(w):
    nwin = c_chunks // w

    def kernel(comb_hbm, out_ref, win_vmem, acc, sem_w):
      lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
      px = (lin % 16).astype(jnp.float32) + 0.5
      py = (lin // 16).astype(jnp.float32) + 0.5
      basis = blend.pixel_basis(px, py)
      acc[...] = jnp.zeros((8, p), jnp.float32)
      two = jnp.asarray(2, jnp.int32)

      def dma(wi, slot):
        return pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(wi * (w * g), w * g)], win_vmem.at[slot],
            sem_w.at[slot])

      dma(0, 0).start()

      def body(wi, t_carry):
        slot = jax.lax.rem(wi, two)

        @pl.when(wi + 1 < nwin)
        def _():
          dma(wi + 1, 1 - slot).start()

        dma(wi, slot).wait()
        pts = win_vmem[slot, 0:8, :]
        feats = win_vmem[slot, 8:, :]
        coeffs = blend.quad_coeffs(pts)                      # (8, W*g)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))  # (P, W*g)
        for k in range(w):
          wts = blend.chunk_weights_raw(a_raw[:, k * g:(k + 1) * g],
                                        t_carry, cfg, blending=True)
          img = blend.dot_split(feats[:, k * g:(k + 1) * g], wts.weight,
                                (((1,), (1,)), ((), ())), passes=3)
          acc[...] += img
          t_carry = wts.t_carry
        return t_carry

      jax.lax.fori_loop(0, nwin, body, jnp.ones((p, 1), jnp.float32))
      out_ref[...] = acc[...]
    return kernel


  # ring depth 8 with full fwd math (vs window 4 + fwd)
  def make_ring_fwd(depth):
    def kernel(comb_hbm, out_ref, comb_vmem, acc, sem_c):
      lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
      px = (lin % 16).astype(jnp.float32) + 0.5
      py = (lin // 16).astype(jnp.float32) + 0.5
      basis = blend.pixel_basis(px, py)
      acc[...] = jnp.zeros((8, p), jnp.float32)
      dd = jnp.asarray(depth, jnp.int32)

      def dma(c, slot):
        return pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(c * g, g)], comb_vmem.at[slot],
            sem_c.at[slot])

      for c0 in range(depth - 1):
        dma(c0, c0).start()

      def body(c, t_carry):
        slot = jax.lax.rem(c, dd)

        @pl.when(c + depth - 1 < c_chunks)
        def _():
          dma(c + depth - 1, jax.lax.rem(c + depth - 1, dd)).start()

        dma(c, slot).wait()
        pts = comb_vmem[slot, 0:8, :]
        feats = comb_vmem[slot, 8:, :]
        coeffs = blend.quad_coeffs(pts)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        wts = blend.chunk_weights_raw(a_raw, t_carry, cfg, blending=True)
        img = blend.dot_split(feats, wts.weight, (((1,), (1,)), ((), ())),
                              passes=3)
        acc[...] += img
        return wts.t_carry

      jax.lax.fori_loop(0, c_chunks, body, jnp.ones((p, 1), jnp.float32))
      out_ref[...] = acc[...]
    return kernel

  run(make_ring_fwd(8),
      [pltpu.VMEM((8, rows, g), jnp.float32),
       pltpu.VMEM((8, p), jnp.float32),
       pltpu.SemaphoreType.DMA((8,))],
      "ring depth=8 + fwd math")

  # compute only: no DMA, reuse one resident chunk
  def make_compute_only():
    def kernel(comb_hbm, out_ref, comb_vmem, acc, sem_c):
      lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
      px = (lin % 16).astype(jnp.float32) + 0.5
      py = (lin // 16).astype(jnp.float32) + 0.5
      basis = blend.pixel_basis(px, py)
      acc[...] = jnp.zeros((8, p), jnp.float32)
      dma0 = pltpu.make_async_copy(
          comb_hbm.at[:, pl.ds(0, g)], comb_vmem.at[0], sem_c.at[0])
      dma0.start()
      dma0.wait()

      def body(c, t_carry):
        pts = comb_vmem[0, 0:8, :]
        feats = comb_vmem[0, 8:, :]
        coeffs = blend.quad_coeffs(pts)
        a_raw = jnp.exp(blend.chunk_log_alpha(basis, coeffs))
        wts = blend.chunk_weights_raw(a_raw, t_carry, cfg, blending=True)
        img = blend.dot_split(feats, wts.weight, (((1,), (1,)), ((), ())),
                              passes=3)
        acc[...] += img
        return wts.t_carry

      jax.lax.fori_loop(0, c_chunks, body, jnp.ones((p, 1), jnp.float32))
      out_ref[...] = acc[...]
    return kernel

  run(make_compute_only(),
      [pltpu.VMEM((2, rows, g), jnp.float32),
       pltpu.VMEM((8, p), jnp.float32),
       pltpu.SemaphoreType.DMA((2,))],
      "compute only (resident chunk)")

  run(make_window_fwd_wide(4),
      [pltpu.VMEM((2, rows, 4 * g), jnp.float32),
       pltpu.VMEM((8, p), jnp.float32),
       pltpu.SemaphoreType.DMA((2,))],
      "window 4 chunks/DMA + wide-field fwd math")


# --------------------------------- F: dynamic lane slice support check
def probe_dynslice(iters):
  g = 128
  rows = 16
  w = 2048

  def kernel(off_ref, win_ref, out_ref):
    off = pl.multiple_of(off_ref[0], g)
    out_ref[...] = win_ref[:, pl.ds(off, g)] * 2.0

  @jax.jit
  def f(off, x):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, g), jnp.float32),
    )(off, x)

  x = jnp.arange(rows * w, dtype=jnp.float32).reshape(rows, w)
  try:
    r = f(jnp.asarray([256], jnp.int32), x)
    ok = bool(jnp.allclose(r[0, 0], 512.0))
    print(f"F dynamic 128-aligned lane slice on VMEM: works={ok}")
  except Exception as e:
    print(f"F dynamic lane slice FAILED: {type(e).__name__}: {str(e)[:200]}")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--iters", type=int, default=10)
  ap.add_argument("--only", type=str, default="")
  args = ap.parse_args()
  print(f"backend={jax.default_backend()}")
  probes = dict(grid=probe_grid, chunks=probe_chunks,
                transcendentals=probe_transcendentals,
                gather=probe_gather_sort, dma=probe_dma,
                dynslice=probe_dynslice)
  for name, fn in probes.items():
    if args.only and name not in args.only:
      continue
    fn(args.iters)


if __name__ == "__main__":
  main()
