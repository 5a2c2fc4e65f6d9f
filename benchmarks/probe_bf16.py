"""Probe: does the TPU VPU run bf16 elementwise math at 2x the f32 rate?

The raster kernels' chunk bodies are VPU-throughput-bound (~15-20 (P, G)
elementwise ops per entry at ~34 ns each — PERF.md round-3c/round-4
"per-entry work is the only lever left"). bf16 packs two values per
32-bit vreg lane, so IF Mosaic issues packed bf16 arithmetic, the whole
blend-field pipeline could run its (P, G) ops at 2x rate with f32
carries (VERDICT r4 item 2a). This probe measures it directly:

  * arith chain: mul/add/where ladder on a (256, 128) block
  * transcendental chain: exp + log1p ladder
  * blend-ish chain: the actual chunk_weights_raw op mix

run: PYTHONPATH=. python benchmarks/probe_bf16.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, G = 256, 128
INNER = 64          # ops per loop iteration (amortize loop overhead)
ITERS = 2000


def timed(fn, *args):
  y = fn(*args)
  jax.block_until_ready(y)
  t0 = time.perf_counter()
  y = fn(*args)
  _ = float(jnp.asarray(y).ravel()[0].astype(jnp.float32))
  return time.perf_counter() - t0


def probe(kind: str, dtype):
  def kernel(x_ref, o_ref):
    def body(i, x):
      f = (i % 7 + 1).astype(x.dtype) * 0.001
      if kind == "arith":
        for _ in range(INNER // 4):
          x = x * 1.0009 + f
          y = x * x
          x = jnp.where(y > 2.0, x * 0.5, x + f)
      elif kind == "transcendental":
        for _ in range(INNER // 4):
          x = jnp.exp(x * 0.001)
          x = jnp.log1p(x * 0.5) + f
      else:  # blend-ish: the chunk_weights_raw op mix minus the matmul
        for _ in range(INNER // 8):
          a = jnp.exp(x * -0.1)                       # a_raw
          a = jnp.where(a > 0.0039, jnp.minimum(a, 0.99), 0.0)
          l = jnp.log1p(-a)
          t = jnp.exp(l)
          w = a * t
          x = x + w * f
      return x

    o_ref[:] = jax.lax.fori_loop(
        0, ITERS, body, x_ref[:], unroll=False)

  x = jnp.full((P, G), 0.5, dtype)
  f = jax.jit(lambda x: pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((P, G), dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=()),
  )(x))
  dt = timed(f, x)
  ops = {"arith": INNER, "transcendental": INNER,
         "blend": INNER // 8 * 6}[kind] * ITERS
  ns_per_op = dt / ops * 1e9
  per_block = ns_per_op  # per (P, G) block op
  print(f"{kind:15s} {str(dtype.__name__):10s} {dt*1e3:8.1f} ms total  "
        f"{per_block:7.2f} ns per (256,128) op", flush=True)
  return per_block


def main():
  for kind in ("arith", "transcendental", "blend"):
    f32 = probe(kind, jnp.float32)
    b16 = probe(kind, jnp.bfloat16)
    print(f"  -> bf16 speedup: {f32 / b16:.2f}x", flush=True)


if __name__ == "__main__":
  main()
