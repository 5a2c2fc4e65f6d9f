"""Benchmark timing harness.

The reference wraps torch.profiler / torch.cuda.Event timing
(benchmarks/util.py:6-37); the JAX analog is block_until_ready wall
timing plus jax.profiler traces (utils/runtime.profiler_trace).
"""

import time
from typing import Callable

import jax


def benchmarked(name: str, fn: Callable, *args, iters: int = 50,
                warmup: int = 3, profile: bool = False, **kwargs):
  """Time fn(*args) with compile warmup; returns (result, ms_per_call)."""
  result = None
  for _ in range(max(warmup, 1)):
    result = fn(*args, **kwargs)
  jax.block_until_ready(result)

  ctx = None
  if profile:
    from .runtime import profiler_trace
    ctx = profiler_trace(f"/tmp/tgr_trace_{name}")
    ctx.__enter__()

  t0 = time.perf_counter()
  for _ in range(iters):
    result = fn(*args, **kwargs)
  jax.block_until_ready(result)
  ms = (time.perf_counter() - t0) / iters * 1000.0

  if ctx is not None:
    ctx.__exit__(None, None, None)

  print(f"{name}: {ms:.3f} ms/call ({1000.0 / ms:.1f} it/s)")
  return result, ms
