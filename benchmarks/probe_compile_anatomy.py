"""Probe: where does the ~58 s per-row bench 'compile' actually go?

Every bench row pays ~55-60 s on its first train_frame call in EVERY
process, even though the axon relay advertises a server-side
compile-cache and jax's persistent cache is configured (runtime.init).
This probe splits that time for the exact headline executable:

  * trace+lower: jax.jit(f).lower(args)    — pure client-side Python/MLIR
  * compile:     lowered.compile()         — relay HTTP + XLA/Mosaic
  * first run:   compiled(args) + readback — executable load + execute

run: PYTHONPATH=. python benchmarks/probe_compile_anatomy.py
"""

import time

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()

from bench import make_scene  # noqa: E402  (host-side scene gen)
from taichi_gaussian_rasterizer_tpu import (  # noqa: E402
    RasterConfig, render_gaussians)

# headline frame constants (bench log 2026-08-19; skips the probe phase)
CAPACITY = 2557952
EMIT_TAILS = (1000000, 882688, 405504, 405504) + (1024,) * 22
IMAGE_SIZE = (2048, 1536)

config = RasterConfig(tile_size=16, points_per_chunk=128,
                      saturation_early_exit=False)
gaussians, camera = make_scene(1_000_000, IMAGE_SIZE)
g_image = jnp.zeros((IMAGE_SIZE[1], IMAGE_SIZE[0], 3), jnp.float32)


def train_frame(gaussians, g_image):
  def loss(g):
    r = render_gaussians(g, camera, config, capacity=CAPACITY,
                         emit_tails=EMIT_TAILS)
    return jnp.vdot(r.image, g_image)

  g = jax.grad(loss)(gaussians)
  return jnp.sum(g.position)


t0 = time.perf_counter()
lowered = jax.jit(train_frame).lower(gaussians, g_image)
t_lower = time.perf_counter() - t0

t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0

t0 = time.perf_counter()
probe = compiled(gaussians, g_image)
_ = float(probe)
t_first = time.perf_counter() - t0

t0 = time.perf_counter()
probe = compiled(gaussians, g_image)
_ = float(probe)
t_steady = time.perf_counter() - t0

print(f"trace+lower {t_lower:.1f}s  compile {t_compile:.1f}s  "
      f"first-run {t_first:.2f}s  steady {t_steady * 1e3:.1f}ms",
      flush=True)
