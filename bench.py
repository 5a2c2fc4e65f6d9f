"""Headline benchmark: full forward+backward render of Morton-ordered
synthetic scenes (1M and 3M gaussians, the BASELINE.md scene bracket) at
2048x1536 on one TPU chip, end to end: projection, SH-free RGB, tile
mapping, Pallas rasterize, gradients w.r.t. all gaussian parameters.

Scenes are Morton-ordered before rendering, as real 3DGS checkpoints are
after io.load_gaussians_ply (morton_order=True) — this is the layout the
windowed-locality optimizations target and what users actually run.

Baseline: taichi-splatting fwd+bwd @2048 geometric mean = 90.63 it/s
(11.03 ms/frame) on an RTX 4090 (BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} for the
1M scene; the 3M result goes to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()  # persistent compile cache: later runs compile in seconds

BASELINE_MS = 1000.0 / 90.63  # 11.03 ms/frame (fwd+bwd @2048, RTX 4090)


def bench_scene(n, image_size, config, iters=20, training=False):
  """training=True benches the trainer's actual frame (BASELINE.json
  configs #4/#5): compute_visibility + compute_point_heuristic on, the
  heuristic sink differentiated alongside the gaussians."""
  from taichi_gaussian_rasterizer_tpu import (
      map_to_tiles, probe_emit_tails, project_to_image, render_gaussians)
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  gaussians = random_3d_gaussians(jax.random.PRNGKey(1), n, camera,
                                  scale_factor=1.0)
  # Morton-order, as io.load_gaussians_ply does for real scenes
  order = morton.argsort(gaussians.position)
  gaussians = jax.tree.map(lambda x: jnp.take(x, order, axis=0), gaussians)

  # adaptive capacity: probe the true overlap count once, then re-jit
  # with a snug static capacity (the documented resize-on-overflow flow)
  pts, depth, _ = jax.jit(
      lambda g: project_to_image(g, camera, config))(gaussians)
  emit_tails = probe_emit_tails(pts, camera.image_size, config)
  probe_map = map_to_tiles(pts, depth[:, 0], camera.image_size, config,
                           capacity=6 * n, emit_tails=emit_tails)
  total = int(probe_map.total_overlaps)
  # 6.25% headroom: the probe measured THIS scene's exact total, so the
  # margin only covers slot alignment; every K-sized op (gather, both
  # sorts, segment-sum, kernels) scales with this capacity. Training
  # flows with drifting totals should size their own margin (overflow
  # recompile is the documented path).
  capacity = int((int(total * 1.0625) + 1023) // 1024 * 1024)
  print(f"n={n}: overlaps={total} -> capacity={capacity} "
        f"emit_tails={emit_tails}", file=sys.stderr)

  if training:
    config = config.replace(compute_point_heuristic=True)

  @jax.jit
  def train_frame(gaussians, g_image):
    if training:
      sink = jnp.zeros((n, 2), jnp.float32)
      vsink = jnp.zeros((n,), jnp.float32)

      def loss(g, s, vs):
        # visibility via sink: rides the backward's gradient reduction
        r = render_gaussians(g, camera, config, capacity=capacity,
                             emit_tails=emit_tails, heuristic_sink=s,
                             visibility_sink=vs)
        return jnp.vdot(r.image, g_image)

      g, heur, vis = jax.grad(loss, argnums=(0, 1, 2))(
          gaussians, sink, vsink)
      return g, jnp.sum(g.position) + jnp.sum(heur) + jnp.sum(vis)

    def loss(g):
      r = render_gaussians(g, camera, config, capacity=capacity,
                           emit_tails=emit_tails)
      return jnp.vdot(r.image, g_image)

    g = jax.grad(loss)(gaussians)
    # scalar probe so host readback forces completion of the whole frame
    return g, jnp.sum(g.position)

  g_image = jax.random.normal(
      jax.random.PRNGKey(2), (image_size[1], image_size[0], 3), jnp.float32)

  # compile + warmup; validate the run while we're at it
  t0 = time.perf_counter()
  grads, probe = train_frame(gaussians, g_image)
  compile_s = time.perf_counter() - t0
  assert bool(jnp.isfinite(probe)), "non-finite gradient probe"
  overflow = bool(probe_map.overflow)
  print(f"n={n}: compile {compile_s:.1f}s "
        f"probe={float(probe):.4g} overflow={overflow}", file=sys.stderr)

  t0 = time.perf_counter()
  for _ in range(iters):
    _, probe = train_frame(gaussians, g_image)
  _ = float(probe)  # device->host readback: waits for true completion
  return (time.perf_counter() - t0) / iters * 1000.0, compile_s


def main():
  from taichi_gaussian_rasterizer_tpu import RasterConfig

  image_size = (2048, 1536)
  # saturation_early_exit off: the synthetic scenes never saturate a
  # tile (verified: zero skipped chunk-iterations), so the forward's
  # skip branch is pure Mosaic pipeline-stall cost (~5.8 ms/frame —
  # PERF.md round-3c). Real opaque scenes should keep the default True;
  # the probe flow (render once, inspect image_weight) tells a user
  # which regime they are in.
  config = RasterConfig(tile_size=16, points_per_chunk=128,
                        saturation_early_exit=False)

  ms_6m, _ = bench_scene(6_000_000, image_size, config, iters=5)
  print(f"6M gaussians: {ms_6m:.2f} ms/frame "
        f"(baseline: bicycle ~6M at 17.1 ms, RTX 4090)", file=sys.stderr)

  ms_3m, _ = bench_scene(3_000_000, image_size, config, iters=10)
  print(f"3M gaussians: {ms_3m:.2f} ms/frame", file=sys.stderr)

  ms_tr, _ = bench_scene(1_000_000, image_size, config, iters=10,
                         training=True)
  print(f"1M training mode (visibility + heuristics): {ms_tr:.2f} ms/frame",
        file=sys.stderr)

  ms, compile_s = bench_scene(1_000_000, image_size, config, iters=20)
  print(json.dumps({
      "metric": "fwd_bwd_ms_per_frame_2048px_1M_gaussians",
      "value": round(ms, 3),
      "unit": "ms/frame",
      "vs_baseline": round(BASELINE_MS / ms, 4),
      "compile_s": round(compile_s, 1),
      "training_mode_ms": round(ms_tr, 3),
      "ms_3m": round(ms_3m, 3),
      "ms_6m": round(ms_6m, 3),
  }))


if __name__ == "__main__":
  main()
