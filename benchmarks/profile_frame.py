"""Whole-frame device-trace profiling: the bench.py train_frame under
jax.profiler.trace, aggregated per device op. Internal tool."""

import argparse
import collections
import glob
import gzip
import json
import tempfile
import time

import jax
import jax.numpy as jnp


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--n", type=int, default=1_000_000)
  ap.add_argument("--size", type=int, default=2048)
  ap.add_argument("--iters", type=int, default=3)
  ap.add_argument("--top", type=int, default=40)
  ap.add_argument("--depth16", action="store_true")
  ap.add_argument("--training", action="store_true",
                  help="visibility + heuristic sink (config #4/#5 mode)")
  ap.add_argument("--heavy", action="store_true",
                  help="bench.py heavy regime: reference rasterizer-bench "
                       "scene (scale_factor=4, alpha 0.75-0.99), "
                       "saturation_early_exit=True")
  args = ap.parse_args()

  from taichi_gaussian_rasterizer_tpu import (
      RasterConfig, map_to_tiles, probe_emit_tails, probe_visit_chunks,
      project_to_image, render_gaussians)
  from taichi_gaussian_rasterizer_tpu.models.renderer import (
      render_with_heuristics)
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=16, points_per_chunk=128,
                        compute_visibility=args.training,
                        compute_point_heuristic=args.training,
                        saturation_early_exit=args.heavy)  # bench.py configs
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  scene = (dict(scale_factor=4.0, alpha_range=(0.75, 0.99))
           if args.heavy else {})
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera, **scene)
  order = morton.argsort(g.position)
  g = jax.tree.map(lambda x: jnp.take(x, order, axis=0), g)

  pts, depth, _ = jax.jit(
      lambda gg: project_to_image(gg, camera, config))(g)
  emit_tails = probe_emit_tails(pts, image_size, config, margin=1.05)
  probe_map = map_to_tiles(pts, depth[:, 0], image_size, config,
                           capacity=16 * n, emit_tails=emit_tails)
  total = int(probe_map.total_overlaps)
  capacity = int((int(total * 1.002) + 1023) // 1024 * 1024)
  visit_chunks, visit_capacity = None, None
  if config.saturation_early_exit:
    # the saturation-front truncation flow, exactly as bench.py runs it
    snug_map = map_to_tiles(pts, depth[:, 0], image_size, config,
                            capacity=capacity, emit_tails=emit_tails)
    visit_chunks, visit_capacity = probe_visit_chunks(
        pts, snug_map, config, margin_chunks=0)
    visit_capacity = min(visit_capacity, capacity)
  print(f"overlaps={total} capacity={capacity} "
        f"visit_capacity={visit_capacity}")

  @jax.jit
  def train_frame(gaussians, g_image):
    def loss(gg):
      r = render_gaussians(gg, camera, config, capacity=capacity,
                           emit_tails=emit_tails,
                           use_depth16=args.depth16,
                           visit_chunks=visit_chunks,
                           visit_capacity=visit_capacity)
      return jnp.vdot(r.image, g_image)

    grads = jax.grad(loss)(gaussians)
    return grads, jnp.sum(grads.position)

  g_image = jax.random.normal(
      jax.random.PRNGKey(2), (image_size[1], image_size[0], 3), jnp.float32)
  _, probe = train_frame(g, g_image)
  assert bool(jnp.isfinite(probe))

  t0 = time.perf_counter()
  for _ in range(args.iters):
    _, probe = train_frame(g, g_image)
  _ = float(probe)
  print(f"frame wall: {(time.perf_counter() - t0) / args.iters * 1e3:.2f}"
        " ms (readback-timed)")

  trace_dir = tempfile.mkdtemp(prefix="frame_trace_")
  with jax.profiler.trace(trace_dir):
    for _ in range(args.iters):
      _, probe = train_frame(g, g_image)
    _ = float(probe)

  files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
  if not files:
    print("no trace captured")
    return
  with gzip.open(files[-1]) as fh:
    data = json.load(fh)
  events = data.get("traceEvents", [])
  pids = {e["pid"]: e["args"].get("name", "") for e in events
          if e.get("ph") == "M" and e.get("name") == "process_name"}
  dur = collections.Counter()
  for e in events:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
      dur[e["name"]] += e["dur"]
  total_ms = sum(dur.values()) / 1e3 / args.iters
  print(f"device total: {total_ms:.2f} ms/call")
  print(f"top {args.top} device ops (ms per call):")
  for name, d in dur.most_common(args.top):
    print(f"  {d / 1e3 / args.iters:8.3f} ms  {name[:100]}")


if __name__ == "__main__":
  main()
