"""Mapper op-level profiling via the device trace. Internal tool.

Earlier versions re-implemented the mapper's stages inline and rotted as
the mapper evolved; this profiles the REAL `map_to_tiles` under
`jax.profiler.trace` and reports per-op device durations, which is also
how the round-2 layout findings (narrow-array lane waste, sort/search
costs) were obtained.
"""

import argparse
import collections
import glob
import gzip
import json
import tempfile
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--n", type=int, default=1_000_000)
  ap.add_argument("--size", type=int, default=2048)
  ap.add_argument("--iters", type=int, default=3)
  ap.add_argument("--top", type=int, default=25)
  ap.add_argument("--cpu", action="store_true")
  ap.add_argument("--depth16", action="store_true")
  args = ap.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  from taichi_gaussian_rasterizer_tpu import (
      RasterConfig, map_to_tiles, probe_emit_tails, project_to_image)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=16, points_per_chunk=128)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
  points, depth, _ = jax.jit(partial(project_to_image, config=config))(
      g, camera)
  emit_tails = probe_emit_tails(points, image_size, config, margin=1.05)

  mapper = jax.jit(partial(map_to_tiles, image_size=image_size,
                           config=config, capacity=4 * n,
                           use_depth16=args.depth16,
                           emit_tails=emit_tails))
  m = mapper(points, depth[:, 0])
  total = float(m.total_overlaps)
  print(f"overlaps={int(total)} emit_tails={emit_tails}")

  t0 = time.perf_counter()
  for _ in range(args.iters):
    m = mapper(points, depth[:, 0])
  _ = float(m.total_overlaps)
  print(f"mapper wall: {(time.perf_counter() - t0) / args.iters * 1e3:.2f}"
        " ms/call (readback-timed)")

  trace_dir = tempfile.mkdtemp(prefix="mapper_trace_")
  with jax.profiler.trace(trace_dir):
    for _ in range(args.iters):
      m = mapper(points, depth[:, 0])
    _ = float(m.total_overlaps)

  files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
  if not files:
    print("no trace captured (backend without profiling support)")
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
  print(f"top {args.top} device ops (ms per call):")
  for name, d in dur.most_common(args.top):
    print(f"  {d / 1e3 / args.iters:8.3f} ms  {name[:80]}")


if __name__ == "__main__":
  main()
