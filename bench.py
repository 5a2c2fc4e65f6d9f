"""Headline benchmark: full forward+backward render (projection, SH-free
RGB, tile mapping, Pallas rasterize, gradients for all gaussian
parameters) of Morton-ordered synthetic scenes on one TPU chip.

Scene bracket mirrors the reference's published protocol
(/root/reference/BENCHMARK.md): the headline row is 1M gaussians
@2048x1536 (fwd+bwd geometric mean over 13 real scenes = 90.63 it/s =
11.03 ms/frame, RTX 4090, taichi-splatting(16)); sweep rows cover
1024/4096 and tile_size 32 (same table), plus 3M/6M scenes spanning the
reference's per-scene point counts (bicycle ~6M).

Two occupancy regimes, reported separately:

* "light": the default random_3d_gaussians scene (~2.6 overlaps/point,
  never saturates a tile) — benched with saturation_early_exit=False,
  the correct setting for never-saturating scenes (the forward's skip
  branch is pure Mosaic pipeline-stall cost there; PERF.md round-3c).
* "heavy": scale_factor/alpha mirroring the reference's own rasterizer
  benchmark recipe (bench_rasterizer.py:49-50: scale_factor=4,
  alpha 0.75-1.0 — large, opaque, saturating splats like trained 3DGS
  checkpoints) — benched with saturation_early_exit=True (the default,
  required for correctness of the early-exit claim on saturating
  scenes). Overlap ratio and saturated-pixel fraction are printed so
  the regime is auditable.

Scenes are Morton-ordered before rendering, as real 3DGS checkpoints
are after io.load_gaussians_ply (morton_order=True).

Output protocol (driver-robust): the HEADLINE row runs FIRST, and the
full cumulative JSON result line is re-printed (flushed) to stdout
after EVERY completed row — so a driver timeout mid-sweep still
captures the headline plus every row that finished. Rows are ordered
by importance and each is skipped when the elapsed wall-clock exceeds
its start deadline (cold-cache compiles are 1-2 min/row; the
persistent cache makes warm runs compile in seconds).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()  # persistent compile cache: later runs compile in seconds

# taichi-splatting(16) fwd+bwd geometric means, RTX 4090
# (/root/reference/benchmarks/benchmark-4090.csv, backward=True rows)
BASELINE_MS = {
    "1M_2048": 1000.0 / 90.63,    # 11.03 ms/frame (headline)
    "1M_1024": 1000.0 / 106.43,   # 9.40
    "1M_4096": 1000.0 / 47.34,    # 21.12
    "1M_2048_t32": 1000.0 / 79.69,  # 12.55 (taichi-splatting(32) row)
    "1M_2048_fwd": 1000.0 / 218.35,  # 4.58 (forward-only row, csv:12)
}

T_START = time.perf_counter()


def elapsed():
  return time.perf_counter() - T_START


def make_scene(n, image_size, scale_factor=1.0, alpha_range=(0.1, 0.9),
               proxy=False):
  """Build a Morton-ordered bench scene ON HOST CPU (eager ops through
  the axon relay cost ~300 ms each; host generation + one device_put
  saves ~50 s/row) and transfer it to the default device once.
  proxy=True builds the trained-checkpoint occupancy proxy
  (trained_like_gaussians) instead of the uniform test scene."""
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians, trained_like_gaussians)

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
    if proxy:
      gaussians = trained_like_gaussians(jax.random.PRNGKey(1), n, camera)
    else:
      gaussians = random_3d_gaussians(jax.random.PRNGKey(1), n, camera,
                                      scale_factor=scale_factor,
                                      alpha_range=alpha_range)
    # Morton-order, as io.load_gaussians_ply does for real scenes
    order = morton.argsort(gaussians.position)
    gaussians = jax.tree.map(lambda x: jnp.take(x, order, axis=0),
                             gaussians)
  dev = jax.devices()[0]
  camera = jax.tree.map(
      lambda x: jax.device_put(x, dev) if hasattr(x, "dtype") else x,
      camera)
  return jax.device_put(gaussians, dev), camera


def bench_scene(n, image_size, config, iters=20, training=False,
                scale_factor=1.0, alpha_range=(0.1, 0.9), label="",
                scene=None, forward_only=False):
  """One fwd+bwd scene row. training=True benches the trainer's actual
  frame (BASELINE.json configs #4/#5): compute_visibility +
  compute_point_heuristic on, the heuristic sink differentiated
  alongside the gaussians. scene: optional prebuilt (gaussians, camera)
  — the ms_real_scene row passes its PLY-round-tripped checkpoint."""
  from taichi_gaussian_rasterizer_tpu import (
      map_to_tiles, probe_emit_tails, probe_visit_chunks,
      project_to_image, render_gaussians)

  if scene is None:
    gaussians, camera = make_scene(n, image_size,
                                   scale_factor=scale_factor,
                                   alpha_range=alpha_range)
  else:
    gaussians, camera = scene

  # adaptive capacity: probe the true overlap count once, then re-jit
  # with a snug static capacity (the documented resize-on-overflow flow)
  pts, depth, _ = jax.jit(
      lambda g: project_to_image(g, camera, config))(gaussians)
  # margin 1.05: the probe measured THIS scene's exact per-round needs
  # and the benched frame never changes, so (like the snug capacity
  # below) the margin only covers quantum rounding. The reference sizes
  # its overlap buffers exactly per frame (full_cumsum host total,
  # tile_mapper.py:163), so snug static sizing is protocol parity, not
  # a bench-only cheat. Training flows with drifting footprints keep
  # the 1.5 default. (Footprint math on host: eager relay ops are slow.)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    emit_tails = probe_emit_tails(jax.device_put(pts, cpu),
                                  camera.image_size, config, margin=1.05)
  probe_cap = 16 * n
  for _ in range(3):
    probe_map = map_to_tiles(pts, depth[:, 0], camera.image_size, config,
                             capacity=probe_cap, emit_tails=emit_tails)
    # Loop on CAPACITY overflow only (total_overlaps counts accepted
    # candidates before the capacity crop). The combined overflow flag
    # also covers the max_tile_span footprint clip, which no capacity
    # doubling can clear — dense scenes (the trained-checkpoint proxy)
    # clip a few giant splats and used to burn 2 extra ~60 s probe
    # compiles here for nothing.
    if int(probe_map.total_overlaps) <= probe_cap:
      break
    probe_cap *= 2
  total = int(probe_map.total_overlaps)
  # 0.2% headroom: the probe measured THIS scene's exact total, so the
  # margin only covers slot alignment; every K-sized op (gather, both
  # sorts, segment-sum, kernels) scales with this capacity (measured
  # r4: 1.0625x -> 1.002x = 109.3 -> 107.75 ms). Training flows with
  # drifting totals should size their own margin (overflow recompile is
  # the documented path).
  capacity = int((int(total * 1.002) + 1023) // 1024 * 1024)
  print(f"[{label}] n={n}: overlaps={total} ({total / n:.2f}/pt) "
        f"-> capacity={capacity} emit_tails={emit_tails}", file=sys.stderr)
  if scene is not None:
    # occupancy audit for the real-scene proxy row (the reference prints
    # the same statistics: bench_tilemapper.py:58-61)
    import numpy as np
    ppt = np.asarray(probe_map.tile_ranges[:, 1]
                     - probe_map.tile_ranges[:, 0])
    pct = np.percentile(ppt, [10, 50, 90, 99]).astype(int)
    print(f"[{label}] point_overlap={total / n:.2f} "
          f"tile_points mean={ppt.mean():.1f} "
          f"p10/p50/p90/p99={pct.tolist()} max={ppt.max()}",
          file=sys.stderr)

  # saturating scenes: truncate the candidate stream to each tile's
  # pre-saturation front (probe + re-jit, like capacity) — the combined
  # gather, kernels, and gradient reduction all run at the visited-front
  # size; Rendering.raster_overflow (asserted below) guards exactness
  visit_chunks, visit_capacity = None, None
  if config.saturation_early_exit:
    # re-map at the snug capacity first: the 16n probe map may have
    # cropped (overflowed) on very dense scenes, and saturation depths
    # measured on a cropped stream would silently truncate real content
    snug_map = map_to_tiles(pts, depth[:, 0], camera.image_size, config,
                            capacity=capacity, emit_tails=emit_tails)
    visit_chunks, visit_capacity = probe_visit_chunks(
        pts, snug_map, config, margin_chunks=0)
    visit_capacity = min(visit_capacity, capacity)
    print(f"[{label}] visit_capacity={visit_capacity} "
          f"({visit_capacity / capacity:.2f} of K)", file=sys.stderr)

  if training:
    config = config.replace(compute_point_heuristic=True)

  @jax.jit
  def train_frame(gaussians, g_image):
    if forward_only:
      # the reference's forward-only protocol row (benchmark-4090.csv:12):
      # one full render, no gradients
      r = render_gaussians(gaussians, camera, config, capacity=capacity,
                           emit_tails=emit_tails, visit_chunks=visit_chunks,
                           visit_capacity=visit_capacity)
      return r.image, jnp.sum(r.image)
    if training:
      sink = jnp.zeros((n, 2), jnp.float32)
      vsink = jnp.zeros((n,), jnp.float32)

      def loss(g, s, vs):
        # visibility via sink: rides the backward's gradient reduction
        r = render_gaussians(g, camera, config, capacity=capacity,
                             emit_tails=emit_tails, heuristic_sink=s,
                             visibility_sink=vs, visit_chunks=visit_chunks,
                             visit_capacity=visit_capacity)
        return jnp.vdot(r.image, g_image)

      g, heur, vis = jax.grad(loss, argnums=(0, 1, 2))(
          gaussians, sink, vsink)
      return g, jnp.sum(g.position) + jnp.sum(heur) + jnp.sum(vis)

    def loss(g):
      r = render_gaussians(g, camera, config, capacity=capacity,
                           emit_tails=emit_tails, visit_chunks=visit_chunks,
                           visit_capacity=visit_capacity)
      return jnp.vdot(r.image, g_image)

    g = jax.grad(loss)(gaussians)
    # scalar probe so host readback forces completion of the whole frame
    return g, jnp.sum(g.position)

  g_image = jax.random.normal(
      jax.random.PRNGKey(2), (image_size[1], image_size[0], 3), jnp.float32)

  # saturation statistics: auditable occupancy regime. The forward-only
  # render costs a separate ~50 s cold compile, so it runs only where
  # the result matters — early-exit rows, whose truncated frame must be
  # validated against it anyway. Light rows report -1 (historical audit:
  # 0.000-0.013 across the r4 sweep; they never saturate by design).
  sat_frac = -1.0
  if config.saturation_early_exit:
    r = jax.jit(lambda g: render_gaussians(
        g, camera, config, capacity=capacity,
        emit_tails=emit_tails))(gaussians)
    sat_frac = float(jnp.mean(
        (r.image_weight >= config.saturate_threshold).astype(jnp.float32)))
  if visit_chunks is not None:
    # the truncated render must be exact (every truncated tile saturates
    # within its kept front) AND match the untruncated image bit-for-bit
    rt = jax.jit(lambda g: render_gaussians(
        g, camera, config, capacity=capacity, emit_tails=emit_tails,
        visit_chunks=visit_chunks, visit_capacity=visit_capacity))(gaussians)
    assert not bool(rt.raster_overflow), "saturation-front truncation cropped"
    assert bool(jnp.array_equal(r.image, rt.image)), (
        "truncated render diverged from the full render")

  # compile + warmup; validate the run while we're at it
  t0 = time.perf_counter()
  grads, probe = train_frame(gaussians, g_image)
  compile_s = time.perf_counter() - t0
  assert bool(jnp.isfinite(probe)), "non-finite gradient probe"
  # attribute the overflow flag: capacity overflow would be a sizing bug
  # (the probe loop above prevents it); a remaining True means the
  # max_tile_span footprint clip fired (giant splats' far tiles dropped
  # — the documented quality knob, config.py), which dense trained-like
  # scenes hit on their log-normal scale tail
  overflow = bool(probe_map.overflow)
  clip = "footprint_clip" if overflow and total <= probe_cap else str(overflow)
  print(f"[{label}] compile {compile_s:.1f}s probe={float(probe):.4g} "
        f"overflow={clip} saturated_px={sat_frac:.3f}", file=sys.stderr)

  t0 = time.perf_counter()
  for _ in range(iters):
    _, probe = train_frame(gaussians, g_image)
  _ = float(probe)  # device->host readback: waits for true completion
  return (time.perf_counter() - t0) / iters * 1000.0, compile_s


def real_scene(n, image_size):
  """Trained-checkpoint proxy through the real IO path: synthesize the
  occupancy proxy (trained_like_gaussians — no network, so the published
  trained-scene occupancy shape is synthesized rather than downloaded),
  round-trip it through a standard 3DGS binary .ply on disk
  (save_gaussians_ply -> load_gaussians_ply with Morton reordering, the
  exact flow a user loads a pretrained checkpoint with), and return the
  (gaussians, camera) scene for bench_scene."""
  import os
  import tempfile

  from taichi_gaussian_rasterizer_tpu.data_types import Gaussians3D
  from taichi_gaussian_rasterizer_tpu.io import (load_gaussians_ply,
                                                 save_gaussians_ply)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, trained_like_gaussians)

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
    g = trained_like_gaussians(jax.random.PRNGKey(1), n, camera)
  path = os.path.join(tempfile.mkdtemp(prefix="tgr_bench_"), "proxy.ply")
  save_gaussians_ply(path, g)
  loaded = load_gaussians_ply(path, morton_order=True)
  # deg-0 checkpoint: flatten the single DC band back to plain RGB so
  # the row is feature-comparable with the rest of the sweep
  g2 = Gaussians3D(position=loaded.position,
                   log_scaling=loaded.log_scaling,
                   rotation=loaded.rotation,
                   alpha_logit=loaded.alpha_logit,
                   feature=loaded.feature[:, :, 0])
  dev = jax.devices()[0]
  camera = jax.tree.map(
      lambda x: jax.device_put(x, dev) if hasattr(x, "dtype") else x,
      camera)
  return jax.device_put(g2, dev), camera


def main():
  from taichi_gaussian_rasterizer_tpu import RasterConfig

  image_size = (2048, 1536)
  # light regime: saturation_early_exit off — these synthetic scenes
  # never saturate a tile (verified: zero skipped chunk-iterations;
  # saturated_px printed per row), so the forward's skip branch is pure
  # Mosaic pipeline-stall cost (~5.8 ms/frame — PERF.md round-3c).
  light = RasterConfig(tile_size=16, points_per_chunk=128,
                       saturation_early_exit=False)
  # heavy regime: the reference's own rasterizer-benchmark scene recipe
  # (large opaque splats); early exit ON (the default) as any real
  # opaque scene must run.
  heavy = RasterConfig(tile_size=16, points_per_chunk=128)
  heavy_scene = dict(scale_factor=4.0, alpha_range=(0.75, 0.99))

  out = {
      "metric": "fwd_bwd_ms_per_frame_2048px_1M_gaussians",
      "value": None,
      "unit": "ms/frame",
      "vs_baseline": None,
  }

  def emit():
    # cumulative result line after every row: a driver timeout later in
    # the sweep still captures everything finished so far (the driver
    # parses the LAST valid JSON line on stdout)
    print(json.dumps(out), flush=True)

  # ---- one-time Mosaic/backend warmup (measured 40-260 s on a cold
  # relay; paying it on a throwaway kernel keeps it out of every row's
  # compile budget and deadline) ----
  t0 = time.perf_counter()
  from jax.experimental import pallas as pl

  def _warm(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0

  y = jax.jit(lambda x: pl.pallas_call(
      _warm, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x))(
          jnp.ones((8, 128), jnp.float32))
  _ = float(y[0, 0])
  out["warmup_s"] = round(time.perf_counter() - t0, 1)
  print(f"[warmup] pallas backend setup {out['warmup_s']}s",
        file=sys.stderr)
  # Row deadlines are calibrated for a WARM relay; the one-time backend
  # setup above has measured anywhere from 40 s to 674 s depending on
  # relay state, which is outside the rows' control. Start the deadline
  # clock after it so a slow warmup skips no rows (a driver timeout
  # mid-sweep stays lossless via the incremental emit()).
  global T_START
  T_START = time.perf_counter()

  # ---- headline row FIRST (the number the round is judged on) ----
  try:
    ms, compile_s = bench_scene(1_000_000, image_size, light, iters=20,
                                label="headline")
    out["value"] = round(ms, 3)
    out["vs_baseline"] = round(BASELINE_MS["1M_2048"] / ms, 4)
    out["compile_s"] = round(compile_s, 1)
    print(f"[headline] {ms:.2f} ms/frame", file=sys.stderr)
  except Exception as e:
    print(f"[headline] FAILED: {type(e).__name__}: {e}", file=sys.stderr)
  emit()

  # TGR_BENCH_DEADLINE_SCALE relaxes the row deadlines (e.g. =3 for the
  # end-of-round cache-warming run, which must compile EVERY row so the
  # driver's capture hits a fully warm cache; the driver itself runs at
  # the default 1.0 budget).
  deadline_scale = float(os.environ.get("TGR_BENCH_DEADLINE_SCALE", "1"))

  def row(key, deadline_s, *args, **kwargs):
    # deadline: don't START a row once the sweep has been running this
    # long — a cold-cache compile is 1-2 min/row and the driver's total
    # budget is finite; rows are ordered so the cheap, baseline-matched
    # ones come first.
    deadline_s = deadline_s * deadline_scale
    if elapsed() > deadline_s:
      print(f"[{key}] SKIPPED (elapsed {elapsed():.0f}s > {deadline_s}s "
            "deadline)", file=sys.stderr)
      return
    try:
      ms, _ = bench_scene(*args, label=key, **kwargs)
      print(f"[{key}] {ms:.2f} ms/frame", file=sys.stderr)
      out[key] = round(ms, 3)
      base = {"ms_1024": "1M_1024", "ms_4096": "1M_4096",
              "ms_2048_t32": "1M_2048_t32",
              "ms_fwd_only": "1M_2048_fwd"}.get(key)
      if base:
        out[f"vs_baseline_{key[3:]}"] = round(BASELINE_MS[base] / ms, 4)
    except Exception as e:  # report partial results rather than dying
      print(f"[{key}] FAILED: {type(e).__name__}: {e}", file=sys.stderr)
      out[key] = None
    emit()

  # importance order; deadlines assume a ~20 min driver budget with
  # ~1-2 min/row cold-cache compiles (warm-cache rows run in ~30-60 s;
  # the end-of-round ritual runs bench.py once after the final commit so
  # the driver's run hits a warm cache)
  try:
    proxy_scene = real_scene(1_000_000, image_size)
  except Exception as e:
    proxy_scene = None
    print(f"[ms_real_scene] scene build FAILED: {e}", file=sys.stderr)
  # measured row costs (r5 session sweep, ~55-60 s/executable compile —
  # the relay recompiles every process; see PERF.md "compile-time
  # anatomy"): headline ~5 min, real_scene ~7 (five 11.7M-slot-config
  # compiles + probes), heavy ~5, training ~3, 3m ~3.5. Deadlines are
  # cumulative start gates; the incremental emit() above makes a driver
  # timeout mid-row lossless.
  if proxy_scene is not None:
    row("ms_real_scene", 420, 1_000_000, image_size, heavy, iters=10,
        scene=proxy_scene)
  row("ms_heavy", 780, 1_000_000, image_size, heavy, iters=10,
      **heavy_scene)
  row("training_mode_ms", 1020, 1_000_000, image_size, light, iters=10,
      training=True)
  row("ms_fwd_only", 1100, 1_000_000, image_size, light, iters=20,
      forward_only=True)
  row("ms_3m", 1260, 3_000_000, image_size, light, iters=10)
  row("ms_heavy_training", 1380, 1_000_000, image_size, heavy, iters=10,
      training=True, **heavy_scene)
  row("ms_1024", 1500, 1_000_000, (1024, 768), light, iters=20)
  row("ms_4096", 1620, 1_000_000, (4096, 3072), light, iters=5)
  row("ms_2048_t32", 1740, 1_000_000, image_size,
      light.replace(tile_size=32), iters=10)
  row("ms_antialias", 1860, 1_000_000, image_size,
      light.replace(antialias=True), iters=10)
  row("ms_6m", 1980, 6_000_000, image_size, light, iters=5)


if __name__ == "__main__":
  main()
