"""Probe: per-frame cost of the headline train_frame measured two ways —
(a) the bench.py dispatch loop (one jit call per frame, host enqueues
through the axon relay) vs (b) a lax.scan of S frames inside ONE jit
call (the shape the repo's own trainer runs: scanned epochs).

If (b) is materially faster per frame, the dispatch loop is paying a
host/relay enqueue gap that a real TPU training loop never sees, and
bench.py should report the scanned number (with the dispatch number as
a secondary field). Device-trace evidence: profile_frame shows ~92-95 ms
of device time per call vs 102-109 ms wall."""

import time

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()


def main():
  from taichi_gaussian_rasterizer_tpu import (
      RasterConfig, map_to_tiles, probe_emit_tails, project_to_image,
      render_gaussians)
  from taichi_gaussian_rasterizer_tpu.utils import morton
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = 1_000_000
  image_size = (2048, 1536)
  config = RasterConfig(tile_size=16, points_per_chunk=128,
                        saturation_early_exit=False)

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
    g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
    order = morton.argsort(g.position)
    g = jax.tree.map(lambda x: jnp.take(x, order, axis=0), g)
  dev = jax.devices()[0]
  camera = jax.tree.map(
      lambda x: jax.device_put(x, dev) if hasattr(x, "dtype") else x, camera)
  g = jax.device_put(g, dev)

  pts, depth, _ = jax.jit(lambda gg: project_to_image(gg, camera, config))(g)
  with jax.default_device(cpu):
    emit_tails = probe_emit_tails(jax.device_put(pts, cpu), camera.image_size,
                                  config, margin=1.05)
  probe_map = map_to_tiles(pts, depth[:, 0], camera.image_size, config,
                           capacity=16 * n, emit_tails=emit_tails)
  total = int(probe_map.total_overlaps)
  capacity = int((int(total * 1.002) + 1023) // 1024 * 1024)
  print(f"overlaps={total} capacity={capacity}")

  g_image = jax.random.normal(jax.random.PRNGKey(2),
                              (image_size[1], image_size[0], 3), jnp.float32)

  def loss(gg):
    r = render_gaussians(gg, camera, config, capacity=capacity,
                         emit_tails=emit_tails)
    return jnp.vdot(r.image, g_image)

  @jax.jit
  def frame(gg):
    gr = jax.grad(loss)(gg)
    return gr, jnp.sum(gr.position)

  S = 5

  @jax.jit
  def frames_scanned(gg):
    # the body must CHAIN through the carry (a real SGD step): a
    # loop-invariant body gets hoisted by XLA's LICM and the "scan"
    # measures one frame + S adds (measured exactly that: 21 ms = 105/5)
    def body(carry, _):
      gr = jax.grad(loss)(carry)
      new = jax.tree.map(lambda a, b: a - 1e-12 * b, carry, gr)
      return new, None

    out, _ = jax.lax.scan(body, gg, None, length=S)
    return jnp.sum(out.position)

  # warm both
  _, p = frame(g)
  _ = float(p)
  acc = frames_scanned(g)
  _ = float(acc)

  # (a) dispatch loop, 20 frames
  t0 = time.perf_counter()
  for _ in range(20):
    _, p = frame(g)
  _ = float(p)
  ms_loop = (time.perf_counter() - t0) / 20 * 1000.0
  print(f"dispatch loop: {ms_loop:.2f} ms/frame")

  # (b) scanned, 4 calls x S frames
  t0 = time.perf_counter()
  for _ in range(4):
    acc = frames_scanned(g)
  _ = float(acc)
  ms_scan = (time.perf_counter() - t0) / (4 * S) * 1000.0
  print(f"scanned x{S}:   {ms_scan:.2f} ms/frame "
        f"({ms_loop - ms_scan:+.2f} vs loop)")


if __name__ == "__main__":
  main()
