"""Internal mapper stage profiling (prefix timing). Internal tool."""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp


def timeit(fn, *a, iters=5):
  r = fn(*a)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    r = fn(*a)
  _ = float(jax.tree.leaves(r)[0].astype(jnp.float32).ravel()[0])
  return r, (time.perf_counter() - t0) / iters * 1000


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--n", type=int, default=1_000_000)
  ap.add_argument("--size", type=int, default=2048)
  ap.add_argument("--cpu", action="store_true")
  args = ap.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  from taichi_gaussian_rasterizer_tpu import RasterConfig, project_to_image
  from taichi_gaussian_rasterizer_tpu.ops import mapper as M
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_camera, random_3d_gaussians)

  n = args.n
  image_size = (args.size, args.size * 3 // 4)
  config = RasterConfig(tile_size=16, points_per_chunk=128)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n, camera)
  points, depth, _ = jax.jit(partial(project_to_image, config=config))(
      g, camera)
  depth = depth[:, 0]

  tile_size = config.tile_size
  tw, th = M.num_tiles(image_size, tile_size)

  def stage1(points, depth):
    _, span0, _, _, _ = M._footprint(points, image_size, tile_size,
                                     config.alpha_threshold,
                                     config.max_tile_span)
    p0 = (span0[:, 0] * span0[:, 1]).astype(jnp.int32)
    perm = M._partition_by_bucket(p0)
    pts_depth = jnp.concatenate([points, depth[:, None]], axis=1)
    return jnp.take(pts_depth, perm, axis=0), perm

  _, ms = timeit(jax.jit(stage1), points, depth)
  print(f"1 footprint+partition+gather: {ms:.1f} ms")

  def stage2(points, depth):
    pts_depth_s, perm = stage1(points, depth)
    points_s = pts_depth_s[:, :7]
    depth_s = pts_depth_s[:, 7]
    min_tile_s, span_s, inv_basis_s, mean_s, _ = M._footprint(
        points_s, image_size, tile_size, config.alpha_threshold,
        config.max_tile_span)
    p_s = (span_s[:, 0] * span_s[:, 1]).astype(jnp.int32)
    counts_budgeted = jnp.minimum(p_s, M._emittable_budget(n))

    key_parts, pv_parts = [], []
    j_edges = (0,) + M._BUDGETS
    for r in range(M._N_ROUNDS):
      tail = M._tail_size(n, r)
      if tail == 0 or j_edges[r] >= j_edges[r + 1]:
        continue
      lo_q, j_lo, j_hi = n - tail, j_edges[r], j_edges[r + 1]
      idx = jnp.arange(lo_q, n, dtype=jnp.int32)
      j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)
      sx = span_s[idx, 0][:, None]
      jy = jnp.where(sx > 0, j[None, :] // jnp.maximum(sx, 1), 0)
      jx = jnp.where(sx > 0, j[None, :] % jnp.maximum(sx, 1), 0)
      in_span = j[None, :] < counts_budgeted[idx][:, None]
      tx = min_tile_s[idx, 0][:, None] + jx
      ty = min_tile_s[idx, 1][:, None] + jy
      tile_id = (tx + ty * tw).astype(jnp.int32)
      lo_x = (tx * tile_size).astype(points.dtype) - mean_s[idx, 0][:, None]
      lo_y = (ty * tile_size).astype(points.dtype) - mean_s[idx, 1][:, None]
      ib = tuple(inv_basis_s[idx, a, b][:, None]
                 for a in range(2) for b in range(2))
      accept = in_span & M._sat_accept(lo_x, lo_y, ib, tile_size)
      tk = jnp.where(accept, tile_id, M.TILE_SENTINEL)
      pv = jnp.where(accept, jnp.broadcast_to(perm[lo_q:][:, None],
                                              tk.shape), n)
      dk = jnp.broadcast_to(depth_s[lo_q:][:, None], tk.shape)
      key_parts.append((tk.ravel(), dk.ravel()))
      pv_parts.append(pv.ravel())
    return (jnp.concatenate([k[0] for k in key_parts]),
            jnp.concatenate([k[1] for k in key_parts]),
            jnp.concatenate(pv_parts))

  (ct, cd, cp), ms = timeit(jax.jit(stage2), points, depth)
  print(f"2 +emission ({ct.shape[0] / 1e6:.2f}M candidates): {ms:.1f} ms")

  srt = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                             is_stable=True))
  (st, sd, sp), ms = timeit(srt, ct, cd, cp)
  print(f"3 candidate sort alone: {ms:.1f} ms")

  def stage4(st):
    tids = jnp.arange(tw * th, dtype=jnp.int32)
    return (jnp.searchsorted(st, tids, side="left").astype(jnp.int32),
            jnp.searchsorted(st, tids, side="right").astype(jnp.int32))

  (starts, ends), ms = timeit(jax.jit(stage4), st)
  print(f"4 searchsorted ranges: {ms:.1f} ms")

  chunk = config.points_per_chunk
  k_cap = int(M.round_up(3 * n, chunk))

  def stage5(sp):
    # mirrors mapper.py's overlap-list truncation (no relayout since r2)
    if sp.shape[0] >= k_cap:
      return sp[:k_cap]
    return jnp.concatenate([sp, jnp.full((k_cap - sp.shape[0],), n,
                                         jnp.int32)])

  otp, ms = timeit(jax.jit(stage5), sp)
  print(f"5 truncate to capacity (k_cap={k_cap / 1e6:.2f}M): {ms:.1f} ms")


if __name__ == "__main__":
  main()
