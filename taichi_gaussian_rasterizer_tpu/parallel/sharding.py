"""Multi-chip execution via jax.sharding + shard_map.

The reference is strictly single-GPU/single-process (SURVEY.md §2.10): it
has no DP/TP/PP/SP/EP and no communication backend. On TPU, scaling
comes for free from the mesh abstractions; this module provides the
three axes that make sense for a splatting workload:

* **Camera data parallelism** (`dp_train_step`): a batch of cameras is
  sharded over the `data` mesh axis; gaussian parameters are replicated;
  each device renders its local cameras (full fwd+bwd through the Pallas
  kernels) and gradients are `psum`-reduced over ICI before a replicated
  optimizer step. This is the standard multi-view 3DGS training layout.
* **Tile parallelism** (`tp_rasterize`): ONE frame sharded across the
  mesh — the image is split into horizontal tile-aligned stripes, each
  device bins + rasterizes its stripe in a stripe-local coordinate
  frame (the full mapper + Pallas pipeline per shard), and the image
  comes back row-sharded with zero collectives in the forward; the
  backward psums per-point gradients over ICI (shard_map's transpose of
  the replicated inputs). This is how a single frame scales past one
  chip's FLOPs.
* **Point parallelism** (`pp_project`): projection + SH shading sharded
  over the gaussian axis (the per-point stages are embarrassingly
  parallel); results are all-gathered for rasterization. Useful when N
  is large enough that per-point math dominates.

Collectives are expressed through shard_map (`psum`) and sharding
constraints (`all_gather` inserted by XLA) — no explicit NCCL-style code.
"""

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RasterConfig
from ..data_types import Gaussians3D
from ..models.renderer import render_gaussians
from ..ops import lib
from ..ops.projection import CameraParams, project_points
from ..ops.sh import evaluate_sh_at
from ..optim import ParameterClass


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
  devices = jax.devices()
  if n_devices is not None:
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}")
    devices = devices[:n_devices]
  import numpy as np
  return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
  return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_leading(tree, mesh: Mesh, axis_name: str = "data"):
  return jax.device_put(tree, NamedSharding(mesh, P(axis_name)))


# ---------------------------------------------------------------------------
# camera data parallelism
# ---------------------------------------------------------------------------


def dp_train_step(mesh: Mesh,
                  config: RasterConfig,
                  image_size: Tuple[int, int],
                  local_batch: int = 1,
                  use_sh: bool = False,
                  depth_range: Tuple[float, float] = (0.1, 1000.0),
                  axis_name: str = "data"):
  """Build a jitted data-parallel 3D training step.

  The returned function has signature
    step(params: ParameterClass, projections (B, 4), t_camera_worlds
         (B, 4, 4), targets (B, H, W, 3)) -> (params, loss)
  with B = mesh size * local_batch; cameras/targets sharded over
  `axis_name`, parameters replicated, gradients psum-averaged.
  `depth_range` is the cameras' (near, far) clip range.
  """
  near, far = depth_range

  def local_loss(tensors: Dict[str, jax.Array], projection, t_cam, target):
    g = Gaussians3D(**tensors)
    cam = CameraParams(projection=projection, T_camera_world=t_cam,
                       near_plane=near, far_plane=far,
                       image_size=image_size)
    r = render_gaussians(g, cam, config, use_sh=use_sh)
    return jnp.mean((r.image - target) ** 2), r

  def device_fn(params: ParameterClass, projections, t_cams, targets):
    # one full fwd+bwd per local camera. Pallas kernels don't vmap, but
    # they scan fine: lax.scan keeps compile time and code size constant
    # in local_batch (the round-3 unroll grew both linearly).
    keys = ("position", "log_scaling", "rotation", "alpha_logit", "feature")

    def total_loss(tensors):
      n = params.num_points

      def body(carry, cam):
        loss_acc, vis_acc = carry
        proj, t_cam, target = cam
        l, r = local_loss(tensors, proj, t_cam, target)
        v = r.point_visibility
        vis_acc = vis_acc + (v if v is not None else 0.0)
        return (loss_acc + l, vis_acc), None

      (loss_sum, vis), _ = jax.lax.scan(
          body, (jnp.zeros((), targets.dtype), jnp.zeros((n,), targets.dtype)),
          (projections, t_cams, targets))
      if not (config.compute_visibility or config.compute_point_heuristic):
        vis = None
      return loss_sum / local_batch, vis

    tensors = {k: params.tensors[k] for k in keys}
    (loss, vis), grads = jax.value_and_grad(total_loss, has_aux=True)(tensors)

    # average across the mesh (ICI collective)
    grads = jax.lax.pmean(grads, axis_name)
    loss = jax.lax.pmean(loss, axis_name)
    if vis is not None:
      vis = jax.lax.psum(vis, axis_name)
      params = params.step(grads, visibility=vis)
    else:
      n = params.num_points
      params = params.step(grads, weight=jnp.ones((n,), jnp.float32))
    return params, loss

  sharded = jax.shard_map(
      device_fn, mesh=mesh,
      in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
      out_specs=(P(), P()),
      check_vma=False)

  return jax.jit(sharded)


# ---------------------------------------------------------------------------
# tile parallelism (one frame sharded into image stripes over the mesh)
# ---------------------------------------------------------------------------


def stripe_select(points: jax.Array, y0, stripe_h, local_points: int,
                  alpha_threshold: float):
  """Indices of the (at most local_points) gaussians whose footprint can
  touch the stripe [y0, y0 + stripe_h) — the per-device mapper then only
  emits candidates for its own stripe's gaussians instead of replicating
  the full N-sized emission on every device.

  The y-extent test is the same conservative ellipse-AABB bound the
  mapper's footprint uses (ops/mapper._footprint), so selection never
  drops a gaussian the stripe's mapper would have accepted. stripe_h may
  be traced (balanced stripes have per-device heights). Returns
  (sel (local_points,) int32 indices — padded with indices of
  non-relevant points, which the stripe mapper SAT-culls — and
  n_dropped: the count of relevant gaussians beyond local_points, i.e.
  how many the stripe silently lost; 0 means complete)."""
  n = points.shape[0]
  my = points[:, 1]
  ax, ay = points[:, 2], points[:, 3]
  sx, sy = points[:, 4], points[:, 5]
  alpha = points[:, 6]
  valid = alpha > alpha_threshold
  gs = lib.gaussian_scale_factor(alpha, alpha_threshold)
  r0 = jnp.maximum(sx * gs, 1e-12)
  r1 = jnp.maximum(sy * gs, 1e-12)
  ext_y = jnp.sqrt((ay * r0) ** 2 + (ax * r1) ** 2)
  relevant = valid & (my + ext_y > y0) & (my - ext_y < y0 + stripe_h)
  n_dropped = jnp.maximum(
      jnp.sum(relevant, dtype=jnp.int32) - local_points, 0)
  # relevant-first partition; ties keep index order (deterministic)
  key = (~relevant).astype(jnp.int32)
  _, sel = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                        is_stable=True)
  return sel[:local_points], n_dropped


# ---------------------------------------------------------------------------
# balanced stripe partitions (probe once per scene, re-jit on drift)
# ---------------------------------------------------------------------------


def stripe_row_loads(points2d: jax.Array, depth: jax.Array,
                     image_size: Tuple[int, int], config: RasterConfig,
                     capacity: Optional[int] = None):
  """Probe the per-tile-row overlap counts of one frame — the load
  statistic balanced stripes partition on. One full-frame mapping (like
  the capacity probe); returns (n_tile_rows,) numpy int64."""
  import numpy as np
  from ..ops.mapper import map_to_tiles
  w, h = image_size
  ts = config.tile_size
  tw = -(-w // ts)
  n_rows = -(-h // ts)
  mapping = map_to_tiles(points2d, depth, image_size, config,
                         capacity=capacity)
  tiles = np.asarray(mapping.overlap_to_tile)
  tiles = tiles[tiles < tw * n_rows]          # drop sentinel slots
  return np.bincount(tiles // tw, minlength=n_rows).astype(np.int64)


def balance_stripe_rows(row_loads, d: int) -> Tuple[int, ...]:
  """Optimal contiguous partition of tile rows into d stripes minimizing
  the max per-stripe load (binary search on the bottleneck + greedy
  feasibility). Returns a tuple of d per-stripe tile-row counts (each
  >= 1, summing to len(row_loads)) for tp_rasterize/tp_train_step's
  stripe_rows argument. Loads are static per scene: re-probe and re-jit
  on drift, like every other capacity."""
  import numpy as np
  loads = np.asarray(row_loads, np.int64)
  n = len(loads)
  assert n >= d >= 1, f"need >= {d} tile rows, have {n}"

  def partition(cap):
    # greedy: start a new stripe when adding the row would exceed cap,
    # or when the remaining rows are needed one-per-remaining-stripe
    counts, cur, used = [], 0, 0
    for i, v in enumerate(loads):
      must_break = (n - i) == (d - len(counts))  # reserve 1 row/stripe
      if cur > 0 and (used + v > cap or must_break):
        counts.append(cur)
        cur, used = 0, 0
        if len(counts) == d - 1:
          counts.append(n - i)
          return counts if max(
              loads[n - counts[-1]:].sum(), 0) <= cap else None
      cur += 1
      used += v
    counts.append(cur)
    return counts if len(counts) <= d else None

  lo, hi = int(loads.max()), int(loads.sum())
  best = None
  while lo <= hi:
    mid = (lo + hi) // 2
    p = partition(mid)
    if p is not None:
      best, hi = p, mid - 1
    else:
      lo = mid + 1
  assert best is not None
  # pad to exactly d stripes by splitting multi-row stripes (a split
  # never raises the bottleneck)
  while len(best) < d:
    i = int(np.argmax(best))
    assert best[i] >= 2
    best[i], split = best[i] - best[i] // 2, best[i] // 2
    best.insert(i + 1, split)
  return tuple(int(c) for c in best)


def stripe_offsets_px(stripe_rows: Tuple[int, ...], tile_size: int):
  """(y0_px per stripe, height_px per stripe, max height_px)."""
  heights = [r * tile_size for r in stripe_rows]
  y0s, acc = [], 0
  for hpx in heights:
    y0s.append(acc)
    acc += hpx
  return tuple(y0s), tuple(heights), max(heights)


def assemble_stripes(stack: jax.Array, stripe_rows: Tuple[int, ...],
                     tile_size: int) -> jax.Array:
  """Reassemble a balanced tp_rasterize output: stack is
  (d * max_px, W, ...) — stripe i's render occupies rows
  [i * max_px, i * max_px + h_i); rows beyond h_i duplicate the next
  stripes' content and are dropped."""
  _, heights, max_px = stripe_offsets_px(stripe_rows, tile_size)
  parts = [stack[i * max_px:i * max_px + hpx]
           for i, hpx in enumerate(heights)]
  return jnp.concatenate(parts, axis=0)


def tp_train_step(mesh: Mesh, config: RasterConfig,
                  image_size: Tuple[int, int],
                  local_points: int,
                  local_capacity: Optional[int] = None,
                  axis_name: str = "data",
                  stripe_rows: Optional[Tuple[int, ...]] = None):
  """Build a jitted tile-parallel TRAINING step for ONE frame: the full
  fwd+bwd raster pipeline sharded into image stripes, with the training
  sinks (per-point heuristics + visibility) delivered exactly as in the
  single-chip trainer.

  Each device selects its stripe's (at most `local_points`) relevant
  gaussians (stripe_select — mapper emission, candidate sort and overlap
  capacity are all stripe-local, ~1/mesh of the frame instead of a
  replicated full mapper), rasterizes the stripe, and computes the
  stripe's summed-squared-error against its target rows. Losses and
  per-point gradients/heuristics/visibility psum over ICI (gathers
  through jnp.take transpose to scatter-adds into the full-N arrays).

  The returned function:
    step(points2d (N, 7), depth (N,), features (N, F), target (H, W, F))
      -> (loss, (grad_points, grad_features), heuristics (N, 2) | None,
          visibility (N,) | None, overflow () bool)

  heuristics/visibility follow config.compute_point_heuristic /
  compute_visibility. `local_capacity` bounds each stripe's overlap
  list (None -> the single-stripe heuristic). overflow is the TOTAL
  count of gaussians dropped because some stripe had more than
  local_points relevant ones (0 = complete; results valid but
  incomplete otherwise — raise local_points and re-jit, like the
  capacity flow).

  stripe_rows: optional d-tuple of per-stripe tile-ROW counts (from
  balance_stripe_rows over stripe_row_loads) replacing the equal-height
  split. Real scenes concentrate overlaps in few rows, so equal stripes
  make one device's mapper/kernels the critical path; balanced stripes
  equalize the probed per-stripe overlap load. Every stripe renders at
  the max balanced height (static shapes); rows beyond its own height
  duplicate the next stripes' content and are masked out of the loss,
  so gradients stay exact.
  """
  from ..ops.raster import rasterize

  w, h = image_size
  d = mesh.shape[axis_name]
  ts = config.tile_size
  if stripe_rows is None:
    assert h % (d * ts) == 0, (
        f"image height {h} must split into {d} tile-aligned stripes "
        f"(multiple of {d * ts}); pass stripe_rows= for uneven splits")
    stripe_rows = (h // (d * ts),) * d
  assert len(stripe_rows) == d and min(stripe_rows) >= 1
  assert sum(stripe_rows) * ts == h, (
      f"stripe_rows {stripe_rows} x tile_size {ts} != image height {h}")
  y0s, heights, max_px = stripe_offsets_px(stripe_rows, ts)
  y0s_a = jnp.asarray(y0s, jnp.int32)
  heights_a = jnp.asarray(heights, jnp.int32)

  with_heur = config.compute_point_heuristic
  with_vis = config.compute_visibility or with_heur

  def device_fn(points, depth, features, target_block):
    n = points.shape[0]
    idx = jax.lax.axis_index(axis_name)
    y0 = jnp.take(y0s_a, idx).astype(points.dtype)
    hgt = jnp.take(heights_a, idx)
    sel, n_dropped = stripe_select(points, y0, hgt.astype(points.dtype),
                                   local_points, config.alpha_threshold)
    # rows past this stripe's own height duplicate the next stripes'
    # content (rendered again there); mask them out of the loss so each
    # image row is counted exactly once globally
    row = jax.lax.broadcasted_iota(jnp.int32, (max_px, 1, 1), 0)
    row_mask = (row < hgt).astype(points.dtype)

    def loss_fn(points, features, sink, vsink):
      p = jnp.take(points, sel, axis=0).at[:, 1].add(-y0)
      f = jnp.take(features, sel, axis=0)
      dep = jnp.take(depth, sel, axis=0)
      out = rasterize(
          p, dep, f, (w, max_px), config, capacity=local_capacity,
          heuristic_sink=jnp.take(sink, sel, axis=0) if with_heur else None,
          visibility_sink=jnp.take(vsink, sel, axis=0) if with_vis else None)
      return jnp.sum(row_mask * (out.image - target_block) ** 2)

    sink = jnp.zeros((n, 2), points.dtype)
    vsink = jnp.zeros((n,), points.dtype)
    loss, (gp, gf, heur, vis) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3))(points, features, sink, vsink)

    loss = jax.lax.psum(loss, axis_name)
    gp = jax.lax.psum(gp, axis_name)
    gf = jax.lax.psum(gf, axis_name)
    heur = jax.lax.psum(heur, axis_name) if with_heur else None
    vis = jax.lax.psum(vis, axis_name) if with_vis else None
    overflow = jax.lax.psum(n_dropped, axis_name)
    out = (loss, (gp, gf))
    out += (heur,) if with_heur else (None,)
    out += (vis,) if with_vis else (None,)
    return out + (overflow,)

  out_specs = (P(), (P(), P()))
  out_specs += (P(),) if with_heur else (None,)
  out_specs += (P(),) if with_vis else (None,)
  out_specs += (P(),)
  sharded = jax.shard_map(
      device_fn, mesh=mesh,
      in_specs=(P(), P(), P(), P(axis_name)),
      out_specs=out_specs,
      check_vma=False)

  @jax.jit
  def step(points, depth, features, target):
    # per-stripe target blocks at the uniform max height (static slices
    # of the row-padded target), stacked so each device's shard is
    # exactly its own padded stripe
    f = target.shape[-1]
    pad = jnp.zeros((max_px, w, f), target.dtype)
    tpad = jnp.concatenate([target, pad], axis=0)
    blocks = jnp.concatenate(
        [tpad[y0:y0 + max_px] for y0 in y0s], axis=0)  # (d * max_px, W, F)
    return sharded(points, depth, features, blocks)

  return step


def tp_rasterize(mesh: Mesh, config: RasterConfig,
                 image_size: Tuple[int, int],
                 capacity: Optional[int] = None,
                 axis_name: str = "data",
                 stripe_rows: Optional[Tuple[int, ...]] = None):
  """Build a jitted tile-parallel rasterizer for ONE frame.

  The image is split into `mesh size` horizontal tile-aligned stripes;
  each device runs the full mapper + Pallas raster pipeline on its
  stripe with the gaussians' mean-y shifted into the stripe frame (the
  per-tile blend math is tile-local, so stripe results are bitwise the
  single-device results; gaussians outside a stripe are SAT-culled by
  its mapper). Forward needs NO collectives — the returned image/weight
  are row-sharded across the mesh. Under `jax.grad`, shard_map's
  transpose psums the per-point gradients over ICI.

  The returned function:
    tp(gaussians2d (N, 7), depth (N,), features (N, F))
      -> (image (H, W, F) row-sharded, weight (H, W) row-sharded,
          visibility (N,) replicated or None)

  `capacity` bounds each device's LOCAL overlap list (default: the
  single-stripe heuristic); visibility is psum-reduced when
  config.compute_visibility.

  stripe_rows: optional d-tuple of per-stripe tile-ROW counts (from
  balance_stripe_rows) replacing the equal split. Every stripe renders
  at the max balanced height (static shapes); the returned image/weight
  are then (d * max_px, W, ...) stacked stripe renders — reassemble the
  (H, W, ...) image with assemble_stripes (rows beyond a stripe's own
  height duplicate its successors' content and are dropped there).
  """
  from ..ops.raster import rasterize

  w, h = image_size
  # stripe count = the extent of the sharded axis (NOT the total device
  # count: on a multi-axis mesh the y-offsets are per-axis_name shard)
  d = mesh.shape[axis_name]
  ts = config.tile_size
  balanced = stripe_rows is not None
  if not balanced:
    assert h % (d * ts) == 0, (
        f"image height {h} must split into {d} tile-aligned stripes "
        f"(multiple of {d * ts}); pass stripe_rows= for uneven splits")
    stripe_rows = (h // (d * ts),) * d
  assert len(stripe_rows) == d and min(stripe_rows) >= 1
  assert sum(stripe_rows) * ts == h
  y0s, _, max_px = stripe_offsets_px(stripe_rows, ts)
  y0s_a = jnp.asarray(y0s, jnp.int32)
  local_capacity = capacity

  with_vis = config.compute_visibility or config.compute_point_heuristic

  def device_fn(points, depth, features):
    idx = jax.lax.axis_index(axis_name)
    y0 = jnp.take(y0s_a, idx).astype(points.dtype)
    pts_local = points.at[:, 1].add(-y0)
    out = rasterize(pts_local, depth, features, (w, max_px), config,
                    capacity=local_capacity)
    if with_vis:
      return (out.image, out.image_weight,
              jax.lax.psum(out.visibility, axis_name))
    return out.image, out.image_weight

  out_specs = ((P(axis_name), P(axis_name), P()) if with_vis
               else (P(axis_name), P(axis_name)))
  sharded = jax.shard_map(
      device_fn, mesh=mesh,
      in_specs=(P(), P(), P()),
      out_specs=out_specs,
      check_vma=False)

  return jax.jit(sharded)


# ---------------------------------------------------------------------------
# point parallelism (projection / SH sharded over the gaussian axis)
# ---------------------------------------------------------------------------


def pp_project(mesh: Mesh, config: RasterConfig,
               image_size: Tuple[int, int],
               depth_range: Tuple[float, float] = (0.1, 1000.0),
               axis_name: str = "data"):
  """Build a jitted point-sharded projection: gaussians sharded over the
  mesh, camera replicated; outputs constrained to replicated so XLA
  inserts the all-gather for the (single-device-per-tile) raster stage."""

  @jax.jit
  def project(gaussians: Gaussians3D, projection, t_cam):
    gaussians = jax.lax.with_sharding_constraint(
        gaussians, NamedSharding(mesh, P(axis_name)))
    pts, depth, in_view = project_points(
        *gaussians.shape_tensors(), t_cam, projection, image_size,
        depth_range, blur_cov=config.blur_cov,
        clamp_margin=config.clamp_margin,
        alpha_threshold=config.alpha_threshold)
    # gather the projected 2D gaussians for rasterization
    rep = NamedSharding(mesh, P())
    return (jax.lax.with_sharding_constraint(pts, rep),
            jax.lax.with_sharding_constraint(depth, rep),
            jax.lax.with_sharding_constraint(in_view, rep))

  return project
