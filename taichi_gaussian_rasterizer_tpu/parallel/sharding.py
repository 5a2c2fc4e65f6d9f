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


def stripe_select(points: jax.Array, y0, stripe_h: int, local_points: int,
                  alpha_threshold: float):
  """Indices of the (at most local_points) gaussians whose footprint can
  touch the stripe [y0, y0 + stripe_h) — the per-device mapper then only
  emits candidates for its own stripe's gaussians instead of replicating
  the full N-sized emission on every device.

  The y-extent test is the same conservative ellipse-AABB bound the
  mapper's footprint uses (ops/mapper._footprint), so selection never
  drops a gaussian the stripe's mapper would have accepted. Returns
  (sel (local_points,) int32 indices — padded with indices of
  non-relevant points, which the stripe mapper SAT-culls — and
  overflow: True when more than local_points gaussians are relevant,
  i.e. some were dropped and the stripe is incomplete)."""
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
  overflow = jnp.sum(relevant) > local_points
  # relevant-first partition; ties keep index order (deterministic)
  key = (~relevant).astype(jnp.int32)
  _, sel = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                        is_stable=True)
  return sel[:local_points], overflow


def tp_train_step(mesh: Mesh, config: RasterConfig,
                  image_size: Tuple[int, int],
                  local_points: int,
                  local_capacity: Optional[int] = None,
                  axis_name: str = "data"):
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
  list (None -> the single-stripe heuristic). overflow is True when a
  stripe had more than local_points relevant gaussians (results valid
  but incomplete — raise local_points and re-jit, like the capacity
  flow).
  """
  from ..ops.raster import rasterize

  w, h = image_size
  d = mesh.shape[axis_name]
  ts = config.tile_size
  assert h % (d * ts) == 0, (
      f"image height {h} must split into {d} tile-aligned stripes "
      f"(multiple of {d * ts})")
  stripe_h = h // d

  with_heur = config.compute_point_heuristic
  with_vis = config.compute_visibility or with_heur

  def device_fn(points, depth, features, target):
    n = points.shape[0]
    idx = jax.lax.axis_index(axis_name)
    y0 = (idx * stripe_h).astype(points.dtype)
    sel, overflow = stripe_select(points, y0, stripe_h, local_points,
                                  config.alpha_threshold)

    def loss_fn(points, features, sink, vsink):
      p = jnp.take(points, sel, axis=0).at[:, 1].add(-y0)
      f = jnp.take(features, sel, axis=0)
      dep = jnp.take(depth, sel, axis=0)
      out = rasterize(
          p, dep, f, (w, stripe_h), config, capacity=local_capacity,
          heuristic_sink=jnp.take(sink, sel, axis=0) if with_heur else None,
          visibility_sink=jnp.take(vsink, sel, axis=0) if with_vis else None)
      return jnp.sum((out.image - target) ** 2)

    sink = jnp.zeros((n, 2), points.dtype)
    vsink = jnp.zeros((n,), points.dtype)
    loss, (gp, gf, heur, vis) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3))(points, features, sink, vsink)

    loss = jax.lax.psum(loss, axis_name)
    gp = jax.lax.psum(gp, axis_name)
    gf = jax.lax.psum(gf, axis_name)
    heur = jax.lax.psum(heur, axis_name) if with_heur else None
    vis = jax.lax.psum(vis, axis_name) if with_vis else None
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis_name) > 0
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

  return jax.jit(sharded)


def tp_rasterize(mesh: Mesh, config: RasterConfig,
                 image_size: Tuple[int, int],
                 capacity: Optional[int] = None,
                 axis_name: str = "data"):
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
  """
  from ..ops.raster import rasterize

  w, h = image_size
  # stripe count = the extent of the sharded axis (NOT the total device
  # count: on a multi-axis mesh the y-offsets are per-axis_name shard)
  d = mesh.shape[axis_name]
  ts = config.tile_size
  assert h % (d * ts) == 0, (
      f"image height {h} must split into {d} tile-aligned stripes "
      f"(multiple of {d * ts})")
  stripe_h = h // d
  local_capacity = capacity

  with_vis = config.compute_visibility or config.compute_point_heuristic

  def device_fn(points, depth, features):
    idx = jax.lax.axis_index(axis_name)
    y0 = (idx * stripe_h).astype(points.dtype)
    pts_local = points.at[:, 1].add(-y0)
    out = rasterize(pts_local, depth, features, (w, stripe_h), config,
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
