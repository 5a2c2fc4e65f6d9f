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
    # one full fwd+bwd per local camera (unrolled: Pallas kernels don't
    # vmap; local_batch is small)
    keys = ("position", "log_scaling", "rotation", "alpha_logit", "feature")

    def total_loss(tensors):
      losses, vis = [], []
      for i in range(local_batch):
        l, r = local_loss(tensors, projections[i], t_cams[i], targets[i])
        losses.append(l)
        vis.append(r.point_visibility)
      v = sum(vis) if vis[0] is not None else None
      return jnp.mean(jnp.stack(losses)), v

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
