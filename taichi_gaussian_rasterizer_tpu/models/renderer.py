"""High-level 3D gaussian renderer.

Rebuild of /root/reference/taichi_splatting/renderer.py: the full
decomposed pipeline project -> shade (SH or raw features) -> tile map ->
rasterize, with depth / depth-variance riding the blend as prepended
channels (renderer.py:191-193) and median depth via a second non-blending
pass at saturate_threshold=0.5 (renderer.py:202-208).

Static-shape differences from the reference: there is no compaction of
visible points — `points_in_view` is a boolean mask over all N instead of
an index list, and SH shading evaluates all points (culled points are
exact no-ops downstream).
"""

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from ..data_types import Gaussians3D
from ..ops import lib
from ..ops.mapper import map_to_tiles
from ..ops.projection import CameraParams, project_to_image
from ..ops.raster import rasterize_with_tiles
from ..ops.sh import evaluate_sh_at


@dataclass(frozen=True)
class Rendering:
  """Renderer outputs (reference renderer.py:27-130)."""
  image: jax.Array                 # (H, W, C)
  image_weight: jax.Array          # (H, W) accumulated alpha
  points_in_view: jax.Array        # (N,) bool mask (reference: index list)
  point_depth: jax.Array           # (N, 1)
  gaussians2d: jax.Array           # (N, 7)
  camera: CameraParams
  config: RasterConfig
  point_visibility: Optional[jax.Array] = None   # (N,)
  point_heuristic: Optional[jax.Array] = None    # (N, 2) via heuristic sink
  depth: Optional[jax.Array] = None              # (H, W)
  depth_var: Optional[jax.Array] = None          # (H, W)
  median_depth: Optional[jax.Array] = None       # (H, W)
  raster_overflow: Optional[jax.Array] = None    # () bool: saturation-front
                                                 # truncation cropped a tile
                                                 # (visit_chunks too small) —
                                                 # re-probe and re-jit

  # -- derived quantities (reference renderer.py:54-116) --

  @property
  def ndc_depth(self):
    return lib.ndc_depth(self.depth, self.camera.near_plane,
                         self.camera.far_plane)

  @property
  def ndc_median_depth(self):
    return lib.ndc_depth(self.median_depth, self.camera.near_plane,
                         self.camera.far_plane)

  @property
  def ndc_point_depth(self):
    return lib.ndc_depth(self.point_depth, self.camera.near_plane,
                         self.camera.far_plane)

  @property
  def point_scale(self):
    return self.gaussians2d[:, 4:6]

  @property
  def point_opacity(self):
    return self.gaussians2d[:, 6]

  @property
  def gaussian_scale(self):
    """Cutoff multiple of sigma used for culling (renderer.py:75-80)."""
    return lib.gaussian_scale_factor(self.point_opacity,
                                     self.config.alpha_threshold)

  @property
  def point_radii(self):
    return jnp.max(self.point_scale, axis=1)

  @property
  def prune_cost(self):
    assert self.point_heuristic is not None, (
        "No point heuristic available (render with a heuristic_sink and "
        "config.compute_point_heuristic=True)")
    return self.point_heuristic[:, 0]

  @property
  def split_score(self):
    assert self.point_heuristic is not None, (
        "No point heuristic available (render with a heuristic_sink and "
        "config.compute_point_heuristic=True)")
    return self.point_heuristic[:, 1]

  @property
  def visible_mask(self):
    assert self.point_visibility is not None, (
        "No visibility information (use config.compute_visibility=True)")
    return self.point_visibility > 0

  @property
  def image_size(self) -> Tuple[int, int]:
    return self.camera.image_size

  @property
  def num_points(self) -> int:
    return self.points_in_view.shape[0]

  def detach(self) -> "Rendering":
    return jax.tree.map(jax.lax.stop_gradient, self)

  def replace(self, **kwargs) -> "Rendering":
    return replace(self, **kwargs)


jax.tree_util.register_dataclass(
    Rendering,
    data_fields=["image", "image_weight", "points_in_view", "point_depth",
                 "gaussians2d", "camera", "point_visibility",
                 "point_heuristic", "depth", "depth_var", "median_depth",
                 "raster_overflow"],
    meta_fields=["config"])


def compute_depth_variance(depth_depthsq, weight, eps=1e-6):
  """E[d], Var[d] from blended [d, d^2] channels (renderer.py:173-180)."""
  w = weight + eps
  depth = depth_depthsq[..., 0] / w
  depth_sq = depth_depthsq[..., 1] / w
  return depth, depth_sq - depth * depth


def render_projected(in_view: jax.Array, gaussians2d: jax.Array,
                     features: jax.Array, depths: jax.Array,
                     camera_params: CameraParams, config: RasterConfig,
                     render_depth: bool = False, use_depth16: bool = False,
                     render_median_depth: bool = False,
                     use_ndc_depth: bool = False,
                     heuristic_sink: Optional[jax.Array] = None,
                     visibility_sink: Optional[jax.Array] = None,
                     capacity: Optional[int] = None,
                     emit_tails: Optional[Tuple[int, ...]] = None,
                     reduce_capacity: Optional[int] = None,
                     visit_chunks=None,
                     visit_capacity: Optional[int] = None) -> Rendering:
  """Rasterize already-projected gaussians (reference renderer.py:183-231).

  `point_heuristic` in the returned record is always None here: in the
  functional design the heuristics (prune cost, split score — reference
  backward.py:194-198) are the COTANGENT of `heuristic_sink`, produced by
  differentiation rather than by mutation during backward. Either call
  `render_with_heuristics(loss_fn, ...)` (which wires this up and returns
  a populated record), or pass a zero (N, 2) `heuristic_sink` and take
  `jax.grad` of your loss w.r.t. it — that gradient IS (prune_cost,
  split_score).
  """
  ndc_depths = lib.ndc_depth(
      jnp.maximum(depths, camera_params.near_plane),
      camera_params.near_plane, camera_params.far_plane)
  # culled points have depth 0; keep their ndc at 0 with zero alpha
  point_depth = depths

  if render_depth:
    d = ndc_depths if use_ndc_depth else depths
    features = jnp.concatenate([d, d * d, features], axis=1)

  mapping = map_to_tiles(gaussians2d, ndc_depths[:, 0],
                         camera_params.image_size, config,
                         capacity=capacity, use_depth16=use_depth16,
                         emit_tails=emit_tails)

  raster = rasterize_with_tiles(
      gaussians2d, features, mapping, camera_params.image_size, config,
      heuristic_sink=heuristic_sink, visibility_sink=visibility_sink,
      reduce_capacity=reduce_capacity, visit_chunks=visit_chunks,
      visit_capacity=visit_capacity)

  median_depth = None
  if render_median_depth:
    d = ndc_depths if use_ndc_depth else depths
    median_cfg = config.replace(use_alpha_blending=False,
                                saturate_threshold=0.5)
    raster_median = rasterize_with_tiles(
        jax.lax.stop_gradient(gaussians2d), jax.lax.stop_gradient(d),
        mapping, camera_params.image_size, median_cfg)
    median_depth = raster_median.image[..., 0]

  img_depth, img_depth_var = None, None
  feature_image = raster.image
  if render_depth:
    img_depth, img_depth_var = compute_depth_variance(
        feature_image[..., :2], raster.image_weight)
    feature_image = feature_image[..., 2:]

  return Rendering(
      image=feature_image,
      image_weight=raster.image_weight,
      points_in_view=in_view,
      point_depth=point_depth,
      gaussians2d=gaussians2d,
      camera=camera_params,
      config=config,
      point_visibility=raster.visibility,
      point_heuristic=None,
      depth=img_depth,
      depth_var=img_depth_var,
      median_depth=median_depth,
      raster_overflow=raster.bin_overflow)


def render_gaussians(gaussians: Gaussians3D,
                     camera_params: CameraParams,
                     config: RasterConfig = RasterConfig(),
                     use_sh: bool = False,
                     render_depth: bool = False,
                     use_depth16: bool = False,
                     render_median_depth: bool = False,
                     heuristic_sink: Optional[jax.Array] = None,
                     visibility_sink: Optional[jax.Array] = None,
                     capacity: Optional[int] = None,
                     emit_tails: Optional[Tuple[int, ...]] = None,
                     reduce_capacity: Optional[int] = None,
                     visit_chunks=None,
                     visit_capacity: Optional[int] = None) -> Rendering:
  """Complete 3D gaussian renderer (reference renderer.py:134-170).

  features are degree-inferred SH coefficients when use_sh=True (shaded
  at all points; positions are detached for shading as in the reference,
  renderer.py:164), otherwise raw (N, C) features.
  """
  gaussians2d, depths, in_view = project_to_image(
      gaussians, camera_params, config)

  if use_sh:
    features = evaluate_sh_at(
        gaussians.feature, jax.lax.stop_gradient(gaussians.position),
        camera_params.camera_position)
  else:
    features = gaussians.feature
    assert features.ndim == 2, (
        f"Features must be (N, C) if use_sh=False, got {features.shape}")

  return render_projected(
      in_view, gaussians2d, features, depths, camera_params, config,
      render_depth=render_depth, use_depth16=use_depth16,
      render_median_depth=render_median_depth,
      heuristic_sink=heuristic_sink, visibility_sink=visibility_sink,
      capacity=capacity, emit_tails=emit_tails,
      reduce_capacity=reduce_capacity, visit_chunks=visit_chunks,
      visit_capacity=visit_capacity)


def render_with_heuristics(loss_fn, gaussians: Gaussians3D,
                           camera_params: CameraParams,
                           config: RasterConfig,
                           **render_kwargs):
  """Render + backward in one call, returning the per-point heuristics.

  The reference surfaces (prune_cost, split_score) by mutating the output
  record during loss.backward() (reference renderer.py:87-95,
  rasterizer/function.py:71-78); functionally, they are the cotangent of
  the zero heuristic-sink input. This helper runs the full fwd+bwd and
  returns `(loss, grads, rendering)` where `rendering.point_heuristic`
  is populated — so `rendering.prune_cost` / `rendering.split_score`
  work exactly like the reference's post-backward reads.

  Args:
    loss_fn: Rendering -> scalar loss
    render_kwargs: forwarded to render_gaussians (render_depth, ...)

  Returns:
    (loss, grads (Gaussians3D cotangent), rendering with point_heuristic)
  """
  cfg = config.replace(compute_point_heuristic=True)
  n = gaussians.position.shape[0]
  sink = jnp.zeros((n, 2), gaussians.position.dtype)
  vsink = jnp.zeros((n,), gaussians.position.dtype)

  def wrapped(g, s, vs):
    # visibility rides the backward's gradient reduction as the vsink
    # cotangent (one extra packed payload) — the forward skips its
    # separate visibility sort + segment-sum entirely (function.py)
    r = render_gaussians(g, camera_params, cfg, heuristic_sink=s,
                         visibility_sink=vs, **render_kwargs)
    return loss_fn(r), r

  (loss, rendering), (grads, heuristic, visibility) = jax.value_and_grad(
      wrapped, argnums=(0, 1, 2), has_aux=True)(gaussians, sink, vsink)
  return loss, grads, rendering.replace(point_heuristic=heuristic,
                                        point_visibility=visibility)


def viewspace_gradient(grad_gaussians2d: jax.Array) -> jax.Array:
  """||dL/dxy|| per point from a gaussians2d gradient (the classic 3DGS
  densification signal; reference renderer.py:234-239 — there it reads
  tensor.grad, here pass the gradient array from jax.grad/vjp)."""
  return jnp.linalg.norm(grad_gaussians2d[:, :2], axis=1)
