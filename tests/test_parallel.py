"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.optim import (ParameterClass,
                                                  VisibilityAwareAdam)
from taichi_gaussian_rasterizer_tpu.parallel import (dp_train_step,
                                                     make_mesh, pp_project,
                                                     replicate,
                                                     shard_leading)
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
  if len(jax.devices()) < N_DEV:
    pytest.skip("needs 8 virtual devices")
  return make_mesh(N_DEV)


def setup(mesh, n_points=48, image_size=(48, 32)):
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        compute_visibility=True)
  camera = random_camera(jax.random.PRNGKey(0), image_size=image_size,
                         dtype=jnp.float32)
  g = random_3d_gaussians(jax.random.PRNGKey(1), n_points, camera,
                          dtype=jnp.float32)
  params = ParameterClass.create(
      {k: getattr(g, k) for k in ("position", "log_scaling", "rotation",
                                  "alpha_logit", "feature")},
      {k: dict(lr=0.01) for k in ("position", "log_scaling", "rotation",
                                  "alpha_logit", "feature")},
      optimizer=VisibilityAwareAdam)
  return config, camera, g, params


def test_dp_train_step_runs_and_matches_single(mesh):
  """The 8-way DP step with identical cameras/targets on every device
  must produce the same update as a 1-device run (psum-mean of equal
  gradients is the gradient)."""
  config, camera, g, params = setup(mesh)
  image_size = camera.image_size

  projections = jnp.tile(camera.projection[None], (N_DEV, 1))
  t_cams = jnp.tile(camera.T_camera_world[None], (N_DEV, 1, 1))
  target = jax.random.uniform(
      jax.random.PRNGKey(2), (1, image_size[1], image_size[0], 3))
  targets = jnp.tile(target, (N_DEV, 1, 1, 1))

  step8 = dp_train_step(mesh, config, image_size, local_batch=1)
  p8, loss8 = step8(replicate(params, mesh),
                    shard_leading(projections, mesh),
                    shard_leading(t_cams, mesh),
                    shard_leading(targets, mesh))

  mesh1 = make_mesh(1)
  step1 = dp_train_step(mesh1, config, image_size, local_batch=1)
  p1, loss1 = step1(replicate(params, mesh1),
                    shard_leading(projections[:1], mesh1),
                    shard_leading(t_cams[:1], mesh1),
                    shard_leading(targets[:1], mesh1))

  np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(p8.tensors["position"]),
                             np.asarray(p1.tensors["position"]),
                             rtol=1e-4, atol=1e-6)


def test_dp_distinct_cameras_reduce(mesh):
  """Different targets per device: the step must still run and the loss
  equal the mean of per-device losses."""
  config, camera, g, params = setup(mesh)
  image_size = camera.image_size

  projections = jnp.tile(camera.projection[None], (N_DEV, 1))
  t_cams = jnp.tile(camera.T_camera_world[None], (N_DEV, 1, 1))
  targets = jax.random.uniform(
      jax.random.PRNGKey(3), (N_DEV, image_size[1], image_size[0], 3))

  step = dp_train_step(mesh, config, image_size, local_batch=1)
  p2, loss = step(replicate(params, mesh),
                  shard_leading(projections, mesh),
                  shard_leading(t_cams, mesh),
                  shard_leading(targets, mesh))
  assert np.isfinite(float(loss))
  assert float(jnp.abs(p2.tensors["position"]
                       - params.tensors["position"]).max()) > 0


def test_pp_project_matches_single_device(mesh):
  config, camera, g, params = setup(mesh, n_points=64)
  project = pp_project(mesh, config, camera.image_size)
  pts, depth, in_view = project(g, camera.projection, camera.T_camera_world)

  from taichi_gaussian_rasterizer_tpu import project_to_image
  pts1, depth1, iv1 = project_to_image(g, camera, config)
  # f32 tolerance: sharded execution reassociates reductions slightly
  np.testing.assert_allclose(np.asarray(pts), np.asarray(pts1),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_array_equal(np.asarray(in_view), np.asarray(iv1))


def test_tp_rasterize_matches_single_device(mesh):
  """Tile-parallel rasterization (image stripes over the mesh) must match
  the single-device render: the blend math is tile-local, so stripe
  decomposition only re-bins; gradients psum back to the same values."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.ops.raster import rasterize
  from taichi_gaussian_rasterizer_tpu.parallel import tp_rasterize
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 128)  # 8 stripes of 16 rows (one tile row each)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  g = random_2d_gaussians(jax.random.PRNGKey(5), 120, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)
  feats = g.feature

  tp = tp_rasterize(mesh, config, image_size)
  img_tp, w_tp = tp(points, depth, feats)

  out = rasterize(points, depth, feats, image_size, config)
  # not bitwise: (mean_y - stripe_y0) - tile_origin re-rounds vs
  # mean_y - global_tile_origin (f32 associativity); measured ~4e-6
  np.testing.assert_allclose(np.asarray(img_tp), np.asarray(out.image),
                             rtol=1e-4, atol=2e-5)
  np.testing.assert_allclose(np.asarray(w_tp), np.asarray(out.image_weight),
                             rtol=1e-4, atol=2e-5)

  # gradients: shard_map's transpose psums per-point grads over the mesh
  g_img = jax.random.normal(jax.random.PRNGKey(6),
                            (image_size[1], image_size[0], 3), jnp.float32)

  def loss_tp(p, f):
    img, _ = tp(p, depth, f)
    return jnp.vdot(img, g_img)

  def loss_1d(p, f):
    o = rasterize(p, depth, f, image_size, config)
    return jnp.vdot(o.image, g_img)

  gp_tp, gf_tp = jax.grad(loss_tp, argnums=(0, 1))(points, feats)
  gp_1d, gf_1d = jax.grad(loss_1d, argnums=(0, 1))(points, feats)
  # both paths bf16-pack slot-gradient transport; the stripe shift makes
  # them round differently, so compare at transport grade relative to
  # the gradient scale (cf. test_f32_packed_gradients_close_to_truth)
  rel = lambda a, b: float(jnp.abs(a - b).max() / jnp.abs(b).max())
  assert rel(gp_tp, gp_1d) < 2e-2, rel(gp_tp, gp_1d)
  assert rel(gf_tp, gf_1d) < 2e-2, rel(gf_tp, gf_1d)


def test_tp_train_step_matches_single_device(mesh):
  """Tile-parallel TRAINING parity: loss, per-point gradients, the
  heuristic sink (prune cost, split score) and visibility from the
  stripe-sharded step must match the single-device trainer frame. Runs
  with local_points < N so the test also exercises the stripe-local
  mapper: each device maps only its own stripe's relevant gaussians."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.ops.raster import rasterize
  from taichi_gaussian_rasterizer_tpu.parallel import tp_train_step
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 128)  # 8 stripes of 16 rows
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        compute_point_heuristic=True)
  n = 120
  g = random_2d_gaussians(jax.random.PRNGKey(8), n, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)
  feats = g.feature
  target = jax.random.uniform(jax.random.PRNGKey(9),
                              (image_size[1], image_size[0], 3), jnp.float32)

  # local_points < N: forces the stripe-local selection to actually
  # compact (fails loudly via overflow if selection under-covers)
  step = tp_train_step(mesh, config, image_size, local_points=64)
  loss_tp, (gp_tp, gf_tp), heur_tp, vis_tp, overflow = step(
      points, depth, feats, target)
  assert not bool(overflow)

  def loss_1d(p, f, sink, vsink):
    out = rasterize(p, depth, f, image_size, config,
                    heuristic_sink=sink, visibility_sink=vsink)
    return jnp.sum((out.image - target) ** 2)

  l1, (gp_1, gf_1, heur_1, vis_1) = jax.value_and_grad(
      loss_1d, argnums=(0, 1, 2, 3))(
          points, feats, jnp.zeros((n, 2)), jnp.zeros((n,)))

  np.testing.assert_allclose(float(loss_tp), float(l1), rtol=1e-5)
  rel = lambda a, b: float(
      jnp.abs(a - b).max() / jnp.maximum(jnp.abs(b).max(), 1e-20))
  # bf16 slot-gradient transport rounds differently under the stripe
  # shift (cf. test_tp_rasterize_matches_single_device)
  assert rel(gp_tp, gp_1) < 2e-2, rel(gp_tp, gp_1)
  assert rel(gf_tp, gf_1) < 2e-2, rel(gf_tp, gf_1)
  assert rel(heur_tp, heur_1) < 2e-2, rel(heur_tp, heur_1)
  assert rel(vis_tp, vis_1) < 2e-2, rel(vis_tp, vis_1)


def test_tp_train_step_overflow_flag(mesh):
  """local_points smaller than a stripe's relevant count must flag
  overflow rather than silently dropping gaussians."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.parallel import tp_train_step
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 128)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  g = random_2d_gaussians(jax.random.PRNGKey(8), 120, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)
  target = jnp.zeros((image_size[1], image_size[0], 3), jnp.float32)

  step = tp_train_step(mesh, config, image_size, local_points=8)
  *_, overflow = step(points, depth, g.feature, target)
  assert bool(overflow)


def test_stripe_select_covers_mapper_acceptance(mesh):
  """stripe_select must never drop a gaussian the stripe's mapper would
  accept (its bound is the mapper's own footprint AABB)."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.ops.mapper import map_to_tiles
  from taichi_gaussian_rasterizer_tpu.parallel.sharding import stripe_select
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 128)
  stripe_h = 16
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  n = 150
  g = random_2d_gaussians(jax.random.PRNGKey(11), n, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)

  for k in range(128 // stripe_h):
    y0 = k * stripe_h
    sel, overflow = stripe_select(points, float(y0), stripe_h, n,
                                  config.alpha_threshold)
    assert not bool(overflow)
    p_loc = points.at[:, 1].add(-y0)
    m = map_to_tiles(p_loc, depth, (64, stripe_h), config)
    accepted = np.unique(np.asarray(m.overlap_to_point))
    accepted = accepted[accepted < n]
    # every accepted point must be among the selected ones
    selected = set(np.asarray(sel).tolist())
    missing = [int(a) for a in accepted if int(a) not in selected]
    assert not missing, f"stripe {k}: mapper accepted {missing}"


def test_tp_rasterize_visibility_psum(mesh):
  """Per-point visibility from the tile-parallel path must equal the
  single-device visibility (each point's blend weights live in exactly
  the stripes its footprint touches; psum reassembles the total)."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.ops.raster import rasterize
  from taichi_gaussian_rasterizer_tpu.parallel import tp_rasterize
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 128)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        compute_visibility=True)
  g = random_2d_gaussians(jax.random.PRNGKey(7), 90, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)

  tp = tp_rasterize(mesh, config, image_size)
  _, _, vis_tp = tp(points, depth, g.feature)

  out = rasterize(points, depth, g.feature, image_size, config)
  # the f32 stripe shift can flip a knife-edge alpha/saturation gate on
  # isolated pixels (each worth <= one blend weight)
  np.testing.assert_allclose(np.asarray(vis_tp), np.asarray(out.visibility),
                             rtol=1e-3, atol=5e-3)


def test_balanced_stripes_skewed_scene(mesh):
  """Balanced tile-parallel stripes (stripe_row_loads +
  balance_stripe_rows): on a scene whose overlaps concentrate in a few
  tile rows, the balanced partition must cut the max per-device overlap
  load well below equal-height stripes, the assembled balanced render
  must match the single-device image, and the balanced training step
  must match single-device loss/gradients with zero dropped gaussians
  (VERDICT r4 item 8)."""
  from taichi_gaussian_rasterizer_tpu.models.renderer2d import (
      project_gaussians2d)
  from taichi_gaussian_rasterizer_tpu.ops.raster import rasterize
  from taichi_gaussian_rasterizer_tpu.parallel import (
      assemble_stripes, balance_stripe_rows, stripe_row_loads,
      tp_rasterize, tp_train_step)
  from taichi_gaussian_rasterizer_tpu.utils.random_data import (
      random_2d_gaussians)

  image_size = (64, 256)  # 16 tile rows over 8 devices
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  n = 160
  g = random_2d_gaussians(jax.random.PRNGKey(21), n, image_size,
                          num_channels=3, dtype=jnp.float32)
  points = project_gaussians2d(g)
  # deliberately skew: squeeze 90% of the gaussians into the top two
  # tile rows, leaving the bottom 14 rows nearly empty
  y = points[:, 1]
  y_skew = jnp.where(jnp.arange(n) < int(0.9 * n), y * (30.0 / 256.0), y)
  points = points.at[:, 1].set(y_skew)
  depth = jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0)
  feats = g.feature

  loads = stripe_row_loads(points, depth, image_size, config)
  rows = balance_stripe_rows(loads, N_DEV)
  assert len(rows) == N_DEV and sum(rows) == 16 and min(rows) >= 1

  def stripe_loads(partition):
    out, i = [], 0
    for r in partition:
      out.append(int(loads[i:i + r].sum()))
      i += r
    return out

  equal_max = max(stripe_loads((2,) * N_DEV))
  balanced_max = max(stripe_loads(rows))
  assert balanced_max <= 0.6 * equal_max, (
      f"balanced {stripe_loads(rows)} (rows {rows}) vs equal max "
      f"{equal_max}: balancing bought too little on this skew")

  # correctness: assembled balanced render == single-device render
  tp = tp_rasterize(mesh, config, image_size, stripe_rows=rows)
  img_stack, w_stack = tp(points, depth, feats)
  img = assemble_stripes(img_stack, rows, config.tile_size)
  w = assemble_stripes(w_stack, rows, config.tile_size)
  out = rasterize(points, depth, feats, image_size, config)
  np.testing.assert_allclose(np.asarray(img), np.asarray(out.image),
                             rtol=1e-4, atol=2e-5)
  np.testing.assert_allclose(np.asarray(w), np.asarray(out.image_weight),
                             rtol=1e-4, atol=2e-5)

  # balanced training step: loss + grads match, zero dropped gaussians
  target = jax.random.normal(
      jax.random.PRNGKey(22), (image_size[1], image_size[0], 3),
      jnp.float32)
  step = tp_train_step(mesh, config, image_size, local_points=n,
                       stripe_rows=rows)
  loss_tp, (gp_tp, gf_tp), _, _, dropped = step(points, depth, feats,
                                                target)
  assert int(dropped) == 0

  def loss_1d(p, f):
    o = rasterize(p, depth, f, image_size, config)
    return jnp.sum((o.image - target) ** 2)

  loss_1, (gp_1, gf_1) = jax.value_and_grad(
      loss_1d, argnums=(0, 1))(points, feats)
  np.testing.assert_allclose(float(loss_tp), float(loss_1), rtol=1e-5)
  rel = lambda a, b: float(jnp.abs(a - b).max() / jnp.abs(b).max())
  assert rel(gp_tp, gp_1) < 2e-2, rel(gp_tp, gp_1)
  assert rel(gf_tp, gf_1) < 2e-2, rel(gf_tp, gf_1)


def test_balance_stripe_rows_partitions():
  """balance_stripe_rows: optimal contiguous bottleneck partition on
  hand-checkable loads; every stripe >= 1 row, rows conserved."""
  from taichi_gaussian_rasterizer_tpu.parallel import balance_stripe_rows
  # hot head: best 3-way split of [9 1 1 1 1 1 1 1] is (1, 3, 4) or
  # similar with bottleneck 9 (the single hot row is irreducible)
  rows = balance_stripe_rows([9, 1, 1, 1, 1, 1, 1, 1], 3)
  assert sum(rows) == 8 and len(rows) == 3 and min(rows) >= 1
  loads = [9, 1, 1, 1, 1, 1, 1, 1]
  def maxload(p):
    out, i = [], 0
    for r in p:
      out.append(sum(loads[i:i + r])); i += r
    return max(out)
  assert maxload(rows) == 9
  # uniform loads: the balanced split is the equal split
  assert balance_stripe_rows([5] * 8, 4) == (2, 2, 2, 2)
  # d == number of rows: forced all-ones
  assert balance_stripe_rows([3, 7, 2], 3) == (1, 1, 1)
