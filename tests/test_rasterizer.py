"""Custom-VJP Pallas rasterizer tests (reference tests/test_rasterizer.py
analog): float64 gradcheck of the hand-written backward against finite
differences, equivalence against the pure-XLA implementation's autodiff
gradients, the visibility identity, and the heuristic-sink mechanism.

Scenes intentionally span multiple point chunks per tile (points_per_chunk
= 8, up to ~50 points/tile) to catch chunk-boundary carry bugs — the class
of bug the reference harbors at group boundaries (SURVEY.md §2.5 note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.ops.mapper import map_to_tiles
from taichi_gaussian_rasterizer_tpu.ops.raster import (
    rasterize, rasterize_with_tiles)
from taichi_gaussian_rasterizer_tpu.models.renderer2d import project_gaussians2d
from taichi_gaussian_rasterizer_tpu.utils.random_data import random_2d_gaussians


def scene(seed, n, image_size, num_channels=3):
  g = random_2d_gaussians(jax.random.PRNGKey(seed), n, image_size,
                          num_channels=num_channels, dtype=jnp.float64)
  return project_gaussians2d(g), g.z_depth.reshape(-1), g.feature


@pytest.mark.parametrize(
    "seed", [pytest.param(0, marks=pytest.mark.quick)] + list(range(1, 4)))
@pytest.mark.parametrize("antialias", [False, True])
def test_pallas_grads_match_xla(seed, antialias):
  image_size = (32, 24)
  config = RasterConfig(tile_size=8, points_per_chunk=8, antialias=antialias)
  points, depth, feats = scene(seed, 40, image_size)
  mapping = map_to_tiles(points, depth, image_size, config)
  key = jax.random.PRNGKey(seed + 100)
  g_img = jax.random.normal(key, (24, 32, 3), jnp.float64)
  g_w = jax.random.normal(key, (24, 32), jnp.float64)

  def loss(pts, f, impl):
    out = rasterize_with_tiles(pts, f, mapping, image_size, config,
                               impl=impl, max_points_per_tile=64)
    return jnp.sum(out.image * g_img) + jnp.sum(out.image_weight * g_w)

  lp, (gp_p, gf_p) = jax.value_and_grad(
      lambda p, f: loss(p, f, "pallas"), argnums=(0, 1))(points, feats)
  lx, (gp_x, gf_x) = jax.value_and_grad(
      lambda p, f: loss(p, f, "xla"), argnums=(0, 1))(points, feats)

  np.testing.assert_allclose(float(lp), float(lx), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                             rtol=1e-7, atol=1e-10)
  np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x),
                             rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("seed", range(3))
def test_pallas_gradcheck_fd(seed):
  """Finite-difference check of the hand-written backward (the reference's
  gradcheck strategy, tests/test_rasterizer.py:30-90)."""
  image_size = (16, 16)
  config = RasterConfig(tile_size=8, points_per_chunk=8)
  points, depth, feats = scene(seed, 20, image_size, num_channels=2)
  mapping = map_to_tiles(points, depth, image_size, config)

  def render(pts, f):
    out = rasterize_with_tiles(pts, f, mapping, image_size, config)
    return jnp.sum(out.image ** 2) + jnp.sum(out.image_weight)

  check_grads(render, (points, feats), order=1, modes=["rev"],
              atol=2e-4, rtol=2e-4, eps=1e-6)


def test_visibility_identity_pallas():
  """d(sum image)/d(features)[:, c] == forward visibility
  (reference tests/test_visibility.py:34-64)."""
  image_size = (48, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        compute_visibility=True)
  points, depth, feats = scene(7, 200, image_size)
  mapping = map_to_tiles(points, depth, image_size, config)

  out = rasterize_with_tiles(points, feats, mapping, image_size, config)

  def total(f):
    o = rasterize_with_tiles(points, f, mapping, image_size, config)
    return jnp.sum(o.image)

  gf = jax.grad(total)(feats)
  np.testing.assert_allclose(np.asarray(gf[:, 0]), np.asarray(out.visibility),
                             rtol=1e-8, atol=1e-12)
  assert np.asarray(out.visibility).sum() > 0


def test_heuristic_sink():
  """Heuristics arrive as the sink input's gradient: prune cost =
  sum_pixels (alpha_alpha_grad)^2, split score = sum |pos_grad|_1
  (reference backward.py:194-198)."""
  image_size = (16, 16)
  config = RasterConfig(tile_size=8, points_per_chunk=8,
                        compute_point_heuristic=True)
  points, depth, feats = scene(3, 15, image_size)
  mapping = map_to_tiles(points, depth, image_size, config)
  sink = jnp.zeros((15, 2), jnp.float64)

  def loss(pts, f, s):
    out = rasterize_with_tiles(pts, f, mapping, image_size, config,
                               heuristic_sink=s)
    return jnp.sum(out.image ** 2)

  gp, heur = jax.grad(loss, argnums=(0, 2))(points, feats, sink)

  assert np.asarray(heur).shape == (15, 2)
  assert (np.asarray(heur) >= 0).all()          # squared / abs sums
  assert np.asarray(heur).sum() > 0
  # split score upper-bounds nothing specific, but points with zero
  # position gradient must have zero split score
  pos_grad_mag = np.abs(np.asarray(gp)[:, 0]) + np.abs(np.asarray(gp)[:, 1])
  assert (np.asarray(heur)[pos_grad_mag == 0, 1] == 0).all()


@pytest.mark.quick
def test_rasterize_one_call():
  """rasterize = map_to_tiles + rasterize_with_tiles (function.py:129)."""
  image_size = (32, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth, feats = scene(5, 50, image_size)
  out = rasterize(points, depth, feats, image_size, config)
  assert out.image.shape == (32, 32, 3)
  assert out.image_weight.shape == (32, 32)
  assert np.isfinite(np.asarray(out.image)).all()


def test_median_mode_stop_gradient():
  image_size = (16, 16)
  config = RasterConfig(tile_size=8, use_alpha_blending=False,
                        saturate_threshold=0.5, points_per_chunk=8)
  points, depth, feats = scene(2, 10, image_size)

  def loss(pts):
    out = rasterize(pts, depth, feats, image_size, config)
    return jnp.sum(out.image)

  g = jax.grad(loss)(points)
  assert (np.asarray(g) == 0).all()  # forward-only mode


@pytest.mark.parametrize("tile_size", [8, 16, 32])
def test_tile_size_variants(tile_size):
  """Every supported tile size renders the same image (binning must not
  change the blend; reference benchmarks cover tile 16/32)."""
  image_size = (64, 64)
  points, depth, feats = scene(9, 60, image_size)

  images = []
  for ts in (8, tile_size):
    config = RasterConfig(tile_size=ts, points_per_chunk=8)
    out = rasterize(points, depth, feats, image_size, config)
    images.append(np.asarray(out.image))
  np.testing.assert_allclose(images[0], images[1], rtol=1e-10, atol=1e-12)


def test_depth16_render_close():
  """depth16 sorting only reorders nearly-equal depths; the rendered
  image must stay close to the full-precision sort."""
  image_size = (48, 48)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth, feats = scene(10, 80, image_size)

  full = rasterize(points, depth, feats, image_size, config)
  d16 = rasterize(points, depth, feats, image_size, config,
                  use_depth16=True)
  np.testing.assert_allclose(np.asarray(d16.image), np.asarray(full.image),
                             atol=5e-3)


def test_deterministic_depth16_permutation_invariant():
  """config.deterministic under depth16: quantized-key blend ties break
  on the full f32 depth (secondary sort key), so the render is bitwise
  identical across permuted input point orders. Without the secondary
  key, even a stable sort blends ties in generation order, which a
  permutation changes. (Reference behavior: CUB radix is stable but
  generation-ordered — tile_mapper.py:154.)"""
  image_size = (48, 48)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        deterministic=True)
  points, depth, feats = scene(11, 80, image_size)
  # force heavy depth16-key collisions (16 coarse buckets) while keeping
  # the true depths distinct: ties are common under quantization but
  # measure-zero at full precision (VERDICT r4 / config docstring)
  coarse = jnp.floor(jnp.clip(depth, 0, 0.99) * 8.0) / 8.0
  jitter = jax.random.uniform(jax.random.PRNGKey(7), depth.shape,
                              depth.dtype, 1e-7, 9e-7)
  depth = coarse + jitter

  img1 = rasterize(points, depth, feats, image_size, config,
                   use_depth16=True).image
  perm = jax.random.permutation(jax.random.PRNGKey(3), depth.shape[0])
  img2 = rasterize(points[perm], depth[perm], feats[perm], image_size,
                   config, use_depth16=True).image
  assert np.array_equal(np.asarray(img1), np.asarray(img2))
  # sanity: the collision construction actually produced ties
  assert len(np.unique(np.asarray(
      (jnp.clip(depth, 0, 1) * 65535).astype(jnp.uint32)))) < 20


def test_overflow_truncates_without_nan():
  """When real overlaps exceed the mapper's reduction capacity, the
  overflow flag must be set and gradients must degrade to truncation —
  never NaN (regression: out-of-bounds offsets gather filled NaN while
  overflow stayed False for capacity < overlaps <= k_pad)."""
  image_size = (128, 128)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth, feats = scene(13, 16, image_size)
  # blow up footprints so 16 gaussians produce hundreds of overlaps
  points = points.at[:, 4:6].mul(8.0)

  mapping = map_to_tiles(points, depth, image_size, config, capacity=64)
  assert int(mapping.total_overlaps) > 64
  assert bool(mapping.overflow)

  def loss(pts, f):
    out = rasterize_with_tiles(pts, f, mapping, image_size, config)
    return jnp.sum(out.image ** 2)

  grads = jax.grad(loss, argnums=(0, 1))(points, feats)
  for g in grads:
    assert bool(jnp.isfinite(g).all()), "overflow must truncate, not NaN"


def test_backward_saturation_skip_exact():
  """With heavy overdraw the forward reports saturated tiles
  (satchunks < nchunks) and the backward skips their tails; gradients
  must still match the XLA oracle exactly (post-saturation gradients are
  gated to zero, so skipping is lossless)."""
  from taichi_gaussian_rasterizer_tpu.ops.raster.forward import (
      cdiv_i32, rasterize_tiles_pallas)

  image_size = (32, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999)
  n = 64
  key = jax.random.PRNGKey(21)
  # opaque gaussians piled on the same spot -> saturates in ~2 chunks
  points = jnp.concatenate([
      16.0 + 4.0 * jax.random.normal(key, (n, 2), jnp.float64),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 20.0, jnp.float64),
      jnp.full((n, 1), 0.95, jnp.float64),
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(22), (n, 3), jnp.float64)

  mapping = map_to_tiles(points, depth, image_size, config)
  _, _, satchunks = rasterize_tiles_pallas(points, feats, mapping, config)
  nchunks = cdiv_i32(mapping.tile_ranges[:, 1] - mapping.tile_ranges[:, 0],
                     config.points_per_chunk)
  # satiters is SIGNED: +v = saturated at entry v (the skip engages when
  # that is before the bin's end), -v = exhausted unsaturated
  assert int(jnp.sum((satchunks > 0) & (satchunks < nchunks))) > 0, (
      "saturation skip never engaged; the scene must overdraw harder")

  def loss(pts, f, impl):
    kw = dict(max_points_per_tile=128) if impl == "xla" else {}
    out = rasterize_with_tiles(pts, f, mapping, image_size, config,
                               impl=impl, **kw)
    return jnp.sum(out.image ** 2) + jnp.sum(out.image_weight)

  g_pallas = jax.grad(loss, argnums=(0, 1))(points, feats, "pallas")
  g_xla = jax.grad(loss, argnums=(0, 1))(points, feats, "xla")
  for gp, gx in zip(g_pallas, g_xla):
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-7, atol=1e-9)


def _f32_truth_scene():
  """f32 scene + f64 ground-truth gradients (the f32 XLA fallback is
  itself ~2e-2 noisy at f32 — axis-gradient cancellation — so f32
  accuracy must be judged against the f64 truth, not against it)."""
  image_size = (64, 48)
  points, depth, feats = scene(0, 80, image_size)
  g_img64 = jax.random.normal(jax.random.PRNGKey(7), (48, 64, 3),
                              jnp.float64)

  config64 = RasterConfig(tile_size=8, points_per_chunk=8)
  mapping64 = map_to_tiles(points, depth, image_size, config64)

  def loss64(pts, f):
    out = rasterize_with_tiles(pts, f, mapping64, image_size, config64)
    return jnp.sum(out.image * g_img64)

  gp_t, gf_t = jax.grad(loss64, argnums=(0, 1))(points, feats)
  return (image_size, points.astype(jnp.float32),
          depth.astype(jnp.float32), feats.astype(jnp.float32),
          g_img64.astype(jnp.float32),
          np.asarray(gp_t, np.float32), np.asarray(gf_t, np.float32))


def _f32_grads(config, image_size, points, depth, feats, g_img):
  mapping = map_to_tiles(points, depth, image_size, config)

  def loss(pts, f):
    out = rasterize_with_tiles(pts, f, mapping, image_size, config)
    return jnp.sum(out.image * g_img)

  return jax.grad(loss, argnums=(0, 1))(points, feats)


def test_f32_packed_gradients_close_to_truth():
  """In f32 the backward packs slot-gradient rows as bf16 pairs and the
  gather table packs feature pairs (transport quantization); per-point
  sums must stay bf16-grade close to the f64 ground truth."""
  image_size, points, depth, feats, g_img, gp_t, gf_t = _f32_truth_scene()
  config = RasterConfig(tile_size=8, points_per_chunk=8)
  gp, gf = _f32_grads(config, image_size, points, depth, feats, g_img)
  rel = lambda a, b: float(np.abs(np.asarray(a) - b).max() / np.abs(b).max())
  assert rel(gp, gp_t) < 2e-2, rel(gp, gp_t)
  assert rel(gf, gf_t) < 2e-2, rel(gf, gf_t)


def test_f32_exact_transport_close_to_truth():
  """With exact_slot_gradients + exact_features the f32 pallas gradients
  must track the f64 truth tightly — isolates the conic->packed chain
  rule from bf16 transport quantization (measured ~2.2e-3, ~9x tighter
  than the f32 XLA fallback's own error)."""
  image_size, points, depth, feats, g_img, gp_t, gf_t = _f32_truth_scene()
  config = RasterConfig(tile_size=8, points_per_chunk=8,
                        exact_slot_gradients=True, exact_features=True)
  gp, gf = _f32_grads(config, image_size, points, depth, feats, g_img)
  rel = lambda a, b: float(np.abs(np.asarray(a) - b).max() / np.abs(b).max())
  assert rel(gp, gp_t) < 5e-3, rel(gp, gp_t)
  assert rel(gf, gf_t) < 5e-3, rel(gf, gf_t)


def test_saturation_early_exit_exact():
  """The forward's saturation compute-skip must be EXACT: skipped chunks
  have zero gated weights, so images and satchunk counts match the
  no-exit path bit-for-bit on a heavily saturating scene."""
  image_size = (32, 24)
  points, depth, feats = scene(5, 120, image_size)
  # opaque gaussians so transmittance collapses within a few chunks
  points = points.at[:, 6].set(0.95)

  outs, grads = {}, {}
  for ee in (False, True):
    config = RasterConfig(tile_size=8, points_per_chunk=8,
                          saturation_early_exit=ee)
    mapping = map_to_tiles(points, depth, image_size, config)
    outs[ee] = rasterize_with_tiles(points, feats, mapping, image_size,
                                    config)

    def loss(pts, f, cfg=config, m=mapping):
      out = rasterize_with_tiles(pts, f, m, image_size, cfg)
      return jnp.sum(out.image ** 2)

    grads[ee] = jax.grad(loss, argnums=(0, 1))(points, feats)

  np.testing.assert_array_equal(np.asarray(outs[False].image),
                                np.asarray(outs[True].image))
  np.testing.assert_array_equal(np.asarray(outs[False].image_weight),
                                np.asarray(outs[True].image_weight))
  # the flag also gates the BACKWARD's replay skip: both paths must
  # produce identical gradients (skipped iterations are exactly zero)
  for ga, gb in zip(grads[False], grads[True]):
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


@pytest.mark.quick
def test_visibility_sink_matches_forward():
  """Visibility delivered as the visibility_sink cotangent (riding the
  backward's gradient reduction) must equal the forward-path visibility
  (f64: the replay is exact)."""
  image_size = (48, 32)
  points, depth, feats = scene(11, 150, image_size)

  config_f = RasterConfig(tile_size=16, points_per_chunk=8,
                          compute_visibility=True)
  mapping = map_to_tiles(points, depth, image_size, config_f)
  out_f = rasterize_with_tiles(points, feats, mapping, image_size, config_f)

  config_s = RasterConfig(tile_size=16, points_per_chunk=8)
  vsink = jnp.zeros((150,), jnp.float64)

  def loss(vs):
    out = rasterize_with_tiles(points, feats, mapping, image_size,
                               config_s, visibility_sink=vs)
    assert out.visibility is None  # forward path skipped entirely
    return jnp.sum(out.image)

  vis_sink = jax.grad(loss)(vsink)
  np.testing.assert_allclose(np.asarray(vis_sink),
                             np.asarray(out_f.visibility),
                             rtol=1e-9, atol=1e-12)


def test_compacted_reduction_matches_full():
  """The saturation-aware gradient-reduction compaction
  (compact_visited_slots) drops only chunks whose slot gradients are
  exactly zero (never replayed by the backward); gradients, heuristics,
  and sink-visibility must match the full-K_cap reduction."""
  from taichi_gaussian_rasterizer_tpu.ops.raster import (
      probe_reduce_capacity)

  image_size = (32, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999,
                        compute_point_heuristic=True)
  n = 64
  key = jax.random.PRNGKey(21)
  # opaque gaussians piled on the same spot -> saturates in ~2 chunks
  points = jnp.concatenate([
      16.0 + 4.0 * jax.random.normal(key, (n, 2), jnp.float64),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 20.0, jnp.float64),
      jnp.full((n, 1), 0.95, jnp.float64),
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(22), (n, 3), jnp.float64)
  mapping = map_to_tiles(points, depth, image_size, config)

  cap = probe_reduce_capacity(points, mapping, config)
  k_cap = mapping.overlap_to_point.shape[0]
  assert cap < k_cap, (
      f"compaction must drop chunks on this saturating scene "
      f"(cap={cap}, k_cap={k_cap})")

  def grads(reduce_capacity):
    def loss(pts, f, s, vs):
      out = rasterize_with_tiles(pts, f, mapping, image_size, config,
                                 heuristic_sink=s, visibility_sink=vs,
                                 reduce_capacity=reduce_capacity)
      return jnp.sum(out.image ** 2) + jnp.sum(out.image_weight)
    sink = jnp.zeros((n, 2), jnp.float64)
    vsink = jnp.zeros((n,), jnp.float64)
    return jax.grad(loss, argnums=(0, 1, 2, 3))(points, feats, sink, vsink)

  for ga, gb in zip(grads(None), grads(cap)):
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-12, atol=1e-14)


def test_truncated_mapping_matches_full():
  """Saturation-front truncation (probe_visit_chunks + truncate_mapping)
  keeps only chunks ahead of each tile's saturation point; the image,
  weight, gradients, heuristics, and sink-visibility must match the
  untruncated render exactly (the removed chunks are the ones the
  early-exit skips, which contribute exactly zero by the blend gates)."""
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      probe_visit_chunks)

  image_size = (64, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999,
                        compute_point_heuristic=True)
  n = 128
  key = jax.random.PRNGKey(31)
  # opaque gaussians piled up -> front tiles saturate early; x spread
  # across several tiles so some tiles stay light (untruncated)
  points = jnp.concatenate([
      jnp.stack([8.0 + 48.0 * jax.random.uniform(key, (n,), jnp.float64),
                 16.0 + 3.0 * jax.random.normal(
                     jax.random.PRNGKey(32), (n,), jnp.float64)], axis=1),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 10.0, jnp.float64),
      jnp.full((n, 1), 0.9, jnp.float64),
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(33), (n, 3), jnp.float64)
  mapping = map_to_tiles(points, depth, image_size, config)

  visit, cap = probe_visit_chunks(points, mapping, config, margin_chunks=0)
  k_cap = mapping.overlap_to_point.shape[0]
  assert cap < k_cap, (
      f"truncation must drop chunks on this saturating scene "
      f"(cap={cap}, k_cap={k_cap})")

  def run(visit_args):
    def loss(pts, f, s, vs):
      out = rasterize_with_tiles(pts, f, mapping, image_size, config,
                                 heuristic_sink=s, visibility_sink=vs,
                                 **visit_args)
      return jnp.sum(out.image ** 2) + jnp.sum(out.image_weight)
    sink = jnp.zeros((n, 2), jnp.float64)
    vsink = jnp.zeros((n,), jnp.float64)
    g = jax.grad(loss, argnums=(0, 1, 2, 3))(points, feats, sink, vsink)
    out = rasterize_with_tiles(points, feats, mapping, image_size, config,
                               **visit_args)
    return out, g

  out_full, g_full = run({})
  out_tr, g_tr = run(dict(visit_chunks=visit, visit_capacity=cap))

  assert out_tr.bin_overflow is not None and not bool(out_tr.bin_overflow), (
      "snug truncation of the probed frame must not flag")
  np.testing.assert_array_equal(np.asarray(out_full.image),
                                np.asarray(out_tr.image))
  np.testing.assert_array_equal(np.asarray(out_full.image_weight),
                                np.asarray(out_tr.image_weight))
  for ga, gb in zip(g_full, g_tr):
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-12, atol=1e-14)


def test_truncation_guard_drifting_training_run():
  """TruncationGuard: a 2D training run whose scene drifts past its
  probed saturation fronts mid-training must (a) trigger at least one
  auto-reprobe, (b) never consume a cropped frame (every step's loss and
  gradients match the untruncated render bitwise), and (c) still
  converge. This is the library form of the resize-on-overflow training
  recipe (VERDICT r4 item 6): re-probe and re-render the SAME frame
  before stepping."""
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      TruncationGuard)

  image_size = (64, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999)
  n = 128
  key = jax.random.PRNGKey(41)
  points0 = jnp.concatenate([
      jnp.stack([8.0 + 48.0 * jax.random.uniform(key, (n,), jnp.float64),
                 16.0 + 3.0 * jax.random.normal(
                     jax.random.PRNGKey(42), (n,), jnp.float64)], axis=1),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 10.0, jnp.float64),
      jnp.full((n, 1), 0.9, jnp.float64),    # opaque: deep early fronts
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(43), (n, 3), jnp.float64)
  capacity = 4096

  # target: the same scene faded to alpha 0.45 — descending toward it
  # drags every alpha down, so tiles saturate later and later and the
  # initially-probed fronts become stale (the drift direction that
  # actually crops; growing opacity only shortens fronts)
  target = rasterize_with_tiles(
      points0.at[:, 6].set(0.45), feats,
      map_to_tiles(points0, depth, image_size, config, capacity=capacity),
      image_size, config).image

  def loss_fn(pts, mapping, visit_args):
    out = rasterize_with_tiles(pts, feats, mapping, image_size, config,
                               **visit_args)
    return jnp.mean((out.image - target) ** 2), out.bin_overflow

  guard = TruncationGuard(config, margin_chunks=0)
  points = points0
  losses = []
  for step in range(25):
    mapping = map_to_tiles(points, depth, image_size, config,
                           capacity=capacity)

    def frame(vc, cap, pts=points, mapping=mapping):
      (loss, overflow), grads = jax.value_and_grad(
          lambda p: loss_fn(p, mapping, dict(visit_chunks=vc,
                                             visit_capacity=cap)),
          has_aux=True)(pts)
      return (loss, grads), overflow

    (loss, grads) = guard.render(points, mapping, frame)
    # the guard's contract, checked the strong way: the consumed frame
    # must equal the untruncated render — loss bitwise, gradients to
    # reduction-order rounding (the truncated stream's point reduction
    # sums in a different order; same tolerance as
    # test_truncated_mapping_matches_full). A cropped frame would be
    # off by whole dropped-gaussian contributions, not ulps.
    (loss_full, _), grads_full = jax.value_and_grad(
        lambda p: loss_fn(p, mapping, {}), has_aux=True)(points)
    assert float(loss) == float(loss_full), f"cropped loss at step {step}"
    np.testing.assert_allclose(np.asarray(grads), np.asarray(grads_full),
                               rtol=1e-12, atol=1e-14)

    losses.append(float(loss))
    points = points - 40.0 * grads
    points = points.at[:, 6].set(jnp.clip(points[:, 6], 0.05, 0.99))

  assert guard.reprobes >= 1, (
      "the drift never crossed the probed fronts — the scenario is not "
      f"exercising the guard (losses {losses[:3]}...{losses[-3:]})")
  assert losses[-1] < 0.5 * losses[0], f"did not converge: {losses}"


def test_truncated_mapping_flags_undersized_visits():
  """Cutting a tile's kept front BELOW its saturation point must set
  RasterOut.bin_overflow (the render is then cropped, never silent)."""
  image_size = (32, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8)
  points, depth, feats = scene(41, 120, image_size)

  mapping = map_to_tiles(points, depth, image_size, config)
  n_tiles = mapping.tile_ranges.shape[0]
  # random_2d_gaussians scenes never saturate: ANY truncation must flag
  visit = jnp.ones((n_tiles,), jnp.int32)
  g = config.points_per_chunk
  cap = int(n_tiles) * g
  out = rasterize_with_tiles(points, feats, mapping, image_size, config,
                             visit_chunks=visit, visit_capacity=cap)
  assert bool(out.bin_overflow)


def test_truncated_mapping_flags_capacity_drift():
  """If the kept fronts outgrow the static visit_capacity (footprint
  drift between probe and render), runs are cropped and the flag must
  fire even when every surviving tile saturates."""
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      probe_visit_chunks)

  image_size = (64, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999)
  n = 128
  key = jax.random.PRNGKey(51)
  points = jnp.concatenate([
      jnp.stack([8.0 + 48.0 * jax.random.uniform(key, (n,), jnp.float64),
                 16.0 + 3.0 * jax.random.normal(
                     jax.random.PRNGKey(52), (n,), jnp.float64)], axis=1),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 10.0, jnp.float64),
      jnp.full((n, 1), 0.9, jnp.float64),
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(53), (n, 3), jnp.float64)
  mapping = map_to_tiles(points, depth, image_size, config)

  visit, cap = probe_visit_chunks(points, mapping, config, margin_chunks=0)
  g = config.points_per_chunk
  assert cap > g, "scene too small to undersize"
  out = rasterize_with_tiles(points, feats, mapping, image_size, config,
                             visit_chunks=visit, visit_capacity=cap - g)
  assert bool(out.bin_overflow), "capacity drift crop must flag"


def test_truncated_mapping_forward_visibility():
  """The forward-computed visibility (config.compute_visibility, no
  sink) must survive truncation exactly: the per-slot visibility buffer
  shrinks to the kept runs and its reduction runs without the mapper's
  point_offsets (stale after truncation)."""
  from taichi_gaussian_rasterizer_tpu.ops.raster.function import (
      probe_visit_chunks)

  image_size = (64, 32)
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        saturate_threshold=0.999,
                        compute_visibility=True)
  n = 128
  key = jax.random.PRNGKey(61)
  points = jnp.concatenate([
      jnp.stack([8.0 + 48.0 * jax.random.uniform(key, (n,), jnp.float64),
                 16.0 + 3.0 * jax.random.normal(
                     jax.random.PRNGKey(62), (n,), jnp.float64)], axis=1),
      jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float64), (n, 1)),
      jnp.full((n, 2), 10.0, jnp.float64),
      jnp.full((n, 1), 0.9, jnp.float64),
  ], axis=1)
  depth = jnp.linspace(0.1, 0.9, n, dtype=jnp.float64)
  feats = jax.random.uniform(jax.random.PRNGKey(63), (n, 3), jnp.float64)
  mapping = map_to_tiles(points, depth, image_size, config)

  visit, cap = probe_visit_chunks(
      points, mapping, config.replace(compute_visibility=False),
      margin_chunks=0)
  assert cap < mapping.overlap_to_point.shape[0]

  full = rasterize_with_tiles(points, feats, mapping, image_size, config)
  tr = rasterize_with_tiles(points, feats, mapping, image_size, config,
                            visit_chunks=visit, visit_capacity=cap)
  assert not bool(tr.bin_overflow)
  # allclose, not equal: the truncated stream orders slots differently
  # through the point reduction's sort (boundary-chunk copies split
  # across runs), so per-point sums differ by summation order (ulps).
  # The IMAGE stays bit-exact (per-pixel blend order is unchanged).
  np.testing.assert_allclose(np.asarray(full.visibility),
                             np.asarray(tr.visibility),
                             rtol=1e-12, atol=1e-13)
