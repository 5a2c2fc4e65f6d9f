"""End-to-end 2D training integration test (reference examples +
test_benchmarks smoke analog): the trainer must converge and split/prune
must keep optimizer state consistent."""

import jax
import jax.numpy as jnp
import numpy as np

from taichi_gaussian_rasterizer_tpu import RasterConfig
from taichi_gaussian_rasterizer_tpu.examples.fit_image_gaussians import (
    fit, make_epochs, psnr, synthetic_target, take_n)


def test_make_epochs_covers_iters():
  for total in (100, 1000, 3777):
    assert sum(make_epochs(total, 10, 100)) == total


def test_take_n():
  t = np.asarray([5.0, 1.0, 3.0, 2.0, 4.0])
  assert take_n(t, 2).tolist() == [False, True, False, True, False]
  assert take_n(t, 2, descending=True).tolist() == [True, False, False,
                                                    False, True]


def test_fit_image_converges():
  ref = synthetic_target(jax.random.PRNGKey(1), (96, 64))
  config = RasterConfig(tile_size=16, points_per_chunk=8,
                        compute_point_heuristic=True)
  logs = []
  params, image = fit(ref, n=150, target=400, total_iters=80,
                      config=config, seed=0, log=logs.append)

  final_psnr = float(psnr(image, ref))
  assert final_psnr > 18, f"expected convergence, got psnr {final_psnr}"
  assert params.num_points == 400
  assert np.isfinite(np.asarray(params.tensors["position"])).all()
  # optimizer state stayed in sync through split/prune
  assert params.state["position"].m.shape[0] == 400
  assert params.total_weight.shape == (400,)
  assert len(logs) > 2
