"""Optimizer layer tests: fractional/visibility-aware Adam & LaProp and
ParameterClass state management (reference optim/ suite analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_gaussian_rasterizer_tpu.optim import (
    FractionalAdam, FractionalLaProp, ParameterClass, VisibilityAwareAdam)
from taichi_gaussian_rasterizer_tpu.optim import kernels


def make_params(n=16, d=3, seed=0, optimizer=FractionalAdam, **group_kw):
  key = jax.random.PRNGKey(seed)
  tensors = {
      "position": jax.random.normal(key, (n, d), jnp.float32),
      "alpha": jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 1)),
      "aux": jnp.arange(n, dtype=jnp.float32),  # non-optimized tensor
  }
  groups = {
      "position": dict(lr=0.1, type=group_kw.pop("pos_type", "scalar"),
                       **group_kw),
      "alpha": dict(lr=0.05, type="scalar"),
  }
  return ParameterClass.create(tensors, groups, optimizer=optimizer)


def numpy_adam_step(param, grad, m, v, t, lr, betas=(0.9, 0.999), eps=1e-16):
  """Standard Adam with max(sqrt(v), eps) denominator and the reference's
  1 - exp(-2) damping at weight 1 (fractional.py:149-150,191)."""
  b1, b2 = betas
  m = b1 * m + (1 - b1) * grad
  v = b2 * v + (1 - b2) * grad * grad
  bias = np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
  step = m / np.maximum(np.sqrt(v), eps) * bias * lr
  damp = 1 - np.exp(-2.0)
  return param - step * damp, m, v


@pytest.mark.quick
def test_fractional_adam_matches_dense_adam():
  """With every point visible at weight 1, fractional Adam (scalar) must
  match a standard numpy Adam with the saturate(1) damping, step after
  step."""
  p = make_params(n=8, d=3)
  pos = np.asarray(p.tensors["position"], np.float64)
  m = np.zeros_like(pos)
  v = np.zeros_like(pos)

  key = jax.random.PRNGKey(42)
  vis = jnp.ones((8,))
  for t in range(1, 6):
    key, k = jax.random.split(key)
    g = jax.random.normal(k, pos.shape, jnp.float32)
    p = p.step({"position": g}, visibility=vis)
    pos, m, v = numpy_adam_step(pos, np.asarray(g, np.float64), m, v, t,
                                lr=0.1)
    np.testing.assert_allclose(np.asarray(p.tensors["position"]), pos,
                               rtol=2e-5, atol=2e-6)


def test_invisible_points_untouched():
  p = make_params(n=10)
  g = {"position": jnp.ones((10, 3)), "alpha": jnp.ones((10, 1))}
  vis = jnp.asarray([1.0] * 5 + [0.0] * 5)
  p2 = p.step(g, visibility=vis)

  np.testing.assert_array_equal(np.asarray(p2.tensors["position"][5:]),
                                np.asarray(p.tensors["position"][5:]))
  assert (np.asarray(p2.state["position"].m[5:]) == 0).all()
  assert not (np.asarray(p2.tensors["position"][:5])
              == np.asarray(p.tensors["position"][:5])).all()
  np.testing.assert_array_equal(np.asarray(p2.total_weight),
                                np.asarray(vis))


def test_fractional_weight_halves():
  """Two half-weight steps with the same gradient accumulate the same
  total_weight as one full step, and move less far per step."""
  p = make_params(n=4)
  g = {"position": jnp.full((4, 3), 0.5)}
  p_full = p.step(g, weight=jnp.ones((4,)), visibility=None)
  p_half = p.step(g, weight=jnp.full((4,), 0.5))
  p_half = p_half.step(g, weight=jnp.full((4,), 0.5))

  np.testing.assert_allclose(np.asarray(p_half.total_weight),
                             np.asarray(p_full.total_weight))
  d_full = np.abs(np.asarray(p_full.tensors["position"]
                             - p.tensors["position"])).mean()
  d_half1 = np.abs(np.asarray(p_half.tensors["position"]
                              - p.tensors["position"])).mean()
  assert d_half1 > 0


@pytest.mark.parametrize("opt", [FractionalAdam, FractionalLaProp,
                                 VisibilityAwareAdam])
def test_convergence_quadratic(opt):
  """Each optimizer minimizes a simple quadratic on visible points."""
  target = jnp.asarray([[1.0, -2.0, 0.5]] * 6)
  p = make_params(n=6, seed=3, optimizer=opt)
  vis = jnp.ones((6,)) * 0.8

  for _ in range(300):
    g = {"position": 2 * (p.tensors["position"] - target)}
    p = p.step(g, visibility=vis)

  np.testing.assert_allclose(np.asarray(p.tensors["position"]),
                             np.asarray(target), atol=0.05)


def test_local_vector_identity_basis_matches_vector():
  p_vec = make_params(n=5, pos_type="vector")
  p_loc = make_params(n=5, pos_type="local_vector")
  g = {"position": jax.random.normal(jax.random.PRNGKey(1), (5, 3))}
  eye = jnp.tile(jnp.eye(3)[None], (5, 1, 1))
  vis = jnp.ones((5,))

  a = p_vec.step(g, visibility=vis)
  b = p_loc.step(g, visibility=vis, basis=eye)
  np.testing.assert_allclose(np.asarray(a.tensors["position"]),
                             np.asarray(b.tensors["position"]), rtol=1e-6)


def test_visibility_weighting_formula():
  """Running-visibility power-lerp and step weight match a direct numpy
  evaluation (reference visibility_aware.py:30-44)."""
  running = jnp.asarray([0.5, 0.0, 2.0])
  vis = jnp.asarray([1.0, 3.0, 0.0])
  visible = vis > 0
  new_run, w = kernels.update_visibility(running, vis, visible, beta=0.5)

  up = (np.asarray(vis) ** 4
        + (np.asarray(running) ** 4 - np.asarray(vis) ** 4) * 0.5) ** 0.25
  np.testing.assert_allclose(np.asarray(new_run)[:2], up[:2], rtol=1e-6)
  assert float(new_run[2]) == 2.0          # invisible: unchanged
  np.testing.assert_allclose(np.asarray(w)[:2],
                             np.asarray(vis)[:2] / up[:2], rtol=1e-6)
  assert float(w[2]) == 0.0


@pytest.mark.quick
def test_resampling_preserves_state():
  p = make_params(n=10)
  g = {"position": jnp.ones((10, 3))}
  p = p.step(g, visibility=jnp.ones((10,)))

  mask = jnp.asarray([True, False] * 5)
  filtered = p[mask]
  assert filtered.num_points == 5
  np.testing.assert_array_equal(np.asarray(filtered.state["position"].m),
                                np.asarray(p.state["position"].m[mask]))
  np.testing.assert_array_equal(np.asarray(filtered.tensors["aux"]),
                                np.asarray(p.tensors["aux"][mask]))

  grown = filtered.append_tensors(
      {k: v[:3] for k, v in filtered.tensors.items()})
  assert grown.num_points == 8
  assert (np.asarray(grown.state["position"].m[5:]) == 0).all()
  assert (np.asarray(grown.total_weight[5:]) == 0).all()


def test_set_learning_rate_no_recompile():
  p = make_params(n=4)
  traces = []

  @jax.jit
  def do_step(p, g):
    traces.append(1)
    return p.step(g, visibility=jnp.ones((4,)))

  g = {"position": jnp.ones((4, 3))}
  p = do_step(p, g)
  p = p.set_learning_rate(position=0.5)
  p = do_step(p, g)
  assert len(traces) == 1, "learning-rate change must not retrace"


def test_state_dict_roundtrip():
  p = make_params(n=6)
  p = p.step({"position": jnp.ones((6, 3))}, visibility=jnp.ones((6,)))
  sd = p.state_dict()
  q = ParameterClass.from_state_dict(sd)

  np.testing.assert_array_equal(np.asarray(q.tensors["position"]),
                                np.asarray(p.tensors["position"]))
  np.testing.assert_array_equal(np.asarray(q.state["position"].v),
                                np.asarray(p.state["position"].v))
  assert q.group_dict == p.group_dict
  assert q.optimizer == p.optimizer
  # pickleable (reference __getstate__/__setstate__, :100-104)
  import pickle
  q2 = pickle.loads(pickle.dumps(sd))
  assert set(q2["tensors"].keys()) == set(sd["tensors"].keys())


def test_attribute_access():
  p = make_params(n=4)
  assert p.position.shape == (4, 3)
  assert p.aux.shape == (4,)
  with pytest.raises(AttributeError):
    _ = p.nonexistent
