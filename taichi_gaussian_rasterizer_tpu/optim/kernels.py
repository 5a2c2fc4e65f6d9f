"""Sparse/weighted optimizer update math.

Rebuild of the reference's Taichi step kernels
(/root/reference/taichi_splatting/optim/fractional_adam.py,
fractional_laprop.py) as dense, mask-free jnp: the per-point fractional
weight w raises the EMA decay to the w-th power
(`lerp(beta^w, m, g)`, fractional_adam.py:30-43), so w = 0 is *exactly* a
no-op (beta^0 = 1) — invisible points need no gather/scatter on TPU, the
whole update is a dense (N, D) vector op.

Variants (reference fractional.py:113-121):
* scalar: per-component second moment v (N, D)
* vector: one second moment per point, the squared gradient norm (N,)
* local_vector: vector, with the gradient rotated into a per-point basis
  before the step and back after (fractional.py:125-138)
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def saturate(x):
  """Step damping 1 - exp(-2x) (reference fractional.py:149-150)."""
  return 1.0 - jnp.exp(-2.0 * x)


def _ema(decay, old, new):
  """EMA with per-element decay (reference lerp(t,a,b)=a*t+b*(1-t))."""
  return old * decay + new * (1.0 - decay)


class MomentState(NamedTuple):
  m: jax.Array  # (N, D) first moment
  v: jax.Array  # (N, D) scalar type / (N,) vector type second moment


def init_state(param: jax.Array, kind: str) -> MomentState:
  n, d = param.shape
  m = jnp.zeros((n, d), param.dtype)
  v = jnp.zeros((n,) if kind in ("vector", "local_vector") else (n, d),
                param.dtype)
  return MomentState(m, v)


def _bias_factors(betas, total_weight, bias_correction):
  """(1 - beta^total) factors, nan-safe at total == 0 (never-stepped
  points, where the step is zero anyway because weight == 0)."""
  beta1, beta2 = betas
  stepped = (total_weight > 0)[:, None]
  t = jnp.where(stepped, total_weight[:, None], 1.0)
  if not bias_correction:
    one = jnp.ones_like(t)
    return one, one
  return (jnp.where(stepped, 1.0 - beta1 ** t, 1.0),
          jnp.where(stepped, 1.0 - beta2 ** t, 1.0))


def adam_lr_step(grad: jax.Array, state: MomentState, weight: jax.Array,
                 total_weight: jax.Array, betas: Tuple[float, float],
                 eps: float, bias_correction: bool, kind: str):
  """Fractional Adam (reference fractional_adam.py:13-85).

  grad: (N, D); weight: (N,) fractional step weights (0 = skip);
  total_weight: (N,) accumulated weights *including* this step.
  Returns (lr_step (N, D) to be scaled by lr, new MomentState).
  """
  beta1, beta2 = betas
  w = weight[:, None]
  grad = jnp.where(w > 0, grad, 0.0)  # guard NaN grads at skipped points

  m = _ema(beta1 ** w, state.m, grad)
  if kind in ("vector", "local_vector"):
    norm = jnp.sum(grad * grad, axis=1)
    v = _ema(beta2 ** weight, state.v, norm)
    denom = jnp.maximum(jnp.sqrt(v), eps)[:, None]
  else:
    v = _ema(beta2 ** w, state.v, grad * grad)
    denom = jnp.maximum(jnp.sqrt(v), eps)

  bias1, bias2 = _bias_factors(betas, total_weight, bias_correction)
  lr_step = m / denom * (jnp.sqrt(bias2) / bias1)
  return lr_step, MomentState(m, v)


def laprop_lr_step(grad: jax.Array, state: MomentState, weight: jax.Array,
                   total_weight: jax.Array, betas: Tuple[float, float],
                   eps: float, bias_correction: bool, kind: str):
  """Fractional LaProp (reference fractional_laprop.py:13-85): the
  gradient is normalized by sqrt(v) *before* the momentum average."""
  beta1, beta2 = betas
  w = weight[:, None]
  grad = jnp.where(w > 0, grad, 0.0)

  bias1, bias2 = _bias_factors(betas, total_weight, bias_correction)

  if kind in ("vector", "local_vector"):
    norm = jnp.sum(grad * grad, axis=1)
    v = _ema(beta2 ** weight, state.v, norm)
    normed = grad / jnp.maximum(jnp.sqrt(v[:, None] / bias2), eps)
  else:
    v = _ema(beta2 ** w, state.v, grad * grad)
    normed = grad / jnp.maximum(jnp.sqrt(v / bias2), eps)

  m = _ema(beta1 ** w, state.m, normed)
  lr_step = m / bias1
  return lr_step, MomentState(m, v)


KERNELS = {"adam": adam_lr_step, "laprop": laprop_lr_step}


def rotate_to_basis(x: jax.Array, basis: jax.Array, inverse: bool):
  """Apply (or invert) a per-point basis to (N, D) vectors
  (reference fractional.py:125-138)."""
  if inverse:
    basis = jnp.linalg.inv(basis)
  return jnp.einsum("nij,nj->ni", basis, x)


def exp_lerp(t, a, b):
  """Numerically-stable log-space lerp (visibility_aware.py:17-20)."""
  mx = jnp.maximum(a, b)
  return mx + jnp.log(jnp.exp(a - mx) * (1 - t) + jnp.exp(b - mx) * t)


def power_lerp(t, a, b, k: int = 4):
  """lerp in the k-th power domain (visibility_aware.py:30-31)."""
  return (a ** k + (b ** k - a ** k) * t) ** (1.0 / k)


def update_visibility(running_vis: jax.Array, visibility: jax.Array,
                      visible: jax.Array, beta: float = 0.9,
                      eps: float = 1e-12, k: int = 4):
  """Running-visibility EMA and the resulting step weight
  (reference visibility_aware.py:34-44), mask form.

  visible: (N,) bool; invisible entries keep their running value and get
  weight 0. Returns (new_running_vis, weight)."""
  updated = power_lerp(beta, visibility, running_vis, k=k)
  new_running = jnp.where(visible, updated, running_vis)
  weight = jnp.where(visible,
                     visibility / jnp.maximum(updated, eps), 0.0)
  return new_running, weight
