"""Parameter + optimizer-state management with point resampling.

Rebuild of /root/reference/taichi_splatting/optim/parameter_class.py and
the optimizer classes of fractional.py / visibility_aware.py as one
functional pytree: a `ParameterClass` holds named tensors, per-group
moment state, shared state (total_weight, running_vis), and learning
rates, and every operation returns a new instance.

Key reference behaviors preserved:
* indexing (`params[mask]`) filters parameters *and* optimizer state
  (parameter_class.py:212-220)
* `append_tensors` concatenates with zero-initialized state (:222-236)
* per-group learning-rate control (set_learning_rate / update_groups,
  :66-90) — learning rates are traced data, so LR schedules don't
  recompile
* state_dict / from_state_dict checkpointing (:93-116)
* `step` applies the fractional / visibility-aware sparse update — here
  in dense mask form (see kernels.py): weight 0 is exactly a no-op.
"""

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels
from .kernels import MomentState


@dataclass(frozen=True)
class GroupConfig:
  """Static per-parameter-group configuration (reference fractional.py
  Group minus the tensors)."""
  type: str = "scalar"          # scalar | vector | local_vector
  betas: Tuple[float, float] = (0.9, 0.999)
  eps: float = 1e-16
  bias_correction: bool = True


@dataclass(frozen=True)
class OptimizerSpec:
  """Which update rule `step` applies (reference classes
  FractionalAdam/LaProp, SparseAdam/LaProp, VisibilityAwareAdam/LaProp)."""
  kernel: str = "adam"          # adam | laprop
  visibility_aware: bool = False
  vis_beta: float = 0.9  # matches the reference VisibilityOptimizer default
  vis_smooth: float = 0.01
  grad_scale: float = 1.0


FractionalAdam = OptimizerSpec(kernel="adam")
FractionalLaProp = OptimizerSpec(kernel="laprop")
SparseAdam = FractionalAdam          # step(weight=visible mask as 0/1)
SparseLaProp = FractionalLaProp
VisibilityAwareAdam = OptimizerSpec(kernel="adam", visibility_aware=True)
VisibilityAwareLaProp = OptimizerSpec(kernel="laprop", visibility_aware=True)


@dataclass(frozen=True)
class ParameterClass:
  tensors: Dict[str, jax.Array]
  state: Dict[str, MomentState]
  learning_rates: Dict[str, jax.Array]
  total_weight: jax.Array              # (N,)
  running_vis: jax.Array               # (N,)
  point_lr: Dict[str, Optional[jax.Array]]
  mask_lr: Dict[str, Optional[jax.Array]]
  groups: Tuple[Tuple[str, GroupConfig], ...]   # static
  optimizer: OptimizerSpec                      # static

  # ------------------------------------------------------------------
  @staticmethod
  def create(tensors: Dict[str, jax.Array],
             parameter_groups: Dict[str, Dict[str, Any]],
             optimizer: OptimizerSpec = VisibilityAwareAdam,
             lr: float = 0.001,
             betas: Tuple[float, float] = (0.9, 0.999),
             eps: float = 1e-16,
             bias_correction: bool = True) -> "ParameterClass":
    """parameter_groups: name -> {lr, type, betas, eps, bias_correction,
    mask_lr, point_lr} (all optional; name must exist in tensors)."""
    n = next(iter(tensors.values())).shape[0]
    groups, lrs, state, point_lr, mask_lr = {}, {}, {}, {}, {}
    for name, cfg in parameter_groups.items():
      assert name in tensors, f"group {name} not in tensors"
      groups[name] = GroupConfig(
          type=cfg.get("type", "scalar"),
          betas=tuple(cfg.get("betas", betas)),
          eps=cfg.get("eps", eps),
          bias_correction=cfg.get("bias_correction", bias_correction))
      lrs[name] = jnp.asarray(cfg.get("lr", lr), jnp.float32)
      state[name] = kernels.init_state(_flat(tensors[name]),
                                       groups[name].type)
      point_lr[name] = cfg.get("point_lr", None)
      mask_lr[name] = cfg.get("mask_lr", None)

    return ParameterClass(
        tensors=dict(tensors),
        state=state,
        learning_rates=lrs,
        total_weight=jnp.zeros((n,), jnp.float32),
        running_vis=jnp.zeros((n,), jnp.float32),
        point_lr=point_lr,
        mask_lr=mask_lr,
        groups=tuple(sorted(groups.items())),
        optimizer=optimizer)

  # ------------------------------------------------------------------
  @property
  def group_dict(self) -> Dict[str, GroupConfig]:
    return dict(self.groups)

  @property
  def batch_size(self):
    return next(iter(self.tensors.values())).shape[:1]

  @property
  def num_points(self) -> int:
    return self.batch_size[0]

  def keys(self):
    return self.tensors.keys()

  def optimized_keys(self):
    return [k for k, _ in self.groups]

  def items(self):
    return self.tensors.items()

  def __getattr__(self, name):
    tensors = object.__getattribute__(self, "tensors")
    if name in tensors:
      return tensors[name]
    raise AttributeError(name)

  def replace(self, **kwargs) -> "ParameterClass":
    return replace(self, **kwargs)

  def replace_tensors(self, **tensors) -> "ParameterClass":
    return replace(self, tensors={**self.tensors, **tensors})

  # -- learning rates -------------------------------------------------
  def set_learning_rate(self, **kwargs) -> "ParameterClass":
    lrs = dict(self.learning_rates)
    for k, v in kwargs.items():
      assert k in lrs, f"unknown group {k}"
      lrs[k] = jnp.asarray(v, jnp.float32)
    return replace(self, learning_rates=lrs)

  def update_groups(self, **kwargs) -> "ParameterClass":
    return self.set_learning_rate(
        **{k: v["lr"] for k, v in kwargs.items() if "lr" in v})

  # -- point resampling ------------------------------------------------
  def __getitem__(self, idx) -> "ParameterClass":
    """Filter points: indexes/masks apply to parameters and every piece
    of per-point optimizer state (parameter_class.py:212-220)."""
    take = lambda x: None if x is None else x[idx]
    return replace(
        self,
        tensors={k: take(v) for k, v in self.tensors.items()},
        state={k: MomentState(take(s.m), take(s.v))
               for k, s in self.state.items()},
        total_weight=take(self.total_weight),
        running_vis=take(self.running_vis),
        point_lr={k: take(v) for k, v in self.point_lr.items()},
    )

  def append_tensors(self, tensors: Dict[str, jax.Array]) -> "ParameterClass":
    """Concatenate new points with zero-initialized optimizer state
    (parameter_class.py:222-236)."""
    assert set(tensors.keys()) == set(self.tensors.keys()), \
        f"keys mismatch: {tensors.keys()} != {self.tensors.keys()}"
    m = next(iter(tensors.values())).shape[0]
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    new_state = {}
    for k, s in self.state.items():
      zeros = kernels.init_state(_flat(tensors[k]), self.group_dict[k].type)
      new_state[k] = MomentState(cat(s.m, zeros.m), cat(s.v, zeros.v))
    return replace(
        self,
        tensors={k: cat(v, tensors[k]) for k, v in self.tensors.items()},
        state=new_state,
        total_weight=cat(self.total_weight, jnp.zeros((m,), jnp.float32)),
        running_vis=cat(self.running_vis, jnp.zeros((m,), jnp.float32)),
        point_lr={k: (None if v is None else
                      cat(v, jnp.zeros((m,), v.dtype)))
                  for k, v in self.point_lr.items()},
    )

  def concat(self, other: "ParameterClass") -> "ParameterClass":
    return self.append_tensors(other.tensors)

  # -- the optimizer step ----------------------------------------------
  def step(self, grads: Dict[str, jax.Array],
           visibility: Optional[jax.Array] = None,
           weight: Optional[jax.Array] = None,
           basis: Optional[jax.Array] = None) -> "ParameterClass":
    """Sparse optimizer step in dense mask form.

    grads: name -> (N, ...) gradients for (a subset of) optimized keys.
    visibility: (N,) per-point visibility, 0 = not visible (required for
      visibility-aware optimizers; reference visibility_aware.py:72-103).
    weight: (N,) explicit fractional weights (fractional optimizers,
      reference fractional.py:171-198); defaults to (visibility > 0).
    basis: (N, D, D) per-point basis for local_vector groups.
    """
    spec = self.optimizer
    if spec.visibility_aware:
      assert visibility is not None, "visibility-aware step needs visibility"
      visible = visibility > 0
      running_vis, weight = kernels.update_visibility(
          self.running_vis, visibility, visible, beta=spec.vis_beta)
    else:
      if weight is None:
        assert visibility is not None, "need weight or visibility"
        weight = (visibility > 0).astype(jnp.float32)
      running_vis = self.running_vis
      visible = weight > 0

    total_weight = self.total_weight + weight
    damp = kernels.saturate(weight)[:, None]

    new_tensors = dict(self.tensors)
    new_state = dict(self.state)
    for name, cfg in self.groups:
      if name not in grads or grads[name] is None:
        continue
      param = self.tensors[name]
      grad = _flat(grads[name]).astype(jnp.float32)

      if spec.visibility_aware:
        scale = spec.grad_scale / (visibility + spec.vis_smooth)
        grad = jnp.where(visible[:, None], grad * scale[:, None], 0.0)

      if cfg.type == "local_vector":
        assert basis is not None, "local_vector needs a basis"
        grad = kernels.rotate_to_basis(grad, basis, inverse=True)

      lr_step, state = kernels.KERNELS[spec.kernel](
          grad, self.state[name], weight, total_weight, cfg.betas,
          cfg.eps, cfg.bias_correction, cfg.type)

      if cfg.type == "local_vector":
        lr_step = kernels.rotate_to_basis(lr_step, basis, inverse=False)

      if self.mask_lr[name] is not None:
        lr_step = lr_step * self.mask_lr[name][None, :]
      if self.point_lr[name] is not None:
        lr_step = lr_step * self.point_lr[name][:, None]

      lr = self.learning_rates[name].astype(param.dtype)
      update = (lr_step * damp * lr).astype(param.dtype)
      new_tensors[name] = param - update.reshape(param.shape)
      new_state[name] = state

    return replace(self, tensors=new_tensors, state=new_state,
                   total_weight=total_weight, running_vis=running_vis)

  # -- checkpointing -----------------------------------------------------
  def state_dict(self) -> Dict[str, Any]:
    """Serializable (numpy) snapshot: parameters, optimizer state, and
    group hyperparameters (parameter_class.py:93-116)."""
    to_np = lambda t: jax.tree.map(np.asarray, t)
    return {
        "tensors": to_np(self.tensors),
        "state": {k: {"m": np.asarray(s.m), "v": np.asarray(s.v)}
                  for k, s in self.state.items()},
        "learning_rates": to_np(self.learning_rates),
        "total_weight": np.asarray(self.total_weight),
        "running_vis": np.asarray(self.running_vis),
        "point_lr": to_np(self.point_lr),
        "mask_lr": to_np(self.mask_lr),
        "groups": {k: vars(v) for k, v in self.groups},
        "optimizer": vars(self.optimizer),
    }

  @staticmethod
  def from_state_dict(state: Dict[str, Any]) -> "ParameterClass":
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    groups = tuple(sorted(
        (k, GroupConfig(**{**v, "betas": tuple(v["betas"])}))
        for k, v in state["groups"].items()))
    return ParameterClass(
        tensors=to_j(state["tensors"]),
        state={k: MomentState(jnp.asarray(s["m"]), jnp.asarray(s["v"]))
               for k, s in state["state"].items()},
        learning_rates=to_j(state["learning_rates"]),
        total_weight=jnp.asarray(state["total_weight"]),
        running_vis=jnp.asarray(state["running_vis"]),
        point_lr={k: None if v is None else jnp.asarray(v)
                  for k, v in state["point_lr"].items()},
        mask_lr={k: None if v is None else jnp.asarray(v)
                 for k, v in state["mask_lr"].items()},
        groups=groups,
        optimizer=OptimizerSpec(**state["optimizer"]))


def _flat(x: jax.Array) -> jax.Array:
  return x.reshape(x.shape[0], -1)


jax.tree_util.register_dataclass(
    ParameterClass,
    data_fields=["tensors", "state", "learning_rates", "total_weight",
                 "running_vis", "point_lr", "mask_lr"],
    meta_fields=["groups", "optimizer"])
