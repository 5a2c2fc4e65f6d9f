"""2D gaussian image fitting — the end-to-end training example.

Rebuild of /root/reference/taichi_splatting/examples/fit_image_gaussians.py:
fit a target image with 2D gaussians by gradient descent, growing the
point count with split/prune driven by the backward-pass heuristics.

JAX structure: each epoch is a jitted `lax.scan` over steps at a fixed
point count; split/prune runs on host between epochs (the point count
changes, so the next epoch re-specializes — the JAX analog of the
reference's dynamic resampling).

Run:  python -m taichi_gaussian_rasterizer_tpu.examples.fit_image_gaussians
      [--image img.png] [--n 1000] [--target 20000] [--iters 2000]
"""

import argparse
import functools
import math
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterConfig
from ..data_types import Gaussians2D
from ..models.renderer2d import (point_basis, project_gaussians2d,
                                 uniform_split_gaussians2d)
from ..ops.mapper import map_to_tiles
from ..ops.raster import rasterize_with_tiles
from ..optim import ParameterClass, VisibilityAwareLaProp
from ..utils.random_data import random_2d_gaussians

TENSOR_KEYS = ("position", "z_depth", "log_scaling", "rotation",
               "alpha_logit", "feature")


def gaussians_to_tensors(g: Gaussians2D):
  return {k: getattr(g, k) for k in TENSOR_KEYS}


def tensors_to_gaussians(t) -> Gaussians2D:
  return Gaussians2D(**{k: t[k] for k in TENSOR_KEYS})


def psnr(a, b):
  """CPSNR (reference fit_image_gaussians.py:86-87)."""
  return 10 * jnp.log10(1.0 / jnp.mean((a - b) ** 2))


def log_lerp(t, a, b):
  """Geometric interpolation (LR schedule, reference :316-317)."""
  return math.exp(math.log(a) * (1 - t) + math.log(b) * t)


def make_epochs(total_iters: int, first_epoch: int, max_epoch: int):
  """Growing epoch schedule (reference :151-166)."""
  iteration, epochs = 0, []
  while iteration < total_iters:
    t = iteration / total_iters
    size = math.ceil(log_lerp(t, first_epoch, max_epoch))
    if iteration + size * 2 > total_iters:
      size = total_iters - iteration
    iteration += size
    epochs.append(size)
  return epochs


def take_n(t: np.ndarray, n: int, descending=False) -> np.ndarray:
  """Mask of the n smallest (or largest) values (reference :191-201)."""
  order = np.argsort(-t if descending else t)[:n]
  mask = np.zeros(t.shape[0], bool)
  mask[order] = True
  return mask


def find_split_prune(n, target, n_prune, prune_cost, split_score):
  """(reference :208-218). Points selected by BOTH masks drop out of
  both (as in the reference) — and that already realizes exactly
  `target`: each overlap point cancels one +1 (split) against one -1
  (prune), so n + splits - prunes == n + (target_split - both) -
  (n_prune - both) == target. Exact-N matters here because every
  distinct N re-specializes the jitted train_epoch (XLA static shapes);
  steady-state epochs therefore reuse one compiled shape."""
  prune_mask = take_n(prune_cost, n_prune, descending=False)
  target_split = max(0, (target - n) + int(prune_mask.sum()))
  split_mask = take_n(split_score, target_split, descending=True)
  both = split_mask & prune_mask
  return split_mask ^ both, prune_mask ^ both


def split_prune(key, params: ParameterClass, t, target, prune_rate,
                heuristics: np.ndarray):
  """Prune lowest prune-cost points, split highest split-score points
  toward the target count (reference :220-230)."""
  n = params.num_points
  split_mask, prune_mask = find_split_prune(
      n=n, target=target, n_prune=int(prune_rate * n * (1 - t)),
      prune_cost=heuristics[:, 0], split_score=heuristics[:, 1])

  to_split = params[jnp.asarray(split_mask)]
  splits = uniform_split_gaussians2d(
      key, tensors_to_gaussians(to_split.tensors), random_axis=True)

  params = params[jnp.asarray(~(split_mask | prune_mask))]
  params = params.append_tensors(gaussians_to_tensors(splits))
  return params, dict(split=int(split_mask.sum()),
                      prune=int(prune_mask.sum()))


@functools.partial(jax.jit, static_argnames=("image_size", "config",
                                             "epoch_size", "opacity_reg",
                                             "scale_reg"))
def train_epoch(params: ParameterClass, ref_image: jax.Array,
                image_size: Tuple[int, int], config: RasterConfig,
                epoch_size: int = 100, opacity_reg: float = 0.0,
                scale_reg: float = 0.0):
  """One epoch of fitting at fixed N (reference train_epoch, :89-146).

  Returns (params, rendered image, summed heuristics (N, 2), last-step
  visibility (N,), mean loss, overflow flag — True if any step's tile
  mapping exceeded capacity, i.e. results were cropped)."""
  n = params.num_points
  w, h = image_size

  def loss_fn(tensors, sink, vsink):
    g = tensors_to_gaussians(tensors)
    packed = project_gaussians2d(g)
    mapping = map_to_tiles(packed, jnp.clip(g.z_depth.reshape(-1), 0.0, 1.0),
                           image_size, config)
    # visibility arrives as vsink's cotangent (rides the backward's
    # gradient reduction; the forward skips its visibility machinery)
    out = rasterize_with_tiles(packed, g.feature, mapping, image_size,
                               config, heuristic_sink=sink,
                               visibility_sink=vsink)
    image = jax.nn.sigmoid(out.image)

    scale = jnp.exp(g.log_scaling) / min(w, h)
    loss = (jnp.mean((image - ref_image) ** 2)
            + opacity_reg * jnp.mean(jax.nn.sigmoid(g.alpha_logit))
            + scale_reg * jnp.mean(scale ** 2))
    return loss, (image, out, mapping.overflow)

  grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

  def step(carry, _):
    params, heur_acc = carry
    sink = jnp.zeros((n, 2), jnp.float32)
    vsink = jnp.zeros((n,), jnp.float32)
    (loss, (image, out, overflow)), (grads, heur, vis) = grad_fn(
        {k: params.tensors[k] for k in TENSOR_KEYS}, sink, vsink)

    basis = point_basis(tensors_to_gaussians(params.tensors))
    params = params.step(grads, visibility=vis, basis=basis)

    # parameter clamps (reference :139-142)
    rot = params.tensors["rotation"]
    rot = rot / jnp.linalg.norm(rot, axis=1, keepdims=True)
    params = params.replace_tensors(
        rotation=rot,
        log_scaling=jnp.clip(params.tensors["log_scaling"], -5, 5))

    return (params, heur_acc + heur), (loss, image, vis, overflow)

  (params, heuristics), (losses, images, vis, overflows) = jax.lax.scan(
      step, (params, jnp.zeros((n, 2), jnp.float32)), None,
      length=epoch_size)

  return (params, images[-1], heuristics, vis[-1], jnp.mean(losses),
          jnp.any(overflows))


def make_parameter_class(gaussians: Gaussians2D, base_lr: float = 0.1,
                         optimizer=VisibilityAwareLaProp) -> ParameterClass:
  """Per-attribute groups; position uses the point-local basis
  (reference :266-280)."""
  groups = {
      "position": dict(lr=base_lr, type="local_vector"),
      "z_depth": dict(lr=base_lr * 0.01, type="scalar"),
      "log_scaling": dict(lr=base_lr * 0.2, type="scalar"),
      "rotation": dict(lr=base_lr * 1.0, type="scalar"),
      "alpha_logit": dict(lr=base_lr * 1.0, type="scalar"),
      "feature": dict(lr=base_lr * 0.5, type="scalar"),
  }
  return ParameterClass.create(gaussians_to_tensors(gaussians), groups,
                               optimizer=optimizer)


def synthetic_target(key, image_size: Tuple[int, int]) -> jax.Array:
  """Procedural target image (the reference loads one with OpenCV, which
  is not available here): smooth color field + geometric shapes."""
  w, h = image_size
  ys, xs = jnp.mgrid[0:h, 0:w]
  xs, ys = xs / w, ys / h
  r = 0.5 + 0.5 * jnp.sin(3 * xs + 1.3) * jnp.cos(2 * ys)
  g = 0.5 + 0.5 * jnp.cos(4 * xs * ys * 6.28)
  b = jnp.clip(1.3 * ((xs - 0.5) ** 2 + (ys - 0.5) ** 2) ** 0.5, 0, 1)
  img = jnp.stack([r, g, b], axis=-1)
  # hard-edged shapes for the split heuristic to chase
  disc = ((xs - 0.3) ** 2 + (ys - 0.35) ** 2) < 0.03
  square = (abs(xs - 0.7) < 0.12) & (abs(ys - 0.65) < 0.15)
  img = jnp.where(disc[..., None], jnp.asarray([0.95, 0.2, 0.1]), img)
  img = jnp.where(square[..., None], jnp.asarray([0.1, 0.3, 0.9]), img)
  return img.astype(jnp.float32)


def load_image(path: str) -> np.ndarray:
  if path.endswith(".npy"):
    img = np.load(path)
  else:
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"))
  return (img / 255.0 if img.dtype == np.uint8 else img).astype(np.float32)


def fit(ref_image: jax.Array, n: int = 1000, target: Optional[int] = None,
        total_iters: int = 2000, base_lr: float = 0.1,
        prune_rate: float = 0.05, opacity_reg: float = 0.0,
        scale_reg: float = 0.0,
        config: RasterConfig = RasterConfig(compute_point_heuristic=True),
        seed: int = 0, log=print):
  """Full training loop (reference main(), :234-371)."""
  h, w = ref_image.shape[:2]
  image_size = (w, h)
  target = target or n

  key = jax.random.PRNGKey(seed)
  key, kinit = jax.random.split(key)
  gaussians = random_2d_gaussians(kinit, n, image_size, alpha_range=(0.7, 0.9))
  params = make_parameter_class(gaussians, base_lr)

  epochs = make_epochs(total_iters, 10, 100)
  iteration = 0
  image = None
  for i, epoch_size in enumerate(epochs):
    t = iteration / total_iters
    params = params.set_learning_rate(position=log_lerp(t, base_lr, base_lr * 0.1))

    t0 = time.time()
    params, image, heuristics, vis, loss, overflow = train_epoch(
        params, ref_image, image_size, config, epoch_size=epoch_size,
        opacity_reg=opacity_reg, scale_reg=scale_reg)
    jax.block_until_ready(image)
    if bool(overflow):
      log(f"WARNING: tile-mapper capacity overflow in epoch {i} — "
          "results cropped; increase capacity (map_to_tiles) for this N")
    iteration += epoch_size

    metrics = dict(n=params.num_points,
                   psnr=float(psnr(image, ref_image)),
                   loss=float(loss),
                   iters_per_sec=epoch_size / (time.time() - t0))

    if iteration < total_iters:
      key, ksplit = jax.random.split(key)
      params, counts = split_prune(ksplit, params, t, target, prune_rate,
                                   np.asarray(heuristics))
      metrics.update(counts)

    log(f"epoch {i} (iter {iteration}): " +
        " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                 for k, v in metrics.items()))

  return params, image


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--image", type=str, default=None,
                      help="target image (png/npy); default synthetic")
  parser.add_argument("--width", type=int, default=512)
  parser.add_argument("--height", type=int, default=384)
  parser.add_argument("--n", type=int, default=1000)
  parser.add_argument("--target", type=int, default=None)
  parser.add_argument("--iters", type=int, default=2000)
  parser.add_argument("--lr", type=float, default=0.1)
  parser.add_argument("--tile_size", type=int, default=16)
  parser.add_argument("--prune_rate", type=float, default=0.05)
  parser.add_argument("--opacity_reg", type=float, default=0.0)
  parser.add_argument("--scale_reg", type=float, default=0.0)
  parser.add_argument("--antialias", action="store_true")
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--cpu", action="store_true")
  parser.add_argument("--save", type=str, default=None,
                      help="save final render to .npy")
  args = parser.parse_args()

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  if args.image:
    ref = jnp.asarray(load_image(args.image))
  else:
    ref = synthetic_target(jax.random.PRNGKey(1), (args.width, args.height))

  config = RasterConfig(tile_size=args.tile_size, antialias=args.antialias,
                        compute_point_heuristic=True)

  params, image = fit(ref, n=args.n, target=args.target,
                      total_iters=args.iters, base_lr=args.lr,
                      prune_rate=args.prune_rate,
                      opacity_reg=args.opacity_reg,
                      scale_reg=args.scale_reg, config=config,
                      seed=args.seed)

  print(f"final: n={params.num_points} psnr={float(psnr(image, ref)):.2f}")
  if args.save:
    np.save(args.save, np.asarray(image))


if __name__ == "__main__":
  main()
