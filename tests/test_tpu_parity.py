"""Real-TPU numerical parity: Mosaic-compiled kernels vs the CPU oracle.

The rest of the suite runs the Pallas kernels in interpreter mode on CPU
(conftest forces the cpu platform); nothing else would catch a
Mosaic-vs-interpret divergence. This test renders one small scene on the
real TPU backend in a subprocess (the parent process is already pinned to
cpu) and compares image, weight, and all gradients against the same f32
computation on CPU.

Opt-in: `pytest -m tpu` (deselected by default; needs the axon TPU).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_SCENE_SRC = """
import sys
import numpy as np
import jax
import jax.numpy as jnp

out_path, platform = sys.argv[1], sys.argv[2]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from taichi_gaussian_rasterizer_tpu import RasterConfig, render_gaussians
from taichi_gaussian_rasterizer_tpu.utils.random_data import (
    random_camera, random_3d_gaussians)

config = RasterConfig(tile_size=16, points_per_chunk=128,
                      compute_visibility=True)
camera = random_camera(jax.random.PRNGKey(0), image_size=(256, 192))
gaussians = random_3d_gaussians(jax.random.PRNGKey(1), 5000, camera)

def loss(g):
    r = render_gaussians(g, camera, config, capacity=64 * 1024)
    return jnp.sum(jnp.sin(r.image)) + jnp.sum(r.image_weight), r

(val, r), grads = jax.jit(
    jax.value_and_grad(loss, has_aux=True))(gaussians)
_ = float(val)  # force through the relay

np.savez(out_path,
         backend=jax.default_backend(),
         image=np.asarray(r.image), weight=np.asarray(r.image_weight),
         visibility=np.asarray(r.point_visibility),
         g_position=np.asarray(grads.position),
         g_log_scaling=np.asarray(grads.log_scaling),
         g_rotation=np.asarray(grads.rotation),
         g_alpha_logit=np.asarray(grads.alpha_logit),
         g_feature=np.asarray(grads.feature))
print("OK", jax.default_backend())
"""


def _run(platform: str, out_path: str):
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  env = dict(os.environ)
  env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
  res = subprocess.run(
      [sys.executable, "-c", _SCENE_SRC, out_path, platform],
      env=env, capture_output=True, text=True, timeout=1800)
  assert res.returncode == 0, (
      f"{platform} render failed:\n{res.stdout}\n{res.stderr}")
  return np.load(out_path)


def test_tpu_matches_cpu_oracle(tmp_path):
  tpu = _run("tpu", str(tmp_path / "tpu.npz"))
  assert str(tpu["backend"]) == "tpu", "axon TPU backend not available"
  cpu = _run("cpu", str(tmp_path / "cpu.npz"))

  # Tolerance classes match the documented numerics design:
  # * forward outputs: f32 kernels with 2-pass bf16-split matmuls and
  #   Mosaic transcendentals — bulk error ~5e-4 of scale, isolated
  #   pixels to ~1e-2 (threshold-gate flips on near-cutoff gaussians).
  # * gradients: bf16-pair slot-gradient transport (backward.py) plus
  #   1-pass cumsum splits — ~2^-9-relative by design on both backends,
  #   quantized differently.
  def check(k, p999_tol, max_tol):
    a, b = tpu[k], cpu[k]
    scale = max(np.abs(b).max(), 1e-3)
    err = np.abs(a - b)
    p999 = np.percentile(err, 99.9)
    assert p999 <= p999_tol * scale, (
        f"{k}: p99.9 err {p999:.2e} > {p999_tol:.0e} * {scale:.2e}")
    assert err.max() <= max_tol * scale, (
        f"{k}: max err {err.max():.2e} > {max_tol:.0e} * {scale:.2e}")
    # the loose max_tol exists for isolated threshold-gate flips only: a
    # broad 1-2% drift (a real kernel regression) must still fail, so
    # bound the FRACTION of entries above the p99.9-class tolerance
    frac = float(np.mean(err > p999_tol * scale))
    assert frac <= 2e-3, (
        f"{k}: {frac:.2%} of entries exceed {p999_tol:.0e} * scale — "
        "broad drift, not isolated gate flips")

  for k in ("image", "weight", "visibility"):
    check(k, 1e-3, 2e-2)
  for k in ("g_position", "g_log_scaling", "g_rotation", "g_alpha_logit",
            "g_feature"):
    check(k, 5e-3, 3e-2)
