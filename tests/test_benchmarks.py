"""Benchmark / example CLI smoke tests (reference tests/test_benchmarks.py:
run each CLI main with small args; crash-free execution is the assertion)."""

import subprocess
import sys

import pytest

ENV_ARGS = ["--cpu"]


def run(mod, *args):
  cmd = [sys.executable, "-m", mod, *args, *ENV_ARGS]
  proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
  assert proc.returncode == 0, proc.stderr[-2000:]
  return proc.stdout


@pytest.mark.parametrize("op", ["projection", "sh", "tilemapper",
                                "rasterizer"])
def test_bench_ops(op):
  out = run("benchmarks.bench_ops", op, "--n", "2000", "--size", "128",
            "--iters", "2")
  assert "ms/call" in out


def test_bench_rasterizer_backward():
  out = run("benchmarks.bench_ops", "rasterizer", "--n", "1000", "--size",
            "128", "--iters", "2", "--backward")
  assert "ms/call" in out


def test_backward_cli():
  out = run("taichi_gaussian_rasterizer_tpu.examples.test_backward",
            "--n", "500", "--size", "64", "--points_per_chunk", "8")
  assert "grad norms" in out


def test_vis_split_cli(tmp_path):
  out = run("taichi_gaussian_rasterizer_tpu.examples.vis_split",
            "--n", "4", "--size", "64", "--out", str(tmp_path / "v.npy"))
  assert "saved" in out
