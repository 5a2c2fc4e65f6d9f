"""Runtime init / debug configuration.

The reference's TaichiQueue layer (taichi_queue.py) owns runtime init,
device selection, and debug plumbing; on JAX the dispatcher is already
async and thread-safe, so only the *configuration role* survives
(SURVEY.md §2.2): platform selection, the debug/sanitizer switches
(reference `debug=True` -> Taichi debug arch; here nan-checking + Pallas
interpreter mode), and profiling helpers.
"""

import contextlib
import hashlib
import os
from typing import Optional

import jax


def host_fingerprint() -> str:
  """Short hash of the host CPU's identity (model + stepping + flags).

  XLA:CPU AOT executables are machine-specific: loading a persistent-
  cache entry compiled on a host with different CPU features logs
  cpu_aot_loader feature-mismatch errors and can SIGILL/SIGSEGV the
  process (observed when a home directory — and thus ~/.cache —
  persists across heterogeneous machines). Cache directories are
  therefore machine-scoped by suffixing this fingerprint. The model/
  stepping lines matter beyond the flags line: LLVM derives per-
  microarchitecture *tuning* pseudo-features (+prefer-no-scatter /
  +prefer-no-gather) from the CPU model, so two hosts with identical
  /proc/cpuinfo flags can still bake incompatible feature lists into
  their AOT results (observed across a machine refresh, 2026-08-20).
  """
  try:
    ident = []
    with open("/proc/cpuinfo") as f:
      for line in f:
        if line.startswith(("flags", "model", "stepping", "cpu family",
                            "vendor_id")):
          ident.append(line)
        if line.strip() == "" and ident:
          break  # first core only; all cores are identical
    if ident:
      return hashlib.sha1("".join(ident).encode()).hexdigest()[:10]
  except OSError:
    pass
  import platform
  return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def init(platform: Optional[str] = None, debug: bool = False,
         enable_x64: bool = False,
         compilation_cache: Optional[str] = "~/.cache/tgr_xla"):
  """Configure the JAX runtime (the reference's TaichiQueue.init analog,
  taichi_queue.py:43-50).

  platform: "tpu" / "cpu" / None (keep environment default). Must be
  called before first backend use.
  debug: enable jax_debug_nans (the reference's Taichi debug-mode analog).
  compilation_cache: persistent XLA compile-cache directory (None to
  disable). Raster-kernel specializations compile in ~1-2 min each on
  the TPU toolchain; the cache makes every later process pay seconds
  (the reference's lazy-Taichi-JIT experience, README.md:95). The
  directory is suffixed with `host_fingerprint()` — a cache written on
  a machine with different CPU features must not be reused (see there).
  """
  if platform is not None:
    jax.config.update("jax_platforms", platform)
  if enable_x64:
    jax.config.update("jax_enable_x64", True)
  jax.config.update("jax_debug_nans", debug)
  if compilation_cache:
    path = os.path.expanduser(compilation_cache) + "_" + host_fingerprint()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@contextlib.contextmanager
def debug_mode():
  """Context manager: nan checking + Pallas interpreter mode (the
  'debug arch' for kernels; reference tests run Taichi on ti.cpu)."""
  from jax.experimental.pallas import tpu as pltpu
  prev = jax.config.jax_debug_nans
  jax.config.update("jax_debug_nans", True)
  try:
    with pltpu.force_tpu_interpret_mode():
      yield
  finally:
    jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/tgr_trace"):
  """jax.profiler trace context (the torch.profiler analog, reference
  benchmarks/util.py:6-21). View with tensorboard or xprof."""
  jax.profiler.start_trace(log_dir)
  try:
    yield log_dir
  finally:
    jax.profiler.stop_trace()


def check_finite(tree, name: str = "tree"):
  """Raise if any leaf contains non-finite values (reference
  torch_lib/util.py:5-45, called per-iteration by the trainer). Host
  sync — use only for debugging."""
  import jax.numpy as jnp
  bad = {}
  for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
      n = int(jnp.sum(~jnp.isfinite(leaf)))
      if n:
        bad[jax.tree_util.keystr(path)] = n
  if bad:
    raise ValueError(f"non-finite values in {name}: {bad}")
