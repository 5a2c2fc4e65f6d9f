"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with float64 enabled so gradcheck-style tests can run
at full precision — the analog of the reference's f64 Taichi library +
`ti.cpu` debug arch (SURVEY.md §4). Pallas kernels automatically fall back
to interpreter mode on CPU (see ops/raster).

The ambient environment force-registers a remote-TPU PJRT plugin
(JAX_PLATFORMS=axon via sitecustomize) that would turn every eager test op
into a network round-trip; `jax.config.update("jax_platforms", "cpu")`
before first backend use overrides it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-bound (interpret-mode
# Pallas + x64 recompiles), so repeat local runs — especially the
# `-m quick` smoke subset — hit the cache and run in seconds.
#
# The dir is fingerprinted by host CPU features: XLA:CPU AOT executables
# are machine-specific, and reusing a cache written on a different host
# has crashed the suite (SIGSEGV/SIGABRT in the cache read/load path,
# after cpu_aot_loader feature-mismatch warnings). A new machine gets a
# fresh cache instead of inheriting incompatible executables.
def _host_fingerprint():
  # keep in sync with utils/runtime.py host_fingerprint(): model/stepping
  # lines included because LLVM bakes per-microarchitecture tuning
  # pseudo-features (+prefer-no-scatter/-gather) into AOT results that
  # the flags line alone does not distinguish.
  import hashlib
  try:
    ident = []
    with open("/proc/cpuinfo") as f:
      for line in f:
        if line.startswith(("flags", "model", "stepping", "cpu family",
                            "vendor_id")):
          ident.append(line)
        if line.strip() == "" and ident:
          break
    if ident:
      return hashlib.sha1("".join(ident).encode()).hexdigest()[:10]
  except OSError:
    pass
  import platform
  return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


_cache = os.path.expanduser(f"~/.cache/tgr_xla_test_{_host_fingerprint()}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
