"""A/B: points_per_chunk 128 vs 256 on the headline frame (1M @2048
light, fwd+bwd). Round-2's geometry sweep picked 128 on the old
grid-per-tile kernels; the flat (tile,chunk)-list kernels (round 3+)
have different fixed costs per entry, so re-measure. At g=256 the
iteration-entry count roughly halves (fewer per-tile chunk visits +
fewer boundary duplicates) while per-entry math doubles and bin padding
slack grows (mean tile ~208 slots pads to ~2.2x real work vs ~1.6x at
g=128) — the measurement settles which effect wins.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from taichi_gaussian_rasterizer_tpu.utils import runtime

runtime.init()

from bench import bench_scene  # noqa: E402
from taichi_gaussian_rasterizer_tpu import RasterConfig  # noqa: E402


def main():
  image_size = (2048, 1536)
  for g in (128, 256):
    cfg = RasterConfig(tile_size=16, points_per_chunk=g,
                       saturation_early_exit=False)
    t0 = time.perf_counter()
    ms, compile_s = bench_scene(1_000_000, image_size, cfg, iters=15,
                                label=f"g{g}")
    print(f"[g={g}] {ms:.2f} ms/frame (compile {compile_s:.0f}s, "
          f"total {time.perf_counter() - t0:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
  main()
