"""Raster configuration.

TPU-native rebuild of the reference's `RasterConfig`
(see /root/reference/taichi_splatting/data_types.py:12-40). The frozen,
hashable dataclass doubles as the kernel-specialization key: it is passed
as a static argument under `jax.jit`, so every distinct config compiles its
own Pallas kernels (the analog of the reference's `@cache`-keyed Taichi
kernel factories, e.g. rasterizer/forward.py:11).

TPU-specific additions (static shapes under XLA):

* ``max_tile_span`` — per-gaussian tile footprint cap. XLA needs a static
  candidate-tile enumeration per gaussian; gaussians whose adaptive cutoff
  radius would span more tiles have their footprint clamped. The reference
  has no such cap (dynamic loops, tile_mapper.py:134), but in practice
  footprints are small; 16x16 tiles = 256px radius at tile_size 16.
* ``points_per_chunk`` — number of gaussians staged per VMEM chunk in the
  raster kernels (the analog of the reference's `tile_area`-sized shared
  memory point groups, forward.py:62-66). Tile bins are padded to a
  multiple of this so kernels run unmasked full chunks.
"""

from dataclasses import dataclass, replace


@dataclass(frozen=True, eq=True, kw_only=True)
class RasterConfig:
  tile_size: int = 16

  # NOTE: the reference's `pixel_stride` (per-CUDA-thread pixel sub-tile,
  # data_types.py:16) is deliberately ABSENT: the TPU backward vectorizes
  # whole tiles on the VPU, so the knob has no meaning here and accepting
  # it silently would invite misconfiguration.

  # clamp position to within this margin of the image for the affine Jacobian
  clamp_margin: float = 0.15

  # use the analytic antialiased (box-integrated) gaussian pdf
  antialias: bool = False

  # add blur_cov * I to the projected 2D covariance
  blur_cov: float = 0.3

  clamp_max_alpha: float = 0.99
  alpha_threshold: float = 1.0 / 255.0

  # stop alpha blending once accumulated weight reaches this
  saturate_threshold: float = 0.9999

  # if False, output the feature of the point crossing (1 - saturate_threshold)
  # accumulated weight (quantile/median filter; reference forward.py:109-114)
  use_alpha_blending: bool = True

  compute_point_heuristic: bool = False  # implies compute_visibility
  compute_visibility: bool = False

  # --- TPU static-shape knobs (no reference analog) ---
  # cap on per-gaussian tile footprint (candidate tiles enumerated statically)
  max_tile_span: int = 16
  # gaussians staged per VMEM chunk inside raster kernels; tile bins are
  # padded to a multiple of this
  points_per_chunk: int = 128
  # Skip the FORWARD's chunk compute once every pixel of a tile
  # saturates (break-equivalent; the reference's blending forward never
  # exits, forward.py:107-114). Exact by the blend gates. The tradeoff
  # is NOT free on TPU: wrapping the forward's chunk body in a
  # conditional costs ~180 ns/entry of Mosaic pipeline stalls (~5.8 ms
  # at 1M@2048 — PERF.md round-3c), repaid only when tiles actually
  # saturate (measured 62 -> 52 ms forward at 74% saturation). Leave
  # True for real opaque scenes; set False for low-opacity scenes
  # (probe: render once and check Rendering.image_weight against
  # saturate_threshold). The BACKWARD's replay skip (the reference's
  # per-pixel early termination, backward.py:160-166) is always on —
  # its conditional is measurably free there.
  saturation_early_exit: bool = True

  # In f32 the backward packs per-slot gradient rows pairwise as bf16
  # halves of one u32 (transport-grade: ~2^-9 relative per slot
  # contribution, summed per point in f32), halving the gradient sort's
  # payload columns. Set True to keep full-f32 slot gradients when
  # diagnosing convergence issues (f64 paths are always exact).
  exact_slot_gradients: bool = False

  # Deterministic blend-tie ordering in the tile mapper's candidate
  # sort. The default sorts with is_stable=False (measured ~25% faster,
  # PERF.md round-3b): candidates with identical (tile, depth) keys
  # blend in arbitrary, compile-dependent order. The reference's CUB
  # radix sort IS stable (cuda_lib/radix_sort_pairs.cu via
  # tile_mapper.py:154), so ties blend in generation order there. Exact
  # key ties are measure-zero for f32 depths but COMMON under depth16
  # quantization. With deterministic=True the mapper sorts stably, and
  # the depth16 key additionally carries the full f32 depth as a
  # secondary sort key — so renders are bitwise reproducible and (up to
  # exactly-equal f32 depths) independent of the input point order.
  # Gradient reductions stay input-order-dependent in their f32
  # summation order either way. Costs one extra sort payload column in
  # depth16 mode plus the stable-sort premium (measure per scene).
  deterministic: bool = False

  # In f32 with 3-4 feature channels the per-slot gather table packs
  # feature pairs as bf16 halves of one f32 row, landing the gather on
  # the measured 8-row sweet spot (6.1 vs 7.6 ns/idx — PERF.md). Costs
  # ~2^-9 relative on rendered feature values (geometry and gradients
  # stay full precision; 8-bit displays quantize 4x coarser). Set True
  # to keep full-f32 features (f64 paths are always exact).
  exact_features: bool = False

  def replace(self, **kwargs) -> "RasterConfig":
    return replace(self, **kwargs)
