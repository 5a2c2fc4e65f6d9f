"""Pallas segment-sum over point-sorted slot values.

The gradient reduction (function.py reduce_slots_by_point) sorts per-slot
values by their point index; this kernel turns the sorted stream into
dense per-point sums. The TPU-native trick: after the sort the keys are
ascending, so output block w (points [128w, 128w+128)) consumes an
exclusive, contiguous input range — and that range needs no search,
because the mapper's `point_offsets` prefix already maps each point to
its segment start. Per input chunk the partial sums are one
(R, G) x (G, 128) MXU matmul against the one-hot of the local key, so
the whole post-sort reduction is matmul + DMA with no cumsum over the
K-sized stream and no (N+1)-wide boundary gather (each cost ~13 ms at
3M slots as XLA ops; this kernel replaces both).

The one-hot operand is exact in bf16 and the values ride a two-pass
hi/lo split (cf. blend.exclusive_cumsum_lanes), so the sums are
f32-accurate. Replaces the reference's shared-memory/global atomic
accumulation ladder (taichi_splatting/rasterizer/backward.py:204-228).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_interpret() -> bool:
  return jax.default_backend() == "cpu"


def cdiv(a, b):
  return -(-a // b)


def _segment_sum_kernel(r: int, g: int, gi: int, packed: bool = False):
  # g: output block width (points per grid step); gi: input chunk width.
  # gi > g amortizes the per-iteration DMA + matmul cost: a block's input
  # range (avg ~3 slots/point = ~3g) is covered by ~cdiv(3g, gi) chunks.
  def kernel(block_off_ref,                  # scalar prefetch (W+1,)
             keys_hbm, vals_hbm,             # (1, K) i32, (R, K)
             out_ref,                        # (R, 128) block of (R, W*128)
             keys_vmem, vals_vmem,           # double-buffered chunks
             sem_k, sem_v):
    w = pl.program_id(0)
    dtype = out_ref.dtype
    start = block_off_ref[w]
    end = block_off_ref[w + 1]
    fstart = (start // gi) * gi
    nch = jnp.where(end > start, cdiv(end - fstart, gi), 0)
    k_total = keys_hbm.shape[1]
    base = w * g   # == w * 128: output block covers keys [base, base+128)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gi), 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (g, gi), 0)
    two = jnp.asarray(2, jnp.int32)

    def dma(c, slot):
      off = pl.multiple_of(jnp.minimum(fstart + c * gi, k_total - gi), gi)
      return (pltpu.make_async_copy(keys_hbm.at[:, pl.ds(off, gi)],
                                    keys_vmem.at[slot], sem_k.at[slot]),
              pltpu.make_async_copy(vals_hbm.at[:, pl.ds(off, gi)],
                                    vals_vmem.at[slot], sem_v.at[slot]))

    @pl.when(nch > 0)
    def _():
      for cp in dma(0, 0):
        cp.start()

    def body(c, acc):
      slot = jax.lax.rem(c, two)

      @pl.when(c + 1 < nch)
      def _():
        for cp in dma(c + 1, 1 - slot):
          cp.start()

      for cp in dma(c, slot):
        cp.wait()

      keys = keys_vmem[slot]                 # (1, GI)
      vals = vals_vmem[slot]                 # (R, GI)
      # the DMA offset clamps at the buffer end, so mask by the slot's
      # true position: count each slot exactly once, within this chunk's
      # nominal range intersected with the block's input range
      off = jnp.minimum(fstart + c * gi, k_total - gi)
      s_idx = off + lane
      lo = jnp.maximum(start, fstart + c * gi)
      hi = jnp.minimum(end, fstart + (c + 1) * gi)
      mask = (s_idx >= lo) & (s_idx < hi)

      local = keys - base                    # (1, G) in [0, 128) if live
      # out[j, i] = 1 iff lane i's key maps to output column j: built with
      # the output index on sublanes so no (1, G) -> (G, 1) transpose is
      # needed (Mosaic cannot legalize tpu.transpose on these shapes);
      # the dot then contracts lane-vs-lane (A @ B^T form)
      onehot = ((col2 == local) & mask).astype(dtype)      # (128, G)

      onehot_bf = (onehot.astype(jnp.bfloat16)
                   if dtype == jnp.float32 else onehot)

      def dot(v, precision=None):
        # explicit bf16 operands = one true MXU pass (exact: the one-hot
        # is 0/1 and v is bf16-exact at every call site below)
        if dtype == jnp.float32:
          return jax.lax.dot_general(
              v.astype(jnp.bfloat16), onehot_bf, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            v, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype, precision=precision)

      def select(v):
        # masked lanes can hold uninitialized slots (past total_overlaps);
        # a 0 * NaN in the matmul would poison the sums — select, not mask
        return jnp.where(jnp.broadcast_to(mask, v.shape), v, 0)

      if packed:
        # bf16 pairs in u32 rows (backward.py): both halves are exactly
        # bf16, so a single DEFAULT-precision MXU pass is lossless
        hi_v = select(jax.lax.bitcast_convert_type(
            vals & jnp.uint32(0xFFFF0000), jnp.float32))
        lo_v = select(jax.lax.bitcast_convert_type(
            vals << 16, jnp.float32))
        return acc + jnp.concatenate([dot(hi_v), dot(lo_v)], axis=0)
      vals = select(vals)
      if dtype == jnp.float32:
        hi_v = vals.astype(jnp.bfloat16).astype(dtype)
        return acc + dot(hi_v) + dot(vals - hi_v)
      return acc + dot(vals, jax.lax.Precision.HIGHEST)

    out_ref[...] = jax.lax.fori_loop(
        0, nch, body, jnp.zeros(((2 * r) if packed else r, g), dtype))

  return kernel


@functools.partial(jax.jit, static_argnames=("n",))
def segment_sums_by_sorted_key(keys: jax.Array, values: jax.Array,
                               offsets: jax.Array, n: int,
                               block_offsets: jax.Array = None) -> jax.Array:
  """Dense per-point sums of point-sorted slot values.

  keys: (K,) int32 ascending point ids (sentinel == n sorts last);
  values: (R, K) same order; offsets: (N+1,) positions of each point's
  segment start (mapper point_offsets); n: number of points (static).
  Returns (R, N): column i = sum of values whose key == i.

  The kernel only consumes offsets at 128-point block granularity;
  callers without a full (N+1,) offsets array (e.g. the compacted
  saturation-aware reduction, function.py) pass `block_offsets`
  directly: (ceil(N/128)+1,) positions of keys 0, 128, ..., and the
  first sentinel — `offsets` is then ignored (pass None).

  uint32 values are treated as bf16 pairs (backward.py packing): the
  result is then (2 * R_pad8, N) float32 with the pair's high halves in
  rows [0, R_pad8) and the low halves in rows [R_pad8, 2 * R_pad8).
  """
  r, k = values.shape
  g = 128
  # 512-lane input chunks: ~2.3x fewer kernel iterations/DMAs than 128
  # (a 128-point output block consumes ~3 slots/point; adjacent blocks
  # re-reading an overlapping 512-chunk costs less than the per-iteration
  # fixed cost of 4x as many 128-chunks)
  gi = 512
  if k % gi != 0 or k < gi:
    # the kernel DMAs gi-lane chunks; pad sentinels (key n, zero values)
    # here so every caller sees the same contract (production K from the
    # mapper is chunk-aligned but not necessarily gi-aligned)
    k_pad = cdiv(max(k, 1), gi) * gi
    keys = jnp.concatenate([keys, jnp.full((k_pad - k,), n, jnp.int32)])
    values = jnp.concatenate(
        [values, jnp.zeros((r, k_pad - k), values.dtype)], axis=1)
    k = k_pad
  packed = values.dtype == jnp.uint32
  out_dtype = jnp.float32 if packed else values.dtype
  if n == 0:
    return jnp.zeros((r, 0), out_dtype)
  w = cdiv(n, g)

  # Mosaic HBM slices must be 8-aligned along sublanes: pad the row count
  # (the extra DMA bytes are noise; the sort payload count stays at R)
  r_pad = cdiv(r, 8) * 8
  if r_pad != r:
    values = jnp.concatenate(
        [values, jnp.zeros((r_pad - r, k), values.dtype)], axis=0)

  if block_offsets is None:
    block_offsets = jnp.concatenate(
        [offsets[:n:g], offsets[n:n + 1]])                        # (W+1,)
  block_off = block_offsets
  assert block_off.shape == (w + 1,), (block_off.shape, w)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(w,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec((2 * r_pad if packed else r_pad, g),
                             lambda i, *_: (0, i)),
      scratch_shapes=[
          pltpu.VMEM((2, 1, gi), jnp.int32),
          pltpu.VMEM((2, r_pad, gi), values.dtype),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )

  out = pl.pallas_call(
      _segment_sum_kernel(r_pad, g, gi, packed=packed),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct(
          (2 * r_pad if packed else r_pad, w * g), out_dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=use_interpret(),
  )(block_off, keys.reshape(1, k), values)

  return out[:, :n] if packed else out[:r, :n]
