"""Pallas TPU kernel: segment-sum over sorted segment ids.

Why this kernel exists: XLA's scatter-add (what ``jax.ops.segment_sum``
lowers to) costs ~170 ms for the 8-camera voxel workload on v5e, ~6x the
whole frame budget, while the sort that produces the ids costs ~20 ms. With
ids sorted, a segment sum needs no scatter at all:

  * the grid walks the sorted stream chunk by chunk (TPU grids execute
    sequentially, so read-modify-write on the output block is race-free),
  * each chunk builds a one-hot matrix of its *local* segment offsets and
    multiplies it with the values on the MXU → per-chunk partial sums,
  * partials accumulate into a window of the VMEM-resident output at an
    aligned dynamic offset (segment ids grow by at most 1 per element, which
    bounds each chunk's window).

Two entry points: ``segment_sum_from_flags`` (primary — derives ids
in-kernel from boundary flags with an SMEM carry across the sequential
grid) and ``segment_sum_sorted`` (takes precomputed ids; used by the
flattened batched path where per-cloud id offsets are easier outside).

Accumulation is plain float32 adds — the same error profile as PCL's
VoxelGrid centroid accumulation, unlike a cumsum-difference scheme whose
error grows with the full stream length.

Replaces: pcl::VoxelGrid's per-leaf centroid accumulation loop
(reference: client-side voxel filter, SURVEY.md §2.2 row 3).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _accumulate_onehot_dot(pT, v, onehot, precision):
    """pT += v @ onehot on the MXU with parity-safe precision.

    The default MXU pass truncates the value operand to bf16 (breaks
    PCL-tolerance parity), so either HIGHEST (6 full-f32 passes) or a limb
    split: the values decompose into bf16 limbs whose products against the
    exact bf16 one-hot reconstruct the full product. 'bf16x3' is f32-exact
    for any value at half HIGHEST's cost; 'bf16x2' (two limbs) is exact for
    values with <= 16 significant bits — integers in [-65535, 65535] — and
    costs another third less (the packed voxel path feeds exactly such
    quantised integer channels).
    """
    dims = (((1,), (0,)), ((), ()))
    if precision in ("bf16x3", "bf16x2"):
        oh = onehot.astype(jnp.bfloat16)
        # the shared Veltkamp-split helper (kernels/limbs.py) — NOT an
        # f32->bf16->f32 cast chain; see its docstring for the
        # --xla_allow_excess_precision cast-pair-folding hazard
        from .limbs import bf16_limbs
        limbs = bf16_limbs(v, 3 if precision == "bf16x3" else 2)
        # one dot with the limbs stacked as extra rows, then add the row
        # groups: per-dot issue overhead, not MXU throughput, dominates at
        # these shapes — stacking measured 6.03 -> 4.78 ms on the 3.26M
        # 8-channel fused pass (v5e), identical products bit for bit
        ch = v.shape[0]
        d = jax.lax.dot_general(
            jnp.concatenate(limbs, axis=0), oh, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        for i in range(len(limbs)):
            pT = pT + d[i * ch:(i + 1) * ch]
        return pT
    return pT + jax.lax.dot_general(
        v, onehot.astype(jnp.float32), dimension_numbers=dims,
        precision=precision, preferred_element_type=jnp.float32)


def _segsum_kernel(starts_ref, lseg_ref, valsT_ref, out_ref, *, chunk, span,
                   sub, precision):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ch = valsT_ref.shape[0]
    lseg = lseg_ref[...]                                    # [chunk] i32
    vals = valsT_ref[...]                                   # [ch, chunk]
    iota = jax.lax.broadcasted_iota(jnp.int32, (sub, span), 1)
    pT = jnp.zeros((ch, span), jnp.float32)
    # static unroll: Mosaic requires statically-aligned slices of the block
    for k in range(chunk // sub):
        ls = lseg[k * sub:(k + 1) * sub]                    # [sub]
        onehot = (ls[:, None] == iota)                      # [sub, span] bool
        v = vals[:, k * sub:(k + 1) * sub]                  # [ch, sub]
        pT = _accumulate_onehot_dot(pT, v, onehot, precision)
    start = pl.multiple_of(starts_ref[j], chunk)
    out_ref[:, pl.ds(start, span)] += pT


def _segsum_flags_kernel(flags_ref, valsT_ref, out_ref, carry_ref, *,
                         chunk, span, sub, precision, capacity, group):
    """Variant that derives segment ids in-kernel from boundary flags.

    The grid is sequential, so a single SMEM scalar carries the running
    segment count across chunks — this removes the full-stream XLA cumsum,
    the chunk-start gather, and the scalar-prefetch array from the caller.
    Each grid step processes ``group`` chunks to amortise step overhead.
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        carry_ref[0] = 0

    ch = valsT_ref.shape[0]
    gflags = flags_ref[...]                                 # [group*chunk]
    gvals = valsT_ref[...]                                  # [ch, group*chunk]
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri = (rows <= cols).astype(jnp.bfloat16)   # upper-tri: [s, t] = s <= t
    iota = jax.lax.broadcasted_iota(jnp.int32, (sub, span), 1)

    for g in range(group):
        flags = gflags[g * chunk:(g + 1) * chunk]
        vals = gvals[:, g * chunk:(g + 1) * chunk]
        # within-chunk inclusive prefix sum via a triangular matmul: bf16
        # one-hot/flag operands are exact and accumulate in f32, so the
        # integer prefix is exact. (No vector cumsum primitive in Mosaic.)
        lpre = jax.lax.dot_general(
            flags.astype(jnp.bfloat16)[None, :], tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0].astype(jnp.int32)

        carry = carry_ref[0]
        seg = carry + lpre - 1                              # [chunk] i32
        carry_ref[0] = carry + lpre[chunk - 1]

        # align the window at `sub` granularity: span = chunk + sub instead
        # of 2*chunk — one-hot work scales with span. The overflow clamp must
        # itself stay `sub`-aligned (capacity need not be a multiple of sub,
        # and a misaligned start would falsify the multiple_of promise below);
        # the aligned clamp still covers every id < capacity since
        # capacity - (capacity // sub) * sub < sub <= span.
        s0 = jnp.maximum(seg[0], 0)
        start = jnp.minimum((s0 // sub) * sub, (capacity // sub) * sub)
        lseg = seg - start
        # negative ids (leading invalid rows) and ids past the window
        # one-hot to zero; rows past `capacity` land in the sliced-off tail.

        pT = jnp.zeros((ch, span), jnp.float32)
        for k in range(chunk // sub):
            ls = lseg[k * sub:(k + 1) * sub]
            onehot = (ls[:, None] == iota)
            v = vals[:, k * sub:(k + 1) * sub]
            pT = _accumulate_onehot_dot(pT, v, onehot, precision)
        start = pl.multiple_of(start, sub)
        out_ref[:, pl.ds(start, span)] += pT


@partial(jax.jit, static_argnames=("capacity", "chunk", "interpret",
                                   "precision", "group", "sub"))
def segment_sum_from_flags(vals: jax.Array, flags: jax.Array, capacity: int,
                           chunk: int = 1024, interpret: bool = False,
                           precision: str = "bf16x3", group: int = 4,
                           sub: int | None = None) -> jax.Array:
    """Segment sum where ids come from boundary flags (sorted-run starts).

    Args:
      vals: [N, ch] float32; rows of invalid points must be zeroed.
      flags: [N] int32/bool — 1 where a new (valid) segment starts. The
        implied ids are cumsum(flags)-1; rows before the first flag get id
        -1 and are dropped; ids >= capacity are dropped.
      group: chunks per grid step (amortises step overhead).
      sub: one-hot row-block height (defaults to min(256, chunk); the
        window span is chunk + sub, so smaller sub = narrower dots).
        Must be a multiple of 128 (the out-ref window slides at `sub`
        granularity and Mosaic requires lane-dim offsets provably
        128-aligned) and must divide chunk.
    Returns [capacity, ch] float32 sums.
    """
    n, ch = vals.shape
    flags = flags.astype(jnp.int32)
    step = group * chunk
    npad = -(-n // step) * step
    if npad != n:
        vals = jnp.pad(vals, ((0, npad - n), (0, 0)))
        flags = jnp.pad(flags, (0, npad - n))
    if sub is None:
        sub = min(256, chunk)
    if sub % 128 != 0 or chunk % sub != 0:
        raise ValueError(f"sub must be a multiple of 128 dividing chunk, "
                         f"got sub={sub} chunk={chunk}")
    span = chunk + sub
    nsteps = npad // step
    valsT = vals.T
    out_w = capacity + span

    prec = (precision if precision in ("bf16x3", "bf16x2")
            else jax.lax.Precision(precision.lower()))
    out = pl.pallas_call(
        partial(_segsum_flags_kernel, chunk=chunk, span=span,
                sub=sub, precision=prec, capacity=capacity, group=group),
        out_shape=jax.ShapeDtypeStruct((ch, out_w), jnp.float32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((step,), lambda j: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, step), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ch, out_w), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(flags, valsT)
    return out[:, :capacity].T


@partial(jax.jit, static_argnames=("capacity", "chunk", "interpret",
                                   "precision"))
def segment_sum_sorted(vals: jax.Array, seg: jax.Array, capacity: int,
                       chunk: int = 1024, interpret: bool = False,
                       precision: str = "highest") -> jax.Array:
    """Sum ``vals`` rows by sorted segment id into ``capacity`` slots.

    Args:
      vals: [N, ch] float32. Rows to be discarded must be zeroed by the
        caller (their segment id should be ``capacity``).
      seg: [N] int32, nondecreasing with **unit increments** (the form a
        cumsum-of-boundaries produces: seg[i+1] - seg[i] in {0, 1}), except
        that any suffix may jump to the discard id ``capacity``. A chunk's
        ids then span < 2*chunk slots, which is what bounds the accumulation
        window; arbitrary sorted jumps would silently drop contributions.
      capacity: number of output slots (static).
      chunk: grid chunk length (static; 1024 matches the XLA layout tile of
        1-D int32 arrays on TPU — other sizes fail Mosaic layout checks).
    Returns:
      [capacity, ch] float32 per-segment sums.
    """
    n, ch = vals.shape
    npad = -(-n // chunk) * chunk
    if npad != n:
        vals = jnp.pad(vals, ((0, npad - n), (0, 0)))
        seg = jnp.pad(seg, (0, npad - n), constant_values=capacity)
    span = 2 * chunk
    nchunks = npad // chunk

    # chunk-aligned window starts, clamped so a contract-violating seg (e.g.
    # a stray negative id) can never produce an out-of-bounds VMEM window
    # (which faults the TPU worker); out-of-window ids just drop instead.
    # The upper clamp is re-aligned to `chunk` (capacity is arbitrary; a
    # misaligned start would break the kernel's multiple_of promise) — ids in
    # [aligned, capacity) still fit: capacity - aligned < chunk < span.
    starts = jnp.clip((seg[::chunk] // chunk) * chunk, 0,
                      (capacity // chunk) * chunk)
    # local offsets; flat 1-D so the block is a pure lane vector
    lseg = (seg.reshape(nchunks, chunk) - starts[:, None]).reshape(-1)
    # offsets outside [0, span) (mixed real/discard chunks) one-hot to zero.
    valsT = vals.T                                          # [ch, npad]
    out_w = capacity + span

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda j, *_: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, chunk), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ch, out_w), lambda j, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    prec = (precision if precision in ("bf16x3", "bf16x2")
            else jax.lax.Precision(precision.lower()))
    out = pl.pallas_call(
        partial(_segsum_kernel, chunk=chunk, span=span,
                sub=min(256, chunk), precision=prec),
        out_shape=jax.ShapeDtypeStruct((ch, out_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, lseg, valsT)
    return out[:, :capacity].T
