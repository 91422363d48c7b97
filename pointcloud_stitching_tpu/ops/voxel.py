"""Voxel-grid downsampling with fixed-capacity output.

TPU-native equivalent of ``pcl::VoxelGrid<pcl::PointXYZRGB>`` (reference:
src/pcs-multicamera-client.cpp applies it to the fused cloud before rendering;
SURVEY.md §2.2 row 3).

PCL semantics reproduced here (the numpy oracle in tests/oracle.py is the
contract):
  * per-axis voxel index  ijk = floor(p / leaf) - floor(min_p / leaf)
  * one output point per occupied voxel = centroid (mean) of its points
  * output ordered by ascending (ix, iy, iz)

TPU has no hash maps, so uniquing is sort-based: ``lax.sort`` with a
two-key lexicographic voxel key (packed (ix,iy), then iz — avoids the
reference's int32 linearised-index overflow), then a segment boundary pass,
then per-segment mean. The segment reduction has two interchangeable
backends:

  * 'pallas' (default on TPU): the scatter-free sequential-grid kernel in
    kernels/segment_reduce.py — XLA's scatter-add costs ~170 ms for the
    8-camera workload on v5e; the kernel replaces it with MXU one-hot
    matmuls and windowed VMEM accumulation.
  * 'xla': jax.ops.segment_sum — portable, fast on CPU, the correctness
    reference for the kernel.

Everything is fixed shape: invalid inputs sort to the end under a sentinel
key, voxels beyond ``capacity`` fall into a discard bucket, and the output
carries a validity mask. One compiled program serves every frame.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.types import PointCloud

_SENTINEL = jnp.iinfo(jnp.int32).max


def voxel_indices(xyz: jax.Array, mask: jax.Array, leaf: jax.Array):
    """Per-axis int32 voxel indices (PCL convention), sentinel for invalid."""
    inv = 1.0 / jnp.asarray(leaf, jnp.float32)
    f = jnp.floor(xyz * inv).astype(jnp.int32)  # floor(p/leaf)
    big = jnp.iinfo(jnp.int32).max
    fm = jnp.where(mask[..., None], f, big)
    min_ijk = jnp.min(fm, axis=-2, keepdims=True)  # floor(min_p/leaf) per axis
    ijk = f - min_ijk
    ijk = jnp.where(mask[..., None], ijk, _SENTINEL)
    return ijk


# --- packed-operand sort path ------------------------------------------------
#
# lax.sort cost on TPU scales with the number of operands (measured on v5e at
# 3.26M elements: 5 ops 15.5 ms, 3 ops 9.4 ms, 1 op 7.0 ms — gathering
# payloads after an idx-sort is even worse, 13+ ms for one [N,3] take). The
# fused-cloud sort was ~half the 8-camera frame, so when the frame allows it
# we sort TWO operands instead of five:
#
#   key  : the PCL-order linearised voxel index (ix*ny + iy)*nz + iz built
#          from the frame's *runtime* extents (traced — no recompile), valid
#          whenever nx*ny*nz < 2^30 (PCL's own VoxelGrid refuses scenes past
#          the same int32-index class);
#   off  : 3x10-bit quantised in-voxel offsets (p*inv - floor(p*inv), in
#          units of leaf/1024), reconstructing each coordinate to within
#          leaf/2048 (5 um at the flagship 1 cm leaf).
#
# Reconstruction error must stay far inside the oracle tolerance (1e-4 m),
# so the packed path additionally requires leaf <= _PACK_MAX_LEAF (15 um
# worst case). Both conditions are traced values; `voxel_downsample` selects
# the branch with lax.cond, so big scenes / coarse leaves silently keep the
# exact path. RGB rides as a third packed operand (24 bits of an i32, mean
# exact), so a colored cloud sorts 3 operands instead of the exact path's 8.

_PACK_MAX_LEAF = 0.03
_PACK_MAX_CELLS = float(2 ** 30)


def _extents(ijk):
    """Per-axis occupied extent (nx, ny, nz) of sentinel-masked indices."""
    valid = ijk[..., 0] != _SENTINEL
    mx = jnp.max(jnp.where(valid[..., None], ijk, -1), axis=-2)  # [..., 3]
    return mx + 1  # all-invalid cloud -> extent 0


def _sorted_segments_packed(pc: PointCloud, leaf, ijk):
    """Packed-operand sort: linearised key + quantised offsets (+ RGB).

    Returns (flags, vals [..., N, 7 or 10], min_ijk). The channels are all
    small integers — [ix·flag, iy·flag, iz·flag, q0, q1, q2, 1] plus
    [r, g, b] for colored clouds — so the segment reduction runs with
    exact two-limb bf16 products (bf16x2: one third cheaper than the
    general bf16x3 path; see
    kernels.segment_reduce._accumulate_onehot_dot). The per-axis voxel
    index lands only on each segment's first row (flag-masked: exactly one
    contribution per segment survives the sum), the offsets sum over the
    whole segment, and the centroid reconstructs in _finalize_packed as
    (base + (Σq/n + ½)/1024)·leaf — algebraically the same mean the exact
    path computes, quantised at leaf/2048. RGB rides as a third packed
    operand (24 bits of an i32): a colored cloud sorts 3 operands instead
    of the exact path's 8 (sort cost scales with operand count — 8-op is
    ~3x the 2-op cost at 3.26M rows), and its per-voxel mean is exact
    (8-bit integers, single bf16 limb).
    """
    xyz, mask = pc.xyz, pc.mask
    inv = 1.0 / jnp.asarray(leaf, jnp.float32)
    ext = _extents(ijk)
    ny = jnp.maximum(ext[..., 1:2], 1)
    nz = jnp.maximum(ext[..., 2:3], 1)
    key = (ijk[..., 0] * ny + ijk[..., 1]) * nz + ijk[..., 2]
    key = jnp.where(mask, key, _SENTINEL)

    # in-voxel offsets in units of leaf/1024 (round-to-floor of the exact
    # f32 fractional part; reconstruction adds the half-bin back)
    frac = xyz * inv - jnp.floor(xyz * inv)            # [..., N, 3] in [0,1)
    oq = jnp.clip((frac * 1024.0).astype(jnp.int32), 0, 1023)
    off = (oq[..., 0] << 20) | (oq[..., 1] << 10) | oq[..., 2]

    has_rgb = pc.rgb is not None
    operands = [key, off]
    if has_rgb:
        rq = jnp.clip(pc.rgb.astype(jnp.int32), 0, 255)
        operands.append((rq[..., 0] << 16) | (rq[..., 1] << 8) | rq[..., 2])

    # unstable: XLA's stable sort costs ~1.4x (9.2 vs 6.4 ms at 3.26M);
    # within-voxel order is irrelevant here — the packed path sums exact
    # integer channels, so the result is bit-identical either way
    sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=False)
    skey, soff = sorted_ops[0], sorted_ops[1]
    valid = skey != _SENTINEL

    # unpack key -> per-axis voxel indices (relative to min_ijk)
    sk = jnp.where(valid, skey, 0)
    iz = sk % nz
    t = sk // nz
    iy = t % ny
    ix = t // ny
    big = jnp.iinfo(jnp.int32).max
    fm = jnp.where(mask[..., None], jnp.floor(xyz * inv).astype(jnp.int32),
                   big)
    min_ijk = jnp.min(fm, axis=-2, keepdims=True)

    prev = lambda a: jnp.concatenate(
        [jnp.full_like(a[..., :1], -1), a[..., :-1]], axis=-1)
    flags = (skey != prev(skey)) & valid
    f = flags.astype(jnp.float32)
    q = jnp.stack([(soff >> 20) & 1023, (soff >> 10) & 1023, soff & 1023],
                  axis=-1).astype(jnp.float32)
    chans = [
        jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32) * f[..., None],
        q,
        jnp.ones((*f.shape, 1), jnp.float32)]
    if has_rgb:
        srgb = sorted_ops[2]
        chans.append(jnp.stack([(srgb >> 16) & 255, (srgb >> 8) & 255,
                                srgb & 255], axis=-1).astype(jnp.float32))
    vals = jnp.concatenate(chans, axis=-1)
    vals = jnp.where(valid[..., None], vals, 0.0)
    return flags, vals, min_ijk


def _sorted_segments(pc: PointCloud, leaf, capacity: int):
    """Sort by voxel key; return (seg ids clamped to [0, capacity],
    channel matrix [N, ch] zeroed on dropped rows). Works on [N] or [B, N]."""
    xyz, mask = pc.xyz, pc.mask
    ijk = voxel_indices(xyz, mask, leaf)
    # pack (ix, iy) into one key: one fewer sort operand. Per-axis index
    # range is extent/leaf; the clamp bounds it at ~327 m / 655 m of scene
    # extent at 1 cm leaves (same practical-limit class as PCL's int32
    # linearised leaf index). iz keeps full range as the second key.
    kx = jnp.minimum(ijk[..., 0], 32766)
    ky = jnp.minimum(ijk[..., 1], 65534)
    kz = ijk[..., 2]
    k1 = jnp.where(ijk[..., 0] == _SENTINEL, _SENTINEL, kx * 65536 + ky)

    operands = [k1, kz, xyz[..., 0], xyz[..., 1], xyz[..., 2]]
    has_rgb = pc.rgb is not None
    if has_rgb:
        operands += [pc.rgb[..., 0], pc.rgb[..., 1], pc.rgb[..., 2]]
    # unstable: within-voxel order only permutes the f32 centroid summation
    # (ulp-level, same class as PCL's own input-order dependence)
    sorted_ops = jax.lax.sort(operands, num_keys=2, is_stable=False)
    sk1, skz = sorted_ops[0], sorted_ops[1]
    sxyz = jnp.stack(sorted_ops[2:5], axis=-1)
    srgb = jnp.stack(sorted_ops[5:8], axis=-1) if has_rgb else None

    valid = sk1 != _SENTINEL
    prev = lambda a: jnp.concatenate(
        [jnp.full_like(a[..., :1], -1), a[..., :-1]], axis=-1)
    is_new = (sk1 != prev(sk1)) | (skz != prev(skz))
    flags = is_new & valid

    chans = [sxyz, jnp.ones((*sxyz.shape[:-1], 1), jnp.float32)]
    if has_rgb:
        chans.append(srgb)
    vals = jnp.concatenate(chans, axis=-1)          # [..., N, 4(+3)]
    vals = jnp.where(valid[..., None], vals, 0.0)
    return flags, vals, has_rgb


def _flags_to_seg(flags, capacity: int):
    """Boundary flags → clamped segment ids (XLA fallback path)."""
    seg = jnp.cumsum(flags.astype(jnp.int32), axis=-1) - 1
    return jnp.where((seg >= 0) & (seg < capacity), seg, capacity)


def _finalize(sums: jax.Array, has_rgb: bool) -> PointCloud:
    counts = sums[..., 3]
    out_mask = counts > 0.0
    denom = jnp.maximum(counts, 1.0)[..., None]
    out_xyz = jnp.where(out_mask[..., None], sums[..., :3] / denom, 0.0)
    out_rgb = None
    if has_rgb:
        out_rgb = jnp.where(out_mask[..., None], sums[..., 4:7] / denom, 0.0)
    return PointCloud(xyz=out_xyz, mask=out_mask, rgb=out_rgb)


def _finalize_packed(sums: jax.Array, min_ijk: jax.Array, leaf,
                     has_rgb: bool = False) -> PointCloud:
    """Centroids from integer-channel sums [ix, iy, iz, Σq0, Σq1, Σq2, n
    (+ Σr, Σg, Σb)]: (base + (Σq/n + ½)/1024)·leaf — the same mean the
    exact path computes, quantised at leaf/2048; RGB mean is exact."""
    counts = sums[..., 6]
    out_mask = counts > 0.0
    denom = jnp.maximum(counts, 1.0)[..., None]
    base = sums[..., :3] + min_ijk.astype(jnp.float32)
    mean_q = sums[..., 3:6] / denom
    lf = jnp.asarray(leaf, jnp.float32)
    xyz = (base + (mean_q + 0.5) * (1.0 / 1024.0)) * lf
    rgb = None
    if has_rgb:
        rgb = jnp.where(out_mask[..., None], sums[..., 7:10] / denom, 0.0)
    return PointCloud(xyz=jnp.where(out_mask[..., None], xyz, 0.0),
                      mask=out_mask, rgb=rgb)


def _reduce_xla(flags, vals, capacity: int):
    seg = _flags_to_seg(flags, capacity)
    return jax.ops.segment_sum(vals, seg, num_segments=capacity + 1,
                               indices_are_sorted=True)[:capacity]


def _reduce_pallas(flags, vals, capacity: int, interpret: bool,
                   precision: str = "bf16x3"):
    # no VMEM guard needed here: the resident (ch_pad, cap+span) out
    # block measures fine far past the nominal 16 MB/core — the colored
    # flagship's 16.9 MB block ships in every bench, and an r5 probe
    # compiled+ran 64 MB blocks on the v5e (scratch/vmem_probe_r5.py).
    # (_reduce_pallas_batched's 12 MB switch predates that measurement;
    # it stays because its lax.map fallback is also correct and the
    # benched cam passes sit under it either way.)
    from ..kernels.segment_reduce import segment_sum_from_flags
    ch = vals.shape[-1]
    if ch % 8:  # pad channels to a full sublane tile
        vals = jnp.concatenate(
            [vals, jnp.zeros((*vals.shape[:-1], 8 - ch % 8), jnp.float32)],
            axis=-1)
    # flags variant: segment ids derive in-kernel (SMEM carry), removing the
    # full-stream cumsum. Limb decomposition keeps products exact below
    # HIGHEST's MXU cost: bf16x3 for arbitrary f32 (10.8 vs 18 ms on the
    # 3.26M fused cloud); bf16x2 when the caller feeds <=16-bit integer
    # channels (the packed path), one third cheaper again.
    return segment_sum_from_flags(vals, flags, capacity, interpret=interpret,
                                  precision=precision)[:, :ch]


def _reduce_pallas_batched(flags, vals, capacity: int, interpret: bool,
                           precision: str = "bf16x3"):
    """Batched reduction: one flat kernel call when the combined output fits
    in VMEM, else a sequential per-cloud map.

    Flattening gives each cloud its own id range [b*(cap+1), b*(cap+1)+cap]
    (slot `cap` = per-cloud discard) and pads each cloud's stream to a chunk
    multiple so no kernel chunk straddles two clouds (the sorted kernel's
    window-span bound only holds within one cloud's unit-increment ids).
    """
    from ..kernels.segment_reduce import segment_sum_sorted

    b, n = flags.shape
    ch = vals.shape[-1]
    chunk = 1024
    total_cap = b * (capacity + 1)
    ch_pad = ch + (8 - ch % 8) % 8
    if (total_cap + 2 * chunk) * max(ch_pad, 8) * 4 > 12 * 2 ** 20:
        red = lambda s, v: _reduce_pallas(s, v, capacity, interpret,
                                          precision)
        return jax.lax.map(lambda sv: red(*sv), (flags, vals))

    if ch % 8:
        vals = jnp.concatenate(
            [vals, jnp.zeros((b, n, 8 - ch % 8), jnp.float32)], axis=-1)
    seg = _flags_to_seg(flags, capacity)                  # [B, N] in [0,cap]
    npad = -(-n // chunk) * chunk
    if npad != n:
        seg = jnp.pad(seg, ((0, 0), (0, npad - n)), constant_values=capacity)
        vals = jnp.pad(vals, ((0, 0), (0, npad - n), (0, 0)))
    offs = (jnp.arange(b, dtype=jnp.int32) * (capacity + 1))[:, None]
    seg_flat = (seg + offs).reshape(-1)
    vals_flat = vals.reshape(b * npad, -1)
    sums = segment_sum_sorted(vals_flat, seg_flat, total_cap, chunk=chunk,
                              interpret=interpret, precision=precision)
    return sums.reshape(b, capacity + 1, -1)[:, :capacity, :ch]


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


@partial(jax.jit, static_argnames=("capacity", "impl", "interpret", "packed"))
def voxel_downsample(pc: PointCloud, leaf, capacity: int,
                     impl: str = "auto", interpret: bool = False,
                     packed: str = "auto") -> PointCloud:
    """Downsample to one centroid per occupied voxel; output padded to capacity.

    Args:
      pc: PointCloud with xyz [N, 3] or camera-batched [B, N, 3] (+mask).
      leaf: voxel edge length in meters (scalar, traced — no recompile on change).
      capacity: static per-cloud output size. Voxels past capacity drop.
      impl: 'auto' | 'pallas' | 'xla' segment-reduction backend.
      interpret: run the pallas kernel in interpreter mode (CPU testing).
      packed: 'auto' | 'never' — 'auto' switches (at runtime, via lax.cond)
        to the packed sort (2 operands, 3 with RGB) when the scene extents
        fit 2^30 voxel cells AND leaf <= 0.03 m (xyz reconstruction error
        <= leaf/2048, far inside the oracle tolerance; RGB means exact).
        'never' forces the exact 5/8-operand sort unconditionally.
    """
    impl = _resolve_impl(impl)
    batched = pc.xyz.ndim == 3

    def reduce_fn(flags, vals, precision="bf16x3"):
        if impl == "xla":
            if batched:
                return jax.vmap(
                    lambda s, v: _reduce_xla(s, v, capacity))(flags, vals)
            return _reduce_xla(flags, vals, capacity)
        if batched:
            return _reduce_pallas_batched(flags, vals, capacity, interpret,
                                          precision)
        return _reduce_pallas(flags, vals, capacity, interpret, precision)

    has_rgb = pc.rgb is not None
    if packed == "never":
        flags, vals, has_rgb = _sorted_segments(pc, leaf, capacity)
        return _finalize(reduce_fn(flags, vals), has_rgb)

    ijk = voxel_indices(pc.xyz, pc.mask, leaf)
    ext = _extents(ijk)
    cells = jnp.prod(ext.astype(jnp.float32), axis=-1)
    # per-axis bound <= 2^16 keeps the packed path's index channels exact
    # under two-limb bf16 products (16 significant bits)
    fits = (jnp.all(cells <= _PACK_MAX_CELLS)
            & jnp.all(ext <= 65536)
            & (jnp.asarray(leaf, jnp.float32) <= _PACK_MAX_LEAF))
    if has_rgb:
        # the RGB operand packs 8-bit integers; wire colors are exactly
        # that, but the public API accepts arbitrary floats — only pack
        # when packing is lossless (traced, like the other conditions)
        fits = fits & jnp.all(pc.rgb == jnp.round(pc.rgb)) \
            & jnp.all((pc.rgb >= 0) & (pc.rgb <= 255))

    def fast(_):
        flags, vals, min_ijk = _sorted_segments_packed(pc, leaf, ijk)
        sums = reduce_fn(flags, vals, precision="bf16x2")
        out = _finalize_packed(sums, min_ijk, leaf, has_rgb)
        return (out.xyz, out.mask, out.rgb) if has_rgb \
            else (out.xyz, out.mask)

    def slow(_):
        flags, vals, _hr = _sorted_segments(pc, leaf, capacity)
        out = _finalize(reduce_fn(flags, vals), has_rgb)
        return (out.xyz, out.mask, out.rgb) if has_rgb \
            else (out.xyz, out.mask)

    parts = jax.lax.cond(fits, fast, slow, None)
    if has_rgb:
        return PointCloud(xyz=parts[0], mask=parts[1], rgb=parts[2])
    return PointCloud(xyz=parts[0], mask=parts[1])


def decimate_depth(depth: jax.Array, stride: int) -> jax.Array:
    """Grid-stride decimation of a depth image before deprojection.

    Equivalent of the reference camera server's downsample flag (stride
    subsampling of the frame to cut bandwidth; SURVEY.md §2.1 'Voxel-grid
    downsample / decimation' row, server side).
    """
    if stride <= 1:
        return depth
    return depth[..., ::stride, ::stride]
