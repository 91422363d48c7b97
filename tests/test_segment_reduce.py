"""Pallas segment-reduce kernel vs XLA segment_sum (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_stitching_tpu import PointCloud
from pointcloud_stitching_tpu.kernels.segment_reduce import segment_sum_sorted
from pointcloud_stitching_tpu.ops import voxel_downsample
from oracle import voxel_downsample_np


def _random_sorted_seg(rng, n, capacity, discard_frac=0.1):
    # unit-increment ids, the form the voxel cumsum produces (the kernel's
    # contract); tail is discard
    seg = np.cumsum(rng.random(n) < 0.4).astype(np.int32) - 1
    seg = np.clip(seg, 0, capacity - 1)
    k = int(n * (1 - discard_frac))
    seg[k:] = capacity
    return seg


@pytest.mark.parametrize("n,capacity", [(1000, 256), (5000, 4096),
                                        (512, 512), (130, 1000)])
def test_kernel_matches_segment_sum(rng, n, capacity):
    seg = _random_sorted_seg(rng, n, capacity)
    vals = rng.normal(size=(n, 8)).astype(np.float32)
    vals[seg == capacity] = 0.0
    got = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                             chunk=128, interpret=True)
    want = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg),
                               num_segments=capacity + 1)[:capacity]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_kernel_discard_rows_in_mixed_chunk(rng):
    # chunk contains both real segments and discard: discard must not leak
    n, capacity = 256, 64
    seg = np.concatenate([np.sort(rng.integers(0, 8, 200)),
                          np.full(56, capacity)]).astype(np.int32)
    vals = rng.normal(size=(n, 8)).astype(np.float32)  # discard NOT zeroed
    got = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                             chunk=128, interpret=True)
    z = vals.copy()
    z[seg == capacity] = 0.0
    want = jax.ops.segment_sum(jnp.asarray(z), jnp.asarray(seg),
                               num_segments=capacity + 1)[:capacity]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_voxel_pallas_interpret_matches_oracle(rng):
    pts = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    pc = PointCloud.from_points(pts, capacity=4096)
    out = voxel_downsample(pc, 0.1, capacity=4096, impl="pallas",
                           interpret=True)
    ref, _ = voxel_downsample_np(pts, 0.1)
    m = np.asarray(out.mask)
    np.testing.assert_allclose(np.asarray(out.xyz)[m], ref, atol=1e-4)


def test_voxel_pallas_batched_interpret(rng):
    pts = rng.uniform(-1, 1, size=(3, 500, 3)).astype(np.float32)
    mask = np.ones((3, 500), bool)
    pc = PointCloud(xyz=jnp.asarray(pts), mask=jnp.asarray(mask))
    out = voxel_downsample(pc, 0.2, capacity=512, impl="pallas",
                           interpret=True)
    ref_out = voxel_downsample(pc, 0.2, capacity=512, impl="xla")
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(ref_out.xyz),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.mask),
                                  np.asarray(ref_out.mask))


def test_kernel_bf16x3_matches(rng):
    n, capacity = 4000, 1024
    seg = _random_sorted_seg(rng, n, capacity)
    vals = (rng.normal(size=(n, 8)) * 3 + 5).astype(np.float32)
    vals[seg == capacity] = 0.0
    hi = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                            chunk=128, interpret=True, precision="highest")
    b3 = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                            chunk=128, interpret=True, precision="bf16x3")
    np.testing.assert_allclose(np.asarray(b3), np.asarray(hi),
                               rtol=1e-5, atol=1e-4)


def test_kernel_bf16x2_exact_for_16bit_integers(rng):
    """bf16x2 (two limbs) must be EXACT for <=16-bit integer channels — the
    contract the packed voxel path relies on (its channels are voxel indices
    <= 65535 and 10-bit quantised offsets)."""
    n, capacity = 4000, 1024
    seg = _random_sorted_seg(rng, n, capacity)
    vals = rng.integers(0, 65536, size=(n, 8)).astype(np.float32)
    vals[seg == capacity] = 0.0
    hi = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                            chunk=128, interpret=True, precision="highest")
    b2 = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                            chunk=128, interpret=True, precision="bf16x2")
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(hi))


def test_voxel_packed_integer_channels_match_exact(rng):
    """The packed (integer-channel, bf16x2) voxel path agrees with the exact
    five-operand path within its leaf/2048 reconstruction quantum."""
    pts = rng.uniform(-2, 2, size=(6000, 3)).astype(np.float32)
    mask = rng.random(6000) < 0.9
    pc = PointCloud(xyz=jnp.asarray(pts), mask=jnp.asarray(mask))
    leaf = 0.02
    a = voxel_downsample(pc, leaf, capacity=8192, impl="pallas",
                         interpret=True)
    b = voxel_downsample(pc, leaf, capacity=8192, impl="pallas",
                         interpret=True, packed="never")
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    m = np.asarray(a.mask)
    np.testing.assert_allclose(np.asarray(a.xyz)[m], np.asarray(b.xyz)[m],
                               atol=leaf / 2048 * 1.01)


def test_flags_kernel_unaligned_capacity_with_overflow(rng):
    """Regression (ADVICE r1, medium): when capacity is not a multiple of the
    sub-block (256) AND the segment count overflows capacity, the window
    clamp must stay sub-aligned (a misaligned start falsifies the kernel's
    multiple_of promise -> misaligned VMEM store on hardware) while still
    capturing every id < capacity."""
    from pointcloud_stitching_tpu.kernels.segment_reduce import (
        segment_sum_from_flags)
    n, capacity = 8192, 1000  # 1000 % 256 != 0
    flags = (rng.random(n) < 0.3).astype(np.int32)
    flags[0] = 1
    seg = np.cumsum(flags) - 1          # ~2400 segments >> capacity
    assert seg[-1] > capacity
    vals = rng.normal(size=(n, 8)).astype(np.float32)
    got = segment_sum_from_flags(jnp.asarray(vals), jnp.asarray(flags),
                                 capacity, interpret=True)
    keep = seg < capacity
    want = jax.ops.segment_sum(
        jnp.asarray(vals * keep[:, None]),
        jnp.asarray(np.minimum(seg, capacity)),
        num_segments=capacity + 1)[:capacity]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("group,sub", [(1, 128), (2, 256), (8, 128)])
def test_flags_kernel_group_sub_knobs(rng, group, sub):
    """The grid-step batching (group) and one-hot row-block (sub) tuning
    knobs must not change results — only scheduling."""
    from pointcloud_stitching_tpu.kernels.segment_reduce import (
        segment_sum_from_flags)
    n, capacity = 4096, 700
    flags = (rng.random(n) < 0.25).astype(np.int32)
    flags[0] = 1
    seg = np.cumsum(flags) - 1
    vals = rng.normal(size=(n, 8)).astype(np.float32)
    got = segment_sum_from_flags(jnp.asarray(vals), jnp.asarray(flags),
                                 capacity, chunk=256, interpret=True,
                                 group=group, sub=sub)
    keep = seg < capacity
    want = jax.ops.segment_sum(
        jnp.asarray(vals * keep[:, None]),
        jnp.asarray(np.minimum(seg, capacity)),
        num_segments=capacity + 1)[:capacity]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_flags_kernel_rejects_unaligned_sub(rng):
    """sub must be a 128-multiple dividing chunk (Mosaic lane-tile rule on
    the sliding out-ref window) — rejected with ValueError, not a Mosaic
    compile crash."""
    from pointcloud_stitching_tpu.kernels.segment_reduce import (
        segment_sum_from_flags)
    vals = jnp.zeros((1024, 8), jnp.float32)
    flags = jnp.zeros((1024,), jnp.int32).at[0].set(1)
    for bad in [dict(sub=64), dict(sub=192), dict(chunk=256, sub=512)]:
        with pytest.raises(ValueError, match="multiple of 128"):
            segment_sum_from_flags(vals, flags, 128, interpret=True, **bad)


def test_sorted_kernel_unaligned_capacity(rng):
    """segment_sum_sorted twin of the clamp fix: arbitrary (chunk-unaligned)
    capacity with a discard tail must stay exact."""
    n, capacity = 2048, 300             # 300 % 128 != 0
    seg = np.minimum(np.arange(n, dtype=np.int32) // 5, capacity)
    vals = rng.normal(size=(n, 8)).astype(np.float32)
    vals[seg == capacity] = 0.0
    got = segment_sum_sorted(jnp.asarray(vals), jnp.asarray(seg), capacity,
                             chunk=128, interpret=True)
    want = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(seg),
                               num_segments=capacity + 1)[:capacity]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
