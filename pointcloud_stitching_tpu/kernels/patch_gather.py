"""Pallas TPU kernel: brick-local image gather via on-chip one-hot dots.

The TSDF integrator needs ``depth[vi, ui]`` for 16.7M voxels per camera —
a random HBM gather that runs at the chip's gather issue rate (~115 M
elem/s, measured in scratch/xla_gather_probe.py: 145 ms per camera at
256³, independent of table size or index order). But the indices aren't
random: an 8³ voxel brick projects into a small contiguous image patch.
This kernel exploits that:

  per brick (512 voxels, one grid step batches ``bricks_per_step``):
    window = DMA depth[v0:v0+128, u0:u0+256] into VMEM   (clamped starts)
    rows   = dot(window, onehot(u_local))   # MXU, contraction over u
    d      = sum(rows * onehot(v_local), axis=v)          # VPU select

The one-hot matrices are built in VMEM from iota comparisons and never
touch HBM — the XLA-level formulation of the same idea (models/tsdf.py
``_mxu_depth_lookup``) streams them through HBM and pays ~77 ms/camera;
here the only HBM traffic is the windows (64–128 KB/brick) and the
index/output planes.

Layout discipline (the reason this lowers cleanly): voxels live on the
LANE axis end to end. ``onehot_u [256 u-sublanes, 512 vox-lanes]`` comes
from broadcasting the [1, 512] local-index row against a sublane iota;
``dot(window [128, 256], onehot_u) → rows [128 v-sublanes, 512 vox-lanes]``
contracts over u (window lanes × onehot sublanes); the v-select is a
sublane reduce. No relayouts, no transposes, no vector gathers (Mosaic
has none — "Only 2D gather is supported" per-lane only).

Exactness: a one-hot row selects exactly one f32 window element, so
the dot reproduces it bitwise when each MXU pass is exact — either
HIGHEST precision or an explicit Veltkamp bf16-limb split of the
window (3 limbs for arbitrary f32, 2 when the image holds <= 16
significant bits, e.g. raw u16 depth); the limb modes cost 2-3 MXU
passes instead of HIGHEST's 6 and measured 64.2 -> 39.6/43.5 ms per
32768 bricks (scratch/pg_ab_tpu.out). Out-of-window local indices
(invalid pixels, oversized bricks) select nothing and read 0.0 —
callers gate those voxels anyway.

DMA starts are clamped to [0, Hp-128] × [0, Wp-256] on the host and the
image is padded to at least 512×1024 (f32 zeros), so no dynamic window
can go out of bounds (OOB windows hard-crash the TPU worker — CLAUDE.md).

Role in the reference stack: the depth-image lookup inside
pcl::gpu::kinfu::TsdfVolume::integrate (SURVEY.md §2.2 TSDF row — CUDA
does this with per-thread texture fetches; the TPU shape is brick-batched
one-hot contractions).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WV = 128          # window rows (v); sublane axis, start aligned to 8
_WU = 256          # window cols (u); lane axis, start aligned to 128
# spans a brick may cover and still fit a window after start alignment:
# v0 aligns down by ≤7 rows, u0 by ≤127 cols
SPAN_V = _WV - 8
SPAN_U = _WU - 128


# exact bf16 limb decomposition: the shared Veltkamp-split helper
# (kernels/limbs.py — the one copy of the cast-pair-hazard workaround)
from .limbs import bf16_limbs as _bf16_limbs


def _kernel(v0_ref, u0_ref, iv_ref, iu_ref, img_hbm, out_ref,
            win, sem, *, bps, mode):
    step = pl.program_id(0)

    def dma(j):
        b = step * bps + j
        # the host aligned v0/u0 down to 8/128 (patch_gather below);
        # Mosaic can't see that, so assert it — without the hint the
        # memref_slice fails "tile index not provably divisible by 8"
        v0 = pl.multiple_of(v0_ref[b], 8)
        u0 = pl.multiple_of(u0_ref[b], 128)
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(v0, _WV), pl.ds(u0, _WU)],
            win.at[j], sem.at[j])

    for j in range(bps):
        dma(j).start()
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (_WU, 512), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (_WV, 512), 0)
    for j in range(bps):
        dma(j).wait()
        if mode == "highest":
            ou = (iu_ref[j:j + 1, :] == iota_u).astype(jnp.float32)
            rows = jax.lax.dot(win[j], ou,
                               precision=jax.lax.Precision.HIGHEST)
        else:
            # limb dots: the one-hot is exact in bf16 and each product
            # selects a single limb, so summing the row groups rebuilds
            # the f32 window value bitwise at 2-3 MXU passes instead of
            # HIGHEST's 6 (measured 64.2 -> 39.6 ms per 32768 bricks
            # for bf16x2, scratch/pg_ab_tpu.out)
            ou = (iu_ref[j:j + 1, :] == iota_u).astype(jnp.bfloat16)
            limbs = _bf16_limbs(win[j], 2 if mode == "bf16x2" else 3)
            d = jax.lax.dot_general(
                jnp.concatenate(limbs, axis=0), ou,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rows = d[0:_WV]
            for i in range(1, len(limbs)):
                rows = rows + d[i * _WV:(i + 1) * _WV]
        sel = iv_ref[j:j + 1, :] == iota_v
        out_ref[j:j + 1, :] = jnp.sum(jnp.where(sel, rows, 0.0),
                                      axis=0, keepdims=True)


@partial(jax.jit,
         static_argnames=("bricks_per_step", "mode", "interpret"))
def patch_gather(img: jax.Array, v0: jax.Array, u0: jax.Array,
                 iv: jax.Array, iu: jax.Array,
                 bricks_per_step: int = 16, mode: str = "auto",
                 interpret: bool = False) -> jax.Array:
    """img[v0[b] + iv[b,k], u0[b] + iu[b,k]] for brick-grouped indices.

    Args:
      img: [H, W] f32; padded internally to ≥ 512×1024 with zeros.
      mode: one-hot dot exactness strategy — 'bf16x3' (3 limb passes,
        exact for any f32), 'bf16x2' (2 passes, exact ONLY for values
        with <= 16 significant bits, e.g. raw u16 depth cast to f32),
        'highest' (XLA HIGHEST, 6 passes, the reference), or 'auto':
        bf16x3, the fastest always-exact mode.
      v0/u0: [NB] int32 window starts (any values — clamped and aligned
        down to 8/128 here; the returned values honor the ORIGINAL
        v0/u0 as the local-index origin, i.e. the caller's iv/iu are
        relative to its unaligned starts).
      iv/iu: [NB, 512] int32 local indices; entries outside the ALIGNED
        window read 0.0, while entries in the alignment slop (slightly
        negative iv/iu that the aligned-down window still covers) read
        the underlying pixel — callers must gate don't-care voxels
        themselves (the integrator gates on pix_ok).

    Returns [NB, 512] f32 gathered values, bitwise equal to
    ``img[v0+iv, u0+iu]`` wherever those indices land in the window.
    """
    if mode == "auto":
        mode = "bf16x3"
    if mode not in ("bf16x3", "bf16x2", "highest"):
        raise ValueError(f"unknown patch_gather mode {mode!r}")
    nb = v0.shape[0]
    H, W = img.shape
    hp = max(512, -(-H // 8) * 8)
    wp = max(1024, -(-W // 128) * 128)
    img_p = jnp.pad(img, ((0, hp - H), (0, wp - W)))

    # align starts down (8 / 128) and clamp so windows stay in bounds;
    # fold the alignment shift into the local indices
    v0a = jnp.clip(v0 - (v0 % 8), 0, hp - _WV)
    u0a = jnp.clip(u0 - (u0 % 128), 0, wp - _WU)
    ivl = iv + (v0 - v0a)[:, None]
    iul = iu + (u0 - u0a)[:, None]

    bps = bricks_per_step
    nbp = -(-nb // bps) * bps
    pad = ((0, nbp - nb),)
    v0a = jnp.pad(v0a, pad)
    u0a = jnp.pad(u0a, pad)
    ivl = jnp.pad(ivl, pad + ((0, 0),), constant_values=-1)
    iul = jnp.pad(iul, pad + ((0, 0),), constant_values=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbp // bps,),
        in_specs=[
            pl.BlockSpec((bps, 512), lambda s, v_, u_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, 512), lambda s, v_, u_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # image stays in HBM
        ],
        out_specs=pl.BlockSpec((bps, 512), lambda s, v_, u_: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bps, _WV, _WU), jnp.float32),
            pltpu.SemaphoreType.DMA((bps,)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, bps=bps, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbp, 512), jnp.float32),
        interpret=interpret,
    )(v0a, u0a, ivl, iul, img_p)
    return out[:nb]
