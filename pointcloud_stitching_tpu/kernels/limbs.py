"""Exact bf16 limb decomposition via Veltkamp splits — ONE definition.

The precision-critical trick both MXU kernels depend on (the packed
voxel segment reduce and the TSDF patch gather): f32 values decompose
into bf16 limbs whose MXU products against an exact bf16 operand
reconstruct the full-precision product at a fraction of HIGHEST's cost.

Limb extraction must NOT be an f32->bf16->f32 cast pair: under
``--xla_allow_excess_precision`` (on in the TPU toolchain) XLA may fold
that pair to a no-op, zeroing every residual limb and silently degrading
the sum to bf16 (bit us in interpret mode; compiled Mosaic kept the
casts — tests pass on one backend and fail on the other).
``lax.reduce_precision`` would be the semantic fix but has no Mosaic
lowering, so use a Veltkamp split: with s = 2^16 + 1, ``c - (c - v)``
keeps the top 8 significant bits — exactly bf16's significand — via
plain mul/add/sub that no value-safe compiler can elide. The subsequent
bf16 casts are exact (the limbs are already 8-bit-significand values),
so folding them is harmless. This used to live as two hand-maintained
copies (r5 review); any future toolchain workaround goes HERE.
"""
from __future__ import annotations

import jax.numpy as jnp


def bf16_limbs(v, n: int) -> list:
    """Split f32 ``v`` into ``n`` bf16 limbs summing exactly to it.

    n=3 reconstructs any f32 exactly (8+8+8 >= 24 significand bits);
    n=2 is exact only for values with <= 16 significant bits — integers
    in [-65535, 65535], e.g. raw u16 depth images or quantised color.
    """
    # created inside the call, NOT at module level: a module-level jnp
    # scalar initialises the backend at import time (breaking late
    # jax.distributed.initialize) AND is a captured constant Pallas
    # kernels reject
    split = jnp.float32(65537.0)         # 2^16 + 1
    c = v * split
    hi_f = c - (c - v)
    hi = hi_f.astype(jnp.bfloat16)
    r1 = v - hi_f                        # exact: Sterbenz-range subtract
    if n == 2:
        # r1 has <= 8 significant bits left for <=16-bit inputs, so the
        # direct cast is exact (and immune to the cast-pair fold: there
        # is no preceding f32->bf16 to pair it with)
        return [hi, r1.astype(jnp.bfloat16)]
    c2 = r1 * split
    mid_f = c2 - (c2 - r1)
    mid = mid_f.astype(jnp.bfloat16)
    return [hi, mid, (r1 - mid_f).astype(jnp.bfloat16)]
