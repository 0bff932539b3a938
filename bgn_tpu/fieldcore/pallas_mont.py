"""Pallas TPU kernel for batched Montgomery multiplication.

Same contract as montgomery.mont_mul ([L, B] uint32 limbs in, [L, B] out)
with the whole unrolled CIOS chain + normalization compiled as ONE Mosaic
kernel.  Two things make this fast where the XLA path is not:

  - the lazy-carry accumulator is an explicit list of limb ROWS that live
    in vector registers/VMEM for their whole lifetime (no buffer
    materialization, no scatter -- Mosaic has no scatter-add lowering);
  - the batch is laid out [L, 8, W] so every row op is a full (8, 128)
    VPU tile: a flat [1, B] row would use 1/8 of the sublanes.

Enabled on TPU via montgomery.mont_mul's dispatch (BGN_TPU_PALLAS=0
disables); tests exercise it in interpreter mode on CPU."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as lb

LIMB_BITS = lb.LIMB_BITS
LIMB_MASK = lb.LIMB_MASK

SUBLANES = 8
LANES = 128
TILE_B = SUBLANES * LANES  # 1024 batch elements per grid step


def _cios_kernel(p_ref, pinv_ref, a_ref, b_ref, out_ref, *, L: int):
    b = b_ref[:]                      # [L, 8, W]
    p = p_ref[:]                      # [L, 1, 1]
    pinv = pinv_ref[0, 0]
    zero = jnp.zeros_like(b[0])
    T = [zero for _ in range(2 * L + 1)]

    for i in range(L):
        ai = a_ref[i]                 # [8, W]
        prod = ai[None] * b           # [L, 8, W], exact in uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        for j in range(L):
            T[i + j] = T[i + j] + lo[j]
            T[i + j + 1] = T[i + j + 1] + hi[j]
        m = ((T[i] & LIMB_MASK) * pinv) & LIMB_MASK
        q = m[None] * p               # [L, 8, W]
        qlo = q & LIMB_MASK
        qhi = q >> LIMB_BITS
        for j in range(L):
            T[i + j] = T[i + j] + qlo[j]
            T[i + j + 1] = T[i + j + 1] + qhi[j]
        T[i + 1] = T[i + 1] + (T[i] >> LIMB_BITS)

    # value < 2p lives in rows [L, 2L]; ripple-normalize (carry < 2^8, no
    # overflow), then conditional subtract p by two's-complement ripple.
    carry = zero
    rows = []
    for j in range(L + 1):
        s = T[L + j] + carry
        rows.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    cc = jnp.ones_like(zero)
    drows = []
    for j in range(L + 1):
        pj = p[j] if j < L else jnp.zeros_like(p[0])
        s = rows[j] + (LIMB_MASK - pj) + cc
        drows.append(s & LIMB_MASK)
        cc = s >> LIMB_BITS
    geq = cc.astype(bool)             # value >= p
    res = [jnp.where(geq, d, r) for d, r in zip(drows[:L], rows[:L])]
    out_ref[:] = jnp.stack(res, axis=0)


def _cios_kernel_f32(p_ref, pinv_ref, a_ref, b_ref, out_ref, *, L8: int):
    """8-bit-limb CIOS entirely in fp32 (full-rate VPU mult/add).

    Exactness audit: digits < 2^8, products < 2^16; a flat-accumulator
    position receives at most (L8+1) iterations x 2*65025 < 2^24 for
    L8 <= 128, so every intermediate is an integer exactly representable
    in fp32.  Digit extraction uses floor(x/256) (exact: power of two)."""
    b = b_ref[:]                      # [L8, 8, W] f32 digits
    p = p_ref[:]                      # [L8, 1, 1] f32
    pinv = pinv_ref[0, 0]             # f32
    c256 = jnp.float32(256.0)
    inv256 = jnp.float32(1.0 / 256.0)
    zero = jnp.zeros_like(b[0])
    T = [zero for _ in range(2 * L8 + 1)]

    def mod256(x):
        return x - jnp.floor(x * inv256) * c256

    for i in range(L8):
        ai = a_ref[i]
        prod = ai[None] * b           # [L8, 8, W] ints < 2^16
        for j in range(L8):
            T[i + j] = T[i + j] + prod[j]
        m = mod256(mod256(T[i]) * pinv)
        q = m[None] * p
        for j in range(L8):
            T[i + j] = T[i + j] + q[j]
        T[i + 1] = T[i + 1] + jnp.floor(T[i] * inv256)

    carry = zero
    rows = []
    for j in range(L8 + 1):
        s = T[L8 + j] + carry
        carry = jnp.floor(s * inv256)
        rows.append(s - carry * c256)
    cc = jnp.ones_like(zero)
    drows = []
    for j in range(L8 + 1):
        pj = p[j] if j < L8 else jnp.zeros_like(p[0])
        s = rows[j] + (jnp.float32(255.0) - pj) + cc
        cc = jnp.floor(s * inv256)
        drows.append(s - cc * c256)
    geq = cc > 0.5
    res = [jnp.where(geq, d, r) for d, r in zip(drows[:L8], rows[:L8])]
    out_ref[:] = jnp.stack(res, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mont_mul_pallas_f32(ctx, a, b, interpret: bool = False):
    """Batched Montgomery product via the fp32 8-bit-digit kernel.

    Contract identical to mont_mul; requires 2*L + 1 <= 129 positions per
    lifetime bound (key_bits <= ~990), which callers must check."""
    L = ctx.L
    L8 = 2 * L
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = lb.expand_to(a, (L,) + batch_shape)
    b = lb.expand_to(b, (L,) + batch_shape)
    B = 1
    for s in batch_shape:
        B *= s

    def to8(x):
        x2 = x.reshape(L, -1)
        lo = (x2 & 0xFF).astype(jnp.float32)
        hi = (x2 >> 8).astype(jnp.float32)
        return jnp.stack([lo, hi], axis=1).reshape(L8, x2.shape[1])

    a8 = to8(a)
    b8 = to8(b)
    Bp = -(-B // TILE_B) * TILE_B
    if Bp != B:
        a8 = jnp.pad(a8, ((0, 0), (0, Bp - B)))
        b8 = jnp.pad(b8, ((0, 0), (0, Bp - B)))
    W = Bp // SUBLANES
    a3 = a8.reshape(L8, SUBLANES, W)
    b3 = b8.reshape(L8, SUBLANES, W)
    WT = TILE_B // SUBLANES

    p8 = to8(ctx.p.reshape(L, 1)).reshape(L8, 1, 1)
    # -p^-1 mod 256 is just pinv mod 256: p*pinv == -1 (mod 2^16) implies
    # the same congruence mod 2^8.
    pinv8 = (ctx.pinv & 0xFF).astype(jnp.float32).reshape(1, 1)

    kernel = functools.partial(_cios_kernel_f32, L8=L8)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((L8, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L8, SUBLANES, WT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L8, SUBLANES, WT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L8, SUBLANES, WT), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L8, SUBLANES, W), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(p8, jnp.float32), pinv8, a3, b3)

    out = out.reshape(L8, Bp)[:, :B].astype(jnp.uint32)
    out16 = out.reshape(L, 2, B)
    res = out16[:, 0] + (out16[:, 1] << 8)
    return res.reshape((L,) + batch_shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mont_mul_pallas(ctx, a, b, interpret: bool = False):
    """Batched Montgomery product via the Pallas kernel.

    a, b: [L, *batch]; batch is flattened and padded to TILE_B."""
    L = ctx.L
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = lb.expand_to(a, (L,) + batch_shape)
    b = lb.expand_to(b, (L,) + batch_shape)
    B = 1
    for s in batch_shape:
        B *= s
    a2 = a.reshape(L, B)
    b2 = b.reshape(L, B)
    Bp = -(-B // TILE_B) * TILE_B
    if Bp != B:
        a2 = jnp.pad(a2, ((0, 0), (0, Bp - B)))
        b2 = jnp.pad(b2, ((0, 0), (0, Bp - B)))
    W = Bp // SUBLANES
    a3 = a2.reshape(L, SUBLANES, W)
    b3 = b2.reshape(L, SUBLANES, W)
    WT = TILE_B // SUBLANES

    kernel = functools.partial(_cios_kernel, L=L)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((L, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, SUBLANES, WT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, SUBLANES, WT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, SUBLANES, WT), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, SUBLANES, W), jnp.uint32),
        interpret=interpret,
    )(ctx.p.reshape(L, 1, 1), ctx.pinv.reshape(1, 1), a3, b3)
    return out.reshape(L, Bp)[:, :B].reshape((L,) + batch_shape)
