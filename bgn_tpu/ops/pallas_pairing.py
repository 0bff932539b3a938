"""Fused Pallas Miller-step kernels: the EMult hot loop as two kernels.

The XLA pairing path (ops/pairing.py) calls ~21 separate mont_mul Pallas
kernels per Miller doubling step, each with its own uint32<->digit
conversions, pad/reshape glue and HBM round trip.  Here one kernel computes
the whole doubling(+line+f-update) step and one the whole addition step,
with the loop state (V, f) kept in the fp32 8-bit-digit domain ACROSS the
scan, so conversions happen once per pairing instead of ~13k times.

Digit domain: an F_p element is [L8, S, W] f32 with L8 = 2L 8-bit digits
(same exactness regime as fieldcore/pallas_mont.py: every intermediate
integer < 2^24).  In-kernel primitives:
  - `_mul`: CIOS as a fori_loop over digit rows; the flat accumulator is a
    VMEM scratch ref, one operand is staged for dynamic row reads, window
    updates are single read-modify-writes of an [L8]-row slice;
  - `_mod_add`/`_mod_sub`/`_dbl_mod`: statically unrolled digit ripples
    (~6 ops/row, negligible vs a mul).

Enabled from ops/pairing.py on TPU via BGN_TPU_FUSED_MILLER (default on);
the XLA path remains the semantics reference and CPU/test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
TILE_B = SUBLANES * LANES

C256 = 256.0
INV256 = 1.0 / 256.0  # python float: literals only, pallas kernels cannot capture arrays


# ---------------------------------------------------------------------------
# XLA-side digit conversions (once per pairing)
# ---------------------------------------------------------------------------


def to_digits(x):
    """uint32 16-bit limbs [L, *b] -> f32 8-bit digits [2L, *b]."""
    L = x.shape[0]
    lo = (x & 0xFF).astype(jnp.float32)
    hi = (x >> 8).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=1).reshape((2 * L,) + x.shape[1:])


def from_digits(d):
    """f32 8-bit digits [2L, *b] -> uint32 16-bit limbs [L, *b]."""
    L8 = d.shape[0]
    u = d.astype(jnp.uint32).reshape((L8 // 2, 2) + d.shape[1:])
    return u[:, 0] + (u[:, 1] << 8)


# ---------------------------------------------------------------------------
# In-kernel digit-domain primitives
# ---------------------------------------------------------------------------


def _mod256(x):
    return x - jnp.floor(x * INV256) * C256


def _ripple(rows_in, L8):
    """Normalize a list of lazy digit rows (< 2^24) to canonical digits.
    Returns (rows, carry_out)."""
    carry = jnp.zeros_like(rows_in[0])
    rows = []
    for j in range(L8):
        s = rows_in[j] + carry
        carry = jnp.floor(s * INV256)
        rows.append(s - carry * C256)
    return rows, carry


def _cond_sub_p(rows, extra, p8v, L8):
    """rows (canonical digits) + extra*2^(8*L8) minus p if >= p.

    extra: carry-out row (0/1) representing a value beyond the top digit.
    Value is < 2p so (extra=1) always means subtract."""
    cc = jnp.ones_like(rows[0])
    drows = []
    for j in range(L8):
        s = rows[j] + (255.0 - p8v[j]) + cc
        cc = jnp.floor(s * INV256)
        drows.append(s - cc * C256)
    geq = jnp.logical_or(extra > 0.5, cc > 0.5)
    return [jnp.where(geq, d, r) for d, r in zip(drows, rows)]


def _stack(rows):
    return jnp.stack(rows, axis=0)


def _mod_add(x, y, p8v, L8):
    """(x + y) mod p on [L8, S, W] digit values; ~6 ops/row, unrolled."""
    s = x + y
    rows, carry = _ripple([s[j] for j in range(L8)], L8)
    return _stack(_cond_sub_p(rows, carry, p8v, L8))


def _dbl_mod(x, p8v, L8):
    return _mod_add(x, x, p8v, L8)


def _mod_sub(x, y, p8v, L8):
    """(x - y) mod p: two's-complement ripple, add p back on borrow."""
    cc = jnp.ones_like(x[0])
    rows = []
    for j in range(L8):
        s = x[j] + (255.0 - y[j]) + cc
        cc = jnp.floor(s * INV256)
        rows.append(s - cc * C256)
    borrow = cc < 0.5                    # x < y
    cc2 = jnp.zeros_like(x[0])
    rows2 = []
    for j in range(L8):
        s = rows[j] + p8v[j] + cc2
        cc2 = jnp.floor(s * INV256)
        rows2.append(s - cc2 * C256)
    return _stack([jnp.where(borrow, r2, r)
                   for r, r2 in zip(rows, rows2)])


def _make_mul(T_ref, OA_ref, p8v, pinv, L8):
    """Returns mul(x, y): CIOS Montgomery product of digit values.

    x is staged into OA_ref for dynamic row reads; y is captured by the
    fori body as a value; the accumulator T_ref is a [2*L8+1, S, W] VMEM
    scratch.  Output digits are canonical (< p)."""
    p_win = p8v[:L8]                     # [L8, 1, 1] value

    def mul(x, y):
        OA_ref[:] = x
        T_ref[:] = jnp.zeros(T_ref.shape, T_ref.dtype)

        def body(i, _):
            ai = OA_ref[i]               # [S, W] dynamic row
            prod = ai[None] * y          # [L8, S, W]
            twin = T_ref[pl.ds(i, L8)]
            t0 = twin[0] + prod[0]
            m = _mod256(_mod256(t0) * pinv)
            upd = twin + prod + m[None] * p_win
            carry = jnp.floor(upd[0] * INV256)[None]
            upd = jnp.concatenate(
                [upd[:1], upd[1:2] + carry, upd[2:]], axis=0)
            T_ref[pl.ds(i, L8)] = upd
            return 0

        jax.lax.fori_loop(0, L8, body, 0)
        t_rows = [T_ref[L8 + j] for j in range(L8 + 1)]
        rows, _ = _ripple(t_rows, L8 + 1)
        # rows has L8+1 entries; value < 2p: top row is 0 or 1 after ripple
        out = _cond_sub_p(rows[:L8], rows[L8], _p_rows(p8v, L8), L8)
        return _stack(out)

    return mul


def _p_rows(p8v, L8):
    """[L8, 1, 1] p value -> list of [1, 1] digit rows."""
    return [p8v[j] for j in range(L8)]


# ---------------------------------------------------------------------------
# The two Miller-step kernels
# ---------------------------------------------------------------------------


def _dbl_step_kernel(p_ref, pinv_ref, vx, vy, vz, fr, fi, bx, by,
                     ox, oy, oz, ofr, ofi, T_ref, OA_ref, *, L8: int):
    """Fused Jacobian doubling + tangent line + f <- f^2 * line.

    Line formulas as in ops/pairing.py _dbl_with_line (same scale-factor
    freedom: factors in F_p^* die in the final exponentiation)."""
    p8v = p_ref[:]                       # [L8, 1, 1]
    pinv = pinv_ref[0, 0]
    mul = _make_mul(T_ref, OA_ref, p8v, pinv, L8)
    pv = _p_rows(p8v, L8)

    def add(x, y):
        return _mod_add(x, y, pv, L8)

    def sub(x, y):
        return _mod_sub(x, y, pv, L8)

    X, Y, Z = vx[:], vy[:], vz[:]
    FR, FI = fr[:], fi[:]
    XB, YB = bx[:], by[:]

    XX = mul(X, X)
    ZZ = mul(Z, Z)
    ZZZ = mul(Z, ZZ)
    ZZZZ = mul(ZZ, ZZ)
    YY = mul(Y, Y)
    YYYY = mul(YY, YY)
    M = add(add(XX, add(XX, XX)), ZZZZ)
    T1 = mul(X, YY)
    S = add(T1, T1)
    S = add(S, S)
    MM = mul(M, M)
    X3 = sub(sub(MM, S), S)
    Y8 = add(YYYY, YYYY)
    Y8 = add(Y8, Y8)
    Y8 = add(Y8, Y8)
    Y3 = sub(mul(M, sub(S, X3)), Y8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    t1 = mul(ZZZ, XB)
    t2 = mul(X, Z)
    l_re = sub(mul(M, add(t1, t2)), mul(Z3, Y))
    l_im = mul(mul(Z3, ZZZ), YB)

    # f^2 (complex square) then * line (Karatsuba)
    sq_re = mul(add(FR, FI), sub(FR, FI))
    ab = mul(FR, FI)
    sq_im = add(ab, ab)
    m0 = mul(sq_re, l_re)
    m1 = mul(sq_im, l_im)
    m2 = mul(add(sq_re, sq_im), add(l_re, l_im))
    f_re = sub(m0, m1)
    f_im = sub(sub(m2, m0), m1)

    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3
    ofr[:] = f_re
    ofi[:] = f_im


def _add_step_kernel(p_ref, pinv_ref, vx, vy, vz, fr, fi, ax, ay, bx, by,
                     ox, oy, oz, ofr, ofi, T_ref, OA_ref, *, L8: int):
    """Fused mixed addition V + A + line through V,A + f <- f * line."""
    p8v = p_ref[:]
    pinv = pinv_ref[0, 0]
    mul = _make_mul(T_ref, OA_ref, p8v, pinv, L8)
    pv = _p_rows(p8v, L8)

    def add(x, y):
        return _mod_add(x, y, pv, L8)

    def sub(x, y):
        return _mod_sub(x, y, pv, L8)

    X1, Y1, Z1 = vx[:], vy[:], vz[:]
    FR, FI = fr[:], fi[:]
    XA, YA = ax[:], ay[:]
    XB, YB = bx[:], by[:]

    ZZ = mul(Z1, Z1)
    U2 = mul(XA, ZZ)
    ZZZ = mul(Z1, ZZ)
    S2 = mul(YA, ZZZ)
    H = sub(U2, X1)
    R = sub(S2, Y1)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(X1, HH)
    RR = mul(R, R)
    X3 = sub(sub(sub(RR, HHH), V), V)
    Y3 = sub(mul(R, sub(V, X3)), mul(Y1, HHH))
    Z3 = mul(Z1, H)
    l_re = sub(mul(R, add(XB, XA)), mul(Z3, YA))
    l_im = mul(Z3, YB)

    m0 = mul(FR, l_re)
    m1 = mul(FI, l_im)
    m2 = mul(add(FR, FI), add(l_re, l_im))
    f_re = sub(m0, m1)
    f_im = sub(sub(m2, m0), m1)

    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3
    ofr[:] = f_re
    ofi[:] = f_im


# ---------------------------------------------------------------------------
# XLA-side wrappers
# ---------------------------------------------------------------------------


def _state_specs(L8, n_arrays):
    spec = pl.BlockSpec((L8, SUBLANES, TILE_B // SUBLANES),
                        lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return [spec] * n_arrays


def _p_specs(L8):
    return [
        pl.BlockSpec((L8, 1, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]


def _scratch(L8):
    W = TILE_B // SUBLANES
    return [
        pltpu.VMEM((2 * L8 + 1, SUBLANES, W), jnp.float32),
        pltpu.VMEM((L8, SUBLANES, W), jnp.float32),
    ]


def _prep_p(ctx):
    L = ctx.L
    plo = (ctx.p & 0xFF).astype(jnp.float32)
    phi = (ctx.p >> 8).astype(jnp.float32)
    p8 = jnp.stack([plo, phi], axis=1).reshape(2 * L, 1, 1)
    pinv8 = (ctx.pinv & 0xFF).astype(jnp.float32).reshape(1, 1)
    return p8, pinv8


def _tile_shape(x, L8):
    """[L8, B] -> [L8, 8, B/8] (B padded to TILE_B)."""
    B = x.shape[1]
    Bp = -(-B // TILE_B) * TILE_B
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B)))
    return x.reshape(L8, SUBLANES, Bp // SUBLANES), B, Bp


def dbl_step(ctx, V, f, Bq, interpret: bool = False):
    """V=(X,Y,Z) digit arrays [L8, B]; f=(re,im); Bq=(xb,yb).
    Returns (V', f')."""
    L8 = 2 * ctx.L
    p8, pinv8 = _prep_p(ctx)
    arrs = [V[0], V[1], V[2], f[0], f[1], Bq[0], Bq[1]]
    tiled = []
    for x in arrs:
        t, B, Bp = _tile_shape(x, L8)
        tiled.append(t)
    W = Bp // SUBLANES
    out_shape = [jax.ShapeDtypeStruct((L8, SUBLANES, W), jnp.float32)] * 5
    kernel = functools.partial(_dbl_step_kernel, L8=L8)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=_p_specs(L8) + _state_specs(L8, 7),
        out_specs=_state_specs(L8, 5),
        out_shape=out_shape,
        scratch_shapes=_scratch(L8),
        interpret=interpret,
    )(p8, pinv8, *tiled)
    outs = [o.reshape(L8, Bp)[:, :B] for o in outs]
    return (outs[0], outs[1], outs[2]), (outs[3], outs[4])


def add_step(ctx, V, f, A, Bq, interpret: bool = False):
    """Mixed addition step; A=(xa, ya) digit arrays."""
    L8 = 2 * ctx.L
    p8, pinv8 = _prep_p(ctx)
    arrs = [V[0], V[1], V[2], f[0], f[1], A[0], A[1], Bq[0], Bq[1]]
    tiled = []
    for x in arrs:
        t, B, Bp = _tile_shape(x, L8)
        tiled.append(t)
    W = Bp // SUBLANES
    out_shape = [jax.ShapeDtypeStruct((L8, SUBLANES, W), jnp.float32)] * 5
    kernel = functools.partial(_add_step_kernel, L8=L8)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=_p_specs(L8) + _state_specs(L8, 9),
        out_specs=_state_specs(L8, 5),
        out_shape=out_shape,
        scratch_shapes=_scratch(L8),
        interpret=interpret,
    )(p8, pinv8, *tiled)
    outs = [o.reshape(L8, Bp)[:, :B] for o in outs]
    return (outs[0], outs[1], outs[2]), (outs[3], outs[4])
