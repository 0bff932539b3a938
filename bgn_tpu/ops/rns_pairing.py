"""Miller loop over the RNS/MXU field representation (fieldcore/rns.py).

Same contract and mathematical semantics as ops/pairing.py:miller_loop (the
TPU-native replacement for PBC's Tate pairing, reference bgn.go:300), but
every F_p element lives as a [batch, 2k] float32 residue vector and every
modular multiplication routes its O(k^2) base-extension work through bf16
matmuls on the MXU.  Conversion limb<->RNS happens once per pairing at
entry/exit; the scan interior is pure RNS.

Static bound discipline (values < bound*p, headroom h >= 1024):
loop invariants X, Y < 27p, Z < 6p, f_re, f_im < 9p; affine inputs < 3p
(they arrive through to_rns_mont).  Every r_mul's bound product is checked
at trace time against h; the worst case is HH = H*H at 30*30 = 900.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fieldcore import limbs as lb
from ..fieldcore import rns as rn
from ..fieldcore.montgomery import MontCtx
from ..fieldcore.rns import RNSCtx, RVal
from .curve import AffinePoint

# Loop-invariant bounds (multiples of p), audited in the module docstring.
_BX, _BY, _BZ, _BF = 27, 27, 6, 9


def _dbl_step(rns: RNSCtx, X, Y, Z, fr, fi, xb, yb):
    """Fused Jacobian doubling + tangent line + f <- f^2 * line.

    Raw-array in/out (scan-carry friendly); bounds are the invariants."""
    X, Y, Z = RVal(X, _BX), RVal(Y, _BY), RVal(Z, _BZ)
    FR, FI = RVal(fr, _BF), RVal(fi, _BF)

    def mul(u, v):
        return rn.r_mul(rns, u, v)

    def add(u, v):
        return rn.r_add(rns, u, v)

    def sub(u, v):
        return rn.r_sub(rns, u, v)

    XX = mul(X, X)
    ZZ = mul(Z, Z)
    ZZZ = mul(Z, ZZ)
    ZZZZ = mul(ZZ, ZZ)
    YY = mul(Y, Y)
    YYYY = mul(YY, YY)
    M = add(add(XX, add(XX, XX)), ZZZZ)
    T = mul(X, YY)
    S = add(T, T)
    S = add(S, S)
    MM = mul(M, M)
    X3 = sub(sub(MM, S), S)
    Y8 = add(YYYY, YYYY)
    Y8 = add(Y8, Y8)
    Y8 = add(Y8, Y8)
    Y3 = sub(mul(M, sub(S, X3)), Y8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    t1 = mul(ZZZ, xb)
    t2 = mul(X, Z)
    l_re = sub(mul(M, add(t1, t2)), mul(Z3, Y))
    l_im = mul(mul(Z3, ZZZ), yb)

    sq_re = mul(add(FR, FI), sub(FR, FI))
    ab = mul(FR, FI)
    sq_im = add(ab, ab)
    m0 = mul(sq_re, l_re)
    m1 = mul(sq_im, l_im)
    m2 = mul(add(sq_re, sq_im), add(l_re, l_im))
    f_re = sub(m0, m1)
    f_im = sub(sub(m2, m0), m1)

    assert X3.bound <= _BX and Y3.bound <= _BY and Z3.bound <= _BZ
    assert f_re.bound <= _BF and f_im.bound <= _BF
    return X3.v, Y3.v, Z3.v, f_re.v, f_im.v


def _add_step(rns: RNSCtx, X1, Y1, Z1, fr, fi, ax, ay, xb, yb):
    """Fused mixed addition + line through V,A + f <- f * line."""
    X1, Y1, Z1 = RVal(X1, _BX), RVal(Y1, _BY), RVal(Z1, _BZ)
    FR, FI = RVal(fr, _BF), RVal(fi, _BF)

    def mul(u, v):
        return rn.r_mul(rns, u, v)

    def add(u, v):
        return rn.r_add(rns, u, v)

    def sub(u, v):
        return rn.r_sub(rns, u, v)

    ZZ = mul(Z1, Z1)
    U2 = mul(ax, ZZ)
    ZZZ = mul(Z1, ZZ)
    S2 = mul(ay, ZZZ)
    H = sub(U2, X1)
    R = sub(S2, Y1)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(X1, HH)
    RR = mul(R, R)
    X3 = sub(sub(sub(RR, HHH), V), V)
    Y3 = sub(mul(R, sub(V, X3)), mul(Y1, HHH))
    Z3 = mul(Z1, H)
    l_re = sub(mul(R, add(xb, ax)), mul(Z3, ay))
    l_im = mul(Z3, yb)

    m0 = mul(FR, l_re)
    m1 = mul(FI, l_im)
    m2 = mul(add(FR, FI), add(l_re, l_im))
    f_re = sub(m0, m1)
    f_im = sub(sub(m2, m0), m1)

    assert X3.bound <= _BX and Y3.bound <= _BY and Z3.bound <= _BZ
    assert f_re.bound <= _BF and f_im.bound <= _BF
    return X3.v, Y3.v, Z3.v, f_re.v, f_im.v


def miller_loop_rns(ctx: MontCtx, rns: RNSCtx, a: AffinePoint,
                    b: AffinePoint, n_bits):
    """f_{n,A}(phi(B)); inputs limb-Montgomery, output [2, L, *batch]
    limb-Montgomery (same contract as ops/pairing.py:miller_loop)."""
    batch_shape = jnp.broadcast_shapes(a.x.shape[1:], b.x.shape[1:])
    L = ctx.L
    flat = 1
    for s in batch_shape:
        flat *= s

    def prep(x):
        v = rn.to_rns_mont(
            rns, lb.expand_to(x, (L,) + batch_shape).reshape(L, flat))
        return RVal(v.v, 3)

    ax, ay = prep(a.x), prep(a.y)
    xb, yb = prep(b.x), prep(b.y)
    one = rn.r_one(rns, (flat,))
    X0, Y0 = ax.v, ay.v
    Z0 = jnp.broadcast_to(one.v, ax.v.shape)
    f0 = Z0
    fi0 = jnp.zeros_like(f0)

    def step(carry, bit):
        X, Y, Z, fr, fi, started = carry
        bit_b = bit.astype(bool)

        def not_started(c):
            X, Y, Z, fr, fi, _ = c
            return (X, Y, Z, fr, fi,
                    jnp.where(bit_b, jnp.uint32(1), jnp.uint32(0)))

        def normal(c):
            X, Y, Z, fr, fi, st = c
            s1 = _dbl_step(rns, X, Y, Z, fr, fi, xb, yb)
            s2 = jax.lax.cond(
                bit_b,
                lambda s: _add_step(rns, *s, ax, ay, xb, yb),
                lambda s: s, s1)
            return s2 + (st,)

        return jax.lax.cond(started.astype(bool), normal, not_started,
                            carry), None

    carry0 = (X0, Y0, Z0, f0, fi0, jnp.uint32(0))
    (X, Y, Z, fr, fi, started), _ = jax.lax.scan(step, carry0, n_bits[:-1])

    def tail_started(c):
        X, Y, Z, fr, fi = c
        _, _, _, fr2, fi2 = _dbl_step(rns, X, Y, Z, fr, fi, xb, yb)
        return fr2, fi2

    fr, fi = jax.lax.cond(started.astype(bool), tail_started,
                          lambda c: (c[3], c[4]), (X, Y, Z, fr, fi))

    out_re = rn.from_rns_mont(rns, RVal(fr, _BF)).reshape(
        (L,) + batch_shape)
    out_im = rn.from_rns_mont(rns, RVal(fi, _BF)).reshape(
        (L,) + batch_shape)
    return jnp.stack([out_re, out_im], axis=0)
