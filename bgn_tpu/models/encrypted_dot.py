"""Encrypted dot-product: the flagship BGN workload (2-DNF / SIP pattern).

BGN's raison d'etre is evaluating one multiplication depth homomorphically:
given coordinate-wise encryptions E(x_i), E(y_i) of two vectors, compute an
L2 encryption of <x, y> as  prod_i e(Cx_i, Cy_i)  -- D pairings plus a GT
reduction, no interaction, no secret key.  (The reference exposes the
primitives for this -- Mult bgn.go:294 + Add bgn.go:442 -- but not the
composed kernel; this module is the batched, mesh-shardable composition.)

Shapes: ct_x, ct_y are L1 ciphertext batches of shape [D] (one vector) or
[D, B] (B vectors side by side).  The reduction is over axis 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import curve as cv
from ..ops import fp2
from ..ops import pairing as pairing_mod
from ..scheme import BGNPublicKey, Ciphertext, PublicDeviceKey


@jax.jit
def encrypted_dot_kernel(dev: PublicDeviceKey, x_pt: cv.AffinePoint,
                         y_pt: cv.AffinePoint):
    """[D, *batch] L1 points -> [*batch] GT element encrypting <x, y>."""
    ctx = dev.ctx
    z = pairing_mod.pairing(ctx, x_pt, y_pt, dev.n_bits, dev.l_bits,
                            rns=dev.rns)
    # GT product over the coordinate axis (axis 2), log-depth reduction
    D = z.shape[2]
    while D > 1:
        half = D // 2
        lo = z[:, :, :half]
        hi = z[:, :, half:2 * half]
        rest = z[:, :, 2 * half:]
        z = jnp.concatenate([fp2.mul(ctx, lo, hi), rest], axis=2)
        D = z.shape[2]
    return z[:, :, 0]


def encrypted_dot(pk: BGNPublicKey, ct_x: Ciphertext,
                  ct_y: Ciphertext) -> Ciphertext:
    """E(x_i), E(y_i) [D, *batch] -> E_L2(<x, y>) [*batch]."""
    if ct_x.level2 or ct_y.level2:
        raise ValueError("encrypted_dot needs level-1 inputs")
    out = encrypted_dot_kernel(pk.dev, ct_x.data, ct_y.data)
    return Ciphertext(out, level2=True)
