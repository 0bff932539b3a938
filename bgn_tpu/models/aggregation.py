"""Private aggregation: homomorphic sums over encrypted contributions.

The classic additive-HE deployment (secure surveys / federated counters /
e-voting tallies): many parties submit E(x_i); the aggregator computes
E(sum x_i) without the secret key.  With BGN one can additionally weight
each contribution by an encrypted weight via one Mult:
tally = sum_i E(x_i) * E(w_i)  (an encrypted weighted sum at level 2).

Pure composition of scheme primitives (Add bgn.go:442 / Mult bgn.go:294),
batched over the contribution axis."""

from __future__ import annotations

import jax

from ..ops import curve as cv
from ..ops import fp2
from ..scheme import BGNPublicKey, Ciphertext, PublicDeviceKey


@jax.jit
def _sum_l1_kernel(dev: PublicDeviceKey, pts: cv.AffinePoint):
    """Tree-reduce a [N, *batch] batch of L1 points over axis 0."""
    ctx = dev.ctx
    x, y, inf = pts.x, pts.y, pts.inf
    N = x.shape[1]
    v = cv.to_jac(ctx, cv.AffinePoint(x[:, 0], y[:, 0], inf[0]))
    for i in range(1, N):
        v = cv.madd(ctx, v, cv.AffinePoint(x[:, i], y[:, i], inf[i]))
    return cv.normalize(ctx, v, rns=dev.rns)


def aggregate(pk: BGNPublicKey, contributions: Ciphertext) -> Ciphertext:
    """E(x_0..x_{N-1}) [N, *batch] -> E(sum x_i) [*batch]."""
    if contributions.level2:
        ctx = pk.dev.ctx
        z = contributions.data           # [2, L, N, *batch]
        out = z[:, :, 0]
        for i in range(1, z.shape[2]):
            out = fp2.mul(ctx, out, z[:, :, i])
        return Ciphertext(out, level2=True)
    return Ciphertext(_sum_l1_kernel(pk.dev, contributions.data),
                      level2=False)


def weighted_aggregate(pk: BGNPublicKey, values: Ciphertext,
                       weights: Ciphertext, rng=None) -> Ciphertext:
    """E(x_i), E(w_i) [N, *batch] -> E_L2(sum x_i * w_i): the 2-DNF
    weighted tally (one pairing per contribution + GT reduction)."""
    prods = pk.mult(values, weights, rng=rng)    # [N, *batch] L2
    return aggregate(pk, prods)
