"""Host <-> device conversions for curve points and GT elements.

Device arrays hold Montgomery-form limbs; host values are Python ints /
tuples as used by bgn_tpu.hostmath.  These run at keygen/serialization
boundaries only (the analog of pbc Element Bytes/SetBytes,
reference ciphertext.go:76-116, bgn.go:501-560).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fieldcore import limbs as lb
from ..fieldcore import montgomery as mg
from ..fieldcore.montgomery import MontCtx
from ..ops.curve import AffinePoint

HostPoint = Optional[Tuple[int, int]]
HostFp2 = Tuple[int, int]

# jitted conversion kernels (eager dispatch of the CIOS loop is very slow)
_to_mont = jax.jit(mg.to_mont)
_from_mont = jax.jit(mg.from_mont)


def affine_from_host(ctx: MontCtx, points: Sequence[HostPoint],
                     batch_shape=None) -> AffinePoint:
    """Host affine points (None = identity) -> AffinePoint [L, B]."""
    L = ctx.L
    xs = [0 if P is None else P[0] for P in points]
    ys = [0 if P is None else P[1] for P in points]
    infs = np.array([1 if P is None else 0 for P in points], dtype=np.uint32)
    x = _to_mont(ctx, jnp.asarray(lb.ints_to_limbs(xs, L)))
    y = _to_mont(ctx, jnp.asarray(lb.ints_to_limbs(ys, L)))
    ap = AffinePoint(x, y, jnp.asarray(infs))
    if batch_shape is not None:
        ap = AffinePoint(x.reshape((L,) + batch_shape),
                         y.reshape((L,) + batch_shape),
                         ap.inf.reshape(batch_shape))
    return ap


def point_from_host(ctx: MontCtx, P: HostPoint) -> AffinePoint:
    """Single host point -> AffinePoint with scalar batch shape ()."""
    ap = affine_from_host(ctx, [P])
    return AffinePoint(ap.x[:, 0], ap.y[:, 0], ap.inf[0])


def affine_to_host(ctx: MontCtx, ap: AffinePoint) -> List[HostPoint]:
    """AffinePoint [L, B] -> list of host points."""
    x = np.asarray(_from_mont(ctx, ap.x))
    y = np.asarray(_from_mont(ctx, ap.y))
    inf = np.asarray(ap.inf)
    out: List[HostPoint] = []
    for b in range(x.shape[1]):
        if inf[b]:
            out.append(None)
        else:
            out.append((lb.limbs_to_int(x[:, b]), lb.limbs_to_int(y[:, b])))
    return out


def fp2_from_host(ctx: MontCtx, vals: Sequence[HostFp2], batch_shape=None):
    """Host (re, im) tuples -> [2, L, B] Montgomery fp2 array."""
    L = ctx.L
    re = _to_mont(ctx, jnp.asarray(lb.ints_to_limbs([v[0] for v in vals], L)))
    im = _to_mont(ctx, jnp.asarray(lb.ints_to_limbs([v[1] for v in vals], L)))
    z = jnp.stack([re, im], axis=0)
    if batch_shape is not None:
        z = z.reshape((2, L) + batch_shape)
    return z


def fp2_single_from_host(ctx: MontCtx, v: HostFp2):
    return fp2_from_host(ctx, [v])[:, :, 0]


def fp2_to_host(ctx: MontCtx, z) -> List[HostFp2]:
    """[2, L, B] -> list of host (re, im) tuples."""
    re = np.asarray(_from_mont(ctx, z[0]))
    im = np.asarray(_from_mont(ctx, z[1]))
    return [(lb.limbs_to_int(re[:, b]), lb.limbs_to_int(im[:, b]))
            for b in range(re.shape[1])]
