"""Pallas TPU kernels for the RNS Miller steps.

The XLA RNS path (ops/rns_pairing.py) is HBM-bound: every r_mul
materializes ~6-10 [batch, 2k] float32 intermediates to HBM between dots.
Here one kernel computes a whole Miller doubling/addition step with every
intermediate in VMEM, re-using the *same* step functions
(rns_pairing._dbl_step/_add_step) and field primitives (fieldcore/rns.py)
inside the kernel -- the math is written once; this module only changes
where it runs.  The base-extension dots hit the MXU from inside the
kernel (jnp.dot path, fp32 accumulation).

Per step the HBM traffic drops from ~100+ MB (at batch 2048) to one
read+write of the 9 state/point arrays (~13 MB), moving the bottleneck to
VPU/MXU compute.  Bit-identical to the XLA path (all math is exact fp32
integer arithmetic; see fieldcore/rns.py's exactness audit).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fieldcore.rns import RNSCtx

B_TILE = 256

# Constant inputs passed to every kernel, in order (all f32 except w1/w2).
_CONST_FIELDS = ("m", "recip", "kp", "negpinv_a", "crt_inv_a", "w1",
                 "a_mod_b", "p_mod_b", "ainv_b", "crt_inv_b", "w2",
                 "b_mod_a")


def _kctx(rns: RNSCtx, refs):
    """Value-view of the RNSCtx inside a kernel: same attribute surface as
    RNSCtx, fed from VMEM refs, so fieldcore/rns.py primitives run
    unchanged in-kernel."""
    vals = {name: ref[:] for name, ref in zip(_CONST_FIELDS, refs)}
    # 1-row constant vectors arrive as [1, width]; the field primitives
    # broadcast them against [B, 2k] arrays, so squeeze the row axis.
    for name in ("m", "recip", "negpinv_a", "crt_inv_a", "a_mod_b",
                 "p_mod_b", "ainv_b", "crt_inv_b", "b_mod_a"):
        vals[name] = vals[name][0]
    return types.SimpleNamespace(k=rns.k, h=rns.h, **vals)


def _dbl_kernel(rns, *refs):
    from . import rns_pairing as rp
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    x, y, z, fr, fi, xb, yb, ox, oy, oz, ofr, ofi = rest
    kc = _kctx(rns, consts)
    X3, Y3, Z3, FR, FI = rp._dbl_step(
        kc, x[:], y[:], z[:], fr[:], fi[:], rp._pt(xb[:]), rp._pt(yb[:]))
    ox[:], oy[:], oz[:], ofr[:], ofi[:] = X3, Y3, Z3, FR, FI


def _add_kernel(rns, *refs):
    from . import rns_pairing as rp
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    (x, y, z, fr, fi, ax, ay, xb, yb,
     ox, oy, oz, ofr, ofi) = rest
    kc = _kctx(rns, consts)
    X3, Y3, Z3, FR, FI = rp._add_step(
        kc, x[:], y[:], z[:], fr[:], fi[:],
        rp._pt(ax[:]), rp._pt(ay[:]), rp._pt(xb[:]), rp._pt(yb[:]))
    ox[:], oy[:], oz[:], ofr[:], ofi[:] = X3, Y3, Z3, FR, FI


def _const_arrays(rns: RNSCtx):
    out = []
    for name in _CONST_FIELDS:
        v = getattr(rns, name)
        if v.ndim == 1:
            v = v[None]                      # [1, width] for 2-D tiling
        out.append(v)
    return out


def _const_specs(rns: RNSCtx):
    specs = []
    for v in _const_arrays(rns):
        specs.append(pl.BlockSpec(
            v.shape, lambda i, nd=v.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
    return specs


def _state_spec(ch):
    return pl.BlockSpec((B_TILE, ch), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _pad_batch(arrs):
    n = arrs[0].shape[0]
    npad = -(-n // B_TILE) * B_TILE
    if npad != n:
        arrs = [jnp.pad(a, ((0, npad - n), (0, 0))) for a in arrs]
    return arrs, n, npad


def _call(rns: RNSCtx, kernel, state, interpret: bool):
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch(list(state))
    consts = _const_arrays(rns)
    out_shape = [jax.ShapeDtypeStruct((npad, ch), jnp.float32)] * 5
    outs = pl.pallas_call(
        functools.partial(kernel, rns),
        grid=(npad // B_TILE,),
        in_specs=_const_specs(rns) + [_state_spec(ch)] * len(arrs),
        out_specs=[_state_spec(ch)] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(*consts, *arrs)
    return [o[:n] for o in outs]


def dbl_step_pallas(rns: RNSCtx, X, Y, Z, fr, fi, xb, yb,
                    interpret: bool = False):
    """Same contract as rns_pairing._dbl_step (raw [N, 2k] f32 arrays)."""
    return _call(rns, _dbl_kernel, (X, Y, Z, fr, fi, xb.v, yb.v), interpret)


def add_step_pallas(rns: RNSCtx, X, Y, Z, fr, fi, ax, ay, xb, yb,
                    interpret: bool = False):
    return _call(rns, _add_kernel,
                 (X, Y, Z, fr, fi, ax.v, ay.v, xb.v, yb.v), interpret)
