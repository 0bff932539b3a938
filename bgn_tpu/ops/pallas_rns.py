"""Pallas TPU kernels for the RNS Miller steps.

The XLA RNS path (ops/rns_pairing.py) is HBM-bound: every r_mul
materializes ~6-10 [2k, batch] float32 intermediates to HBM between dots.
Here one kernel computes a whole Miller doubling/addition step with every
intermediate in VMEM, re-using the *same* step functions
(rns_pairing._dbl_step/_add_step) and field primitives (fieldcore/rns.py)
inside the kernel -- the math is written once; this module only changes
where it runs.  The base-extension dots hit the MXU from inside the
kernel (fp32 accumulation); arrays are channel-major [2k, B] so the batch
fills the lane axis completely.

Bit-identical to the XLA path (all math is exact fp32 integer arithmetic;
see fieldcore/rns.py's exactness audit)."""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fieldcore.rns import RNSCtx

B_TILE = 512

# Constant inputs passed to every kernel, in order.
_CONST_FIELDS = ("m", "recip", "kp", "qc_a", "w1", "p_mod_b", "ainv_b",
                 "crt_inv_b", "w2", "b_mod_a", "one_rns")


def _kctx(rns: RNSCtx, refs):
    """Value-view of the RNSCtx inside a kernel: same attribute surface as
    RNSCtx, fed from VMEM refs, so fieldcore/rns.py primitives run
    unchanged in-kernel."""
    vals = {name: ref[:] for name, ref in zip(_CONST_FIELDS, refs)}
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


def _const_specs(rns: RNSCtx):
    specs = []
    for name in _CONST_FIELDS:
        v = getattr(rns, name)
        specs.append(pl.BlockSpec(
            v.shape, lambda *_, nd=v.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
    return specs


def _state_spec(ch):
    return pl.BlockSpec((ch, B_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _pad_batch(arrs):
    n = arrs[0].shape[-1]
    npad = -(-n // B_TILE) * B_TILE
    if npad != n:
        arrs = [jnp.pad(a, ((0, 0), (0, npad - n))) for a in arrs]
    return arrs, n, npad


def _call(rns: RNSCtx, kernel, state, interpret: bool):
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch(list(state))
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    out_shape = [jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 5
    outs = pl.pallas_call(
        functools.partial(kernel, rns),
        grid=(npad // B_TILE,),
        in_specs=_const_specs(rns) + [_state_spec(ch)] * len(arrs),
        out_specs=[_state_spec(ch)] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(*consts, *arrs)
    return [o[:, :n] for o in outs]


def dbl_step_pallas(rns: RNSCtx, X, Y, Z, fr, fi, xb, yb,
                    interpret: bool = False):
    """Same contract as rns_pairing._dbl_step (raw [2k, N] f32 arrays)."""
    return _call(rns, _dbl_kernel, (X, Y, Z, fr, fi, xb.v, yb.v), interpret)


def add_step_pallas(rns: RNSCtx, X, Y, Z, fr, fi, ax, ay, xb, yb,
                    interpret: bool = False):
    return _call(rns, _add_kernel,
                 (X, Y, Z, fr, fi, ax.v, ay.v, xb.v, yb.v), interpret)


def _pt_dbl_kernel(rns, *refs):
    from . import rns_pairing as rp
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    x, y, z, ox, oy, oz = rest
    kc = _kctx(rns, consts)
    X3, Y3, Z3 = rp._dbl_pt(kc, x[:], y[:], z[:])
    ox[:], oy[:], oz[:] = X3, Y3, Z3


def _pt_add_kernel(rns, *refs):
    from . import rns_pairing as rp
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    x, y, z, ax, ay, ox, oy, oz = rest
    kc = _kctx(rns, consts)
    X3, Y3, Z3 = rp._add_pt(kc, x[:], y[:], z[:],
                            rp._pt(ax[:]), rp._pt(ay[:]))
    ox[:], oy[:], oz[:] = X3, Y3, Z3


def pt_dbl_pallas(rns: RNSCtx, X, Y, Z, interpret: bool = False):
    """RNS Jacobian doubling step (scalar-mult ladder)."""
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch([X, Y, Z])
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    out_shape = [jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 3
    outs = pl.pallas_call(
        functools.partial(_pt_dbl_kernel, rns),
        grid=(npad // B_TILE,),
        in_specs=_const_specs(rns) + [_state_spec(ch)] * 3,
        out_specs=[_state_spec(ch)] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*consts, *arrs)
    return [o[:, :n] for o in outs]


def pt_add_pallas(rns: RNSCtx, X, Y, Z, ax, ay, interpret: bool = False):
    """RNS mixed-addition step (scalar-mult ladder)."""
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch([X, Y, Z, ax.v, ay.v])
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    out_shape = [jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 3
    outs = pl.pallas_call(
        functools.partial(_pt_add_kernel, rns),
        grid=(npad // B_TILE,),
        in_specs=_const_specs(rns) + [_state_spec(ch)] * 5,
        out_specs=[_state_spec(ch)] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*consts, *arrs)
    return [o[:, :n] for o in outs]


# ---------------------------------------------------------------------------
# Final-exponentiation scan steps (square-and-multiply bodies)
# ---------------------------------------------------------------------------


def _pow_kernel(rns, bit_ref, *refs):
    """F_p square-and-multiply step: acc <- acc^2 * x^bit."""
    from ..fieldcore import rns as rn
    from ..fieldcore.rns import RVal
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    acc, x, out = rest
    kc = _kctx(rns, consts)
    sq = rn.r_mul(kc, RVal(acc[:], 3), RVal(acc[:], 3))
    mu = rn.r_mul(kc, sq, RVal(x[:], 16))
    out[:] = jnp.where(bit_ref[0] > 0, mu.v, sq.v)


def _fp2_pow_kernel(rns, bit_ref, *refs):
    """F_p^2 square-and-multiply step (the (conj(f)/f)^l scan body)."""
    from . import rns_pairing as rp
    from ..fieldcore.rns import RVal
    consts, rest = refs[:len(_CONST_FIELDS)], refs[len(_CONST_FIELDS):]
    ar, ai, xr, xi, owr, owi = rest
    kc = _kctx(rns, consts)
    sq = rp._fp2_sqr(kc, (RVal(ar[:], 9), RVal(ai[:], 9)))
    mu = rp._fp2_mul(kc, sq, (RVal(xr[:], 9), RVal(xi[:], 10)))
    sel = bit_ref[0] > 0
    owr[:] = jnp.where(sel, mu[0].v, sq[0].v)
    owi[:] = jnp.where(sel, mu[1].v, sq[1].v)


def _call_bit(rns: RNSCtx, kernel, bit, state, n_out: int, interpret: bool):
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch(list(state))
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    bit_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * n_out
    out_specs = [_state_spec(ch)] * n_out
    if n_out == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    outs = pl.pallas_call(
        functools.partial(kernel, rns),
        grid=(npad // B_TILE,),
        in_specs=[bit_spec] + _const_specs(rns) +
                 [_state_spec(ch)] * len(arrs),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(bit).astype(jnp.int32).reshape(1), *consts, *arrs)
    if n_out == 1:
        return outs[:, :n]
    return [o[:, :n] for o in outs]


def pow_step_pallas(rns: RNSCtx, acc, x, bit, interpret: bool = False):
    """acc^2 * x^bit; raw [2k, N] arrays (x bound <= 16)."""
    return _call_bit(rns, _pow_kernel, bit, (acc, x), 1, interpret)


def fp2_pow_step_pallas(rns: RNSCtx, ar, ai, xr, xi, bit,
                        interpret: bool = False):
    return _call_bit(rns, _fp2_pow_kernel, bit, (ar, ai, xr, xi), 2,
                     interpret)


# ---------------------------------------------------------------------------
# Whole-loop kernels: the entire Miller loop / exponentiation ladder as ONE
# pallas_call with the exponent bits in SMEM and the loop state living in
# VMEM *scratch* across a fori_loop -- no per-step dispatch, scan carries,
# or HBM round trips (VERDICT.md round-1 item 3).  Conditional steps use
# pl.when (a real scf.if branch: the addition is only EXECUTED on 1-bits,
# unlike an in-kernel lax.cond which predicates both sides).  The step math
# is the same rns_pairing functions the per-step kernels use, so results
# are bit-identical.
# ---------------------------------------------------------------------------


def _loop_call(rns: RNSCtx, kernel, scalars, state, n_out: int,
               n_scratch: int, interpret: bool):
    """Common wrapper: scalars -> SMEM, state arrays -> batch-tiled VMEM,
    n_scratch VMEM scratch buffers for the loop-resident state."""
    ch = 2 * rns.k
    arrs, n, npad = _pad_batch(list(state))
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(npad // B_TILE,),
        in_specs=[smem] * len(scalars) + _const_specs(rns) +
                 [_state_spec(ch)] * len(arrs),
        out_specs=[_state_spec(ch)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * n_out,
        scratch_shapes=[pltpu.VMEM((ch, B_TILE), jnp.float32)] * n_scratch,
        interpret=interpret,
    )(*scalars, *consts, *arrs)
    return [o[:, :n] for o in outs]


def _split_refs(refs, n_scalars):
    scalars = refs[:n_scalars]
    consts = refs[n_scalars:n_scalars + len(_CONST_FIELDS)]
    rest = refs[n_scalars + len(_CONST_FIELDS):]
    return scalars, consts, rest


def _miller_loop_kernel(rns, nsteps, *refs):
    from . import rns_pairing as rp
    (bits_ref, start_ref), consts, rest = _split_refs(refs, 2)
    ax, ay, xb, yb, ofr, ofi, sX, sY, sZ, sfr, sfi = rest
    kc = _kctx(rns, consts)
    axv, ayv, xbv, ybv = ax[:], ay[:], xb[:], yb[:]
    nayv = rp._neg_coord(kc, ayv)         # -A for signed (NAF) digits
    one = jnp.broadcast_to(kc.one_rns, axv.shape)
    # V = A (Z = 1), f = 1 at the MSB; leading zero digits are skipped via
    # the start index (same semantics as the started-flag scan)
    sX[:], sY[:], sZ[:] = axv, ayv, one
    sfr[:], sfi[:] = one, jnp.zeros_like(one)

    def _add_with(yv):
        st2 = rp._add_step(kc, sX[:], sY[:], sZ[:], sfr[:], sfi[:],
                           rp._pt(axv), rp._pt(yv),
                           rp._pt(xbv), rp._pt(ybv))
        sX[:], sY[:], sZ[:], sfr[:], sfi[:] = st2

    def body(i, carry):
        st = rp._dbl_step(kc, sX[:], sY[:], sZ[:], sfr[:], sfi[:],
                          rp._pt(xbv), rp._pt(ybv))
        sX[:], sY[:], sZ[:], sfr[:], sfi[:] = st

        # the final addition (V = -+A, vertical line) is elided:
        # denominator elimination, see ops/pairing.py docstring
        @pl.when(jnp.logical_and(bits_ref[i] > 0, i < nsteps - 1))
        def _add():
            _add_with(ayv)

        @pl.when(jnp.logical_and(bits_ref[i] < 0, i < nsteps - 1))
        def _add_neg():
            _add_with(nayv)

        return carry

    jax.lax.fori_loop(start_ref[0] + 1, nsteps, body, jnp.int32(0))
    ofr[:], ofi[:] = sfr[:], sfi[:]


def miller_loop_whole_pallas(rns: RNSCtx, ax, ay, xb, yb, digits,
                             interpret: bool = False):
    """The full Miller loop in one kernel.  ax/ay/xb/yb: [2k, N] residues
    (bound 3); digits: [nd] MSB-first shared exponent -- plain bits or
    signed NAF (first nonzero digit +1).  Returns (fr, fi) with the _BF
    bound invariant."""
    bits_i = digits.astype(jnp.int32)
    start = jnp.argmax(bits_i != 0).astype(jnp.int32).reshape(1)
    kernel = functools.partial(_miller_loop_kernel, rns, digits.shape[0])
    return _loop_call(rns, kernel, (bits_i, start), (ax, ay, xb, yb), 2, 5,
                      interpret)


def _ladder_loop_kernel(rns, nsteps, *refs):
    from . import rns_pairing as rp
    (bits_ref,), consts, rest = _split_refs(refs, 1)
    x, y, z, ax, ay, ox, oy, oz, sX, sY, sZ = rest
    kc = _kctx(rns, consts)
    axv, ayv = ax[:], ay[:]
    nayv = rp._neg_coord(kc, ayv)         # -A for signed (NAF) digits
    sX[:], sY[:], sZ[:] = x[:], y[:], z[:]

    def _add_with(yv):
        st2 = rp._add_pt(kc, sX[:], sY[:], sZ[:],
                         rp._pt(axv), rp._pt(yv))
        sX[:], sY[:], sZ[:] = st2

    def body(i, carry):
        st = rp._dbl_pt(kc, sX[:], sY[:], sZ[:])
        sX[:], sY[:], sZ[:] = st

        @pl.when(bits_ref[i] > 0)
        def _add():
            _add_with(ayv)

        @pl.when(bits_ref[i] < 0)
        def _add_neg():
            _add_with(nayv)

        return carry

    jax.lax.fori_loop(0, nsteps, body, jnp.int32(0))
    ox[:], oy[:], oz[:] = sX[:], sY[:], sZ[:]


def ladder_loop_pallas(rns: RNSCtx, X, Y, Z, ax, ay, digits,
                       interpret: bool = False):
    """Double-and-add ladder over MSB-first digits (plain bits or signed
    NAF; all consumed -- the caller strips the leading +1 and passes the
    start state), one kernel."""
    bits_i = digits.astype(jnp.int32)
    kernel = functools.partial(_ladder_loop_kernel, rns, digits.shape[0])
    return _loop_call(rns, kernel, (bits_i,), (X, Y, Z, ax.v, ay.v), 3, 3,
                      interpret)


def _pow_loop_kernel(rns, nsteps, *refs):
    from ..fieldcore import rns as rn
    from ..fieldcore.rns import RVal
    (bits_ref,), consts, rest = _split_refs(refs, 1)
    x, out, sacc = rest
    kc = _kctx(rns, consts)
    xv = x[:]
    sacc[:] = jnp.broadcast_to(kc.one_rns, xv.shape)

    def body(i, carry):
        sq = rn.r_mul(kc, RVal(sacc[:], 3), RVal(sacc[:], 3))
        sacc[:] = sq.v

        @pl.when(bits_ref[i] > 0)
        def _mul():
            mu = rn.r_mul(kc, RVal(sacc[:], 3), RVal(xv, 16))
            sacc[:] = mu.v

        return carry

    jax.lax.fori_loop(0, nsteps, body, jnp.int32(0))
    out[:] = sacc[:]


def pow_loop_pallas(rns: RNSCtx, x, bits, interpret: bool = False):
    """x^e in F_p (square-and-multiply over all bits), one kernel;
    x: [2k, N] residues with bound <= 16."""
    bits_i = bits.astype(jnp.int32)
    kernel = functools.partial(_pow_loop_kernel, rns, bits.shape[0])
    return _loop_call(rns, kernel, (bits_i,), (x,), 1, 1, interpret)[0]


def _fp2_pow_loop_kernel(rns, nsteps, *refs):
    from . import rns_pairing as rp
    from ..fieldcore.rns import RVal
    (bits_ref,), consts, rest = _split_refs(refs, 1)
    xr, xi, owr, owi, sar, sai = rest
    kc = _kctx(rns, consts)
    xrv, xiv = xr[:], xi[:]
    # conj(x) for signed digits (x is unitary at every signed-digit call
    # site: see fp2_pow_rns): negate im, value 10p - xi, bound 10
    t = kc.kp[:, 10:11] - xiv
    nxiv = jnp.where(t < 0, t + kc.m, t)
    sar[:] = jnp.broadcast_to(kc.one_rns, xrv.shape)
    sai[:] = jnp.zeros_like(xrv)

    def _mul_with(xivv):
        mu = rp._fp2_mul(kc, (RVal(sar[:], 9), RVal(sai[:], 9)),
                         (RVal(xrv, 9), RVal(xivv, 10)))
        sar[:], sai[:] = mu[0].v, mu[1].v

    def body(i, carry):
        sq = rp._fp2_sqr(kc, (RVal(sar[:], 9), RVal(sai[:], 9)))
        sar[:], sai[:] = sq[0].v, sq[1].v

        @pl.when(bits_ref[i] > 0)
        def _mul():
            _mul_with(xiv)

        @pl.when(bits_ref[i] < 0)
        def _mul_conj():
            _mul_with(nxiv)

        return carry

    jax.lax.fori_loop(0, nsteps, body, jnp.int32(0))
    owr[:], owi[:] = sar[:], sai[:]


def fp2_pow_loop_pallas(rns: RNSCtx, xr, xi, digits,
                        interpret: bool = False):
    """(xr + xi*i)^e in F_p^2 over all MSB-first digits, one kernel;
    signed digits multiply by the conjugate (unitary x only)."""
    bits_i = digits.astype(jnp.int32)
    kernel = functools.partial(_fp2_pow_loop_kernel, rns, digits.shape[0])
    return _loop_call(rns, kernel, (bits_i,), (xr, xi), 2, 2, interpret)


def _win_ladder_kernel(rns, nwin, *refs):
    from . import rns_pairing as rp
    consts = refs[:len(_CONST_FIELDS)]
    gx, gy, ginf, ox, oy, oz, sX, sY, sZ, sst = refs[len(_CONST_FIELDS):]
    kc = _kctx(rns, consts)
    j = pl.program_id(1)
    rx, ry = gx[0], gy[0]                     # [ch, B] window-j entries
    live = (1.0 - ginf[0])                    # [1, B]: entry not identity
    one = jnp.broadcast_to(kc.one_rns, rx.shape)

    @pl.when(j == 0)
    def _init():
        sX[:], sY[:], sZ[:] = jnp.zeros_like(rx), jnp.zeros_like(rx), one
        sst[:] = jnp.zeros_like(rx)

    # one mixed addition per window; identity/unstarted lanes are fixed up
    # by the flag selects below (garbage adds never escape)
    aX, aY, aZ = rp._add_pt(kc, sX[:], sY[:], sZ[:],
                            rp._pt(rx), rp._pt(ry))
    st = sst[:]
    init = live * (1.0 - st)                  # first live window: acc = entry
    upd = live * st                           # live later window: acc += entry
    sX[:] = jnp.where(init > 0, rx, jnp.where(upd > 0, aX, sX[:]))
    sY[:] = jnp.where(init > 0, ry, jnp.where(upd > 0, aY, sY[:]))
    sZ[:] = jnp.where(init > 0, one, jnp.where(upd > 0, aZ, sZ[:]))
    sst[:] = jnp.maximum(st, jnp.broadcast_to(live, st.shape))

    @pl.when(j == nwin - 1)
    def _out():
        ox[:], oy[:] = sX[:], sY[:]
        # e = 0 (no live window): zero residues -> limb zero -> identity
        oz[:] = jnp.where(sst[:] > 0, sZ[:], 0.0)


def _win_ladder_tab_kernel(rns, nwin, R, ch, ch8, *refs):
    """Window ladder with IN-KERNEL table-row selection: instead of a
    pre-gathered [Jd, 2k, B] entry stream (HBM-gather bound at ~3 GB/s,
    the round-3 encrypt floor -- VERDICT r3 item 2), each window step
    selects its [2k, B] entries from the resident selection matrix by a
    one-hot matmul on the MXU.  The matrix is precomputed at key build
    (scheme._win_sel_matrix / rns_pairing.make_rns_window_table):
    residues split into 6-bit halves (bf16-exact), quarters 8-sublane
    aligned so the row slices below never relayout.  Exactness: the
    one-hot operand is {0, 1} and every product/row-sum is a single
    nonzero term in fp32 accumulation -- the same audit as
    fieldcore/rns.py's _split6."""
    from . import rns_pairing as rp
    consts = refs[:len(_CONST_FIELDS)]
    w, dig, ox, oy, oz, sX, sY, sZ, sst = refs[len(_CONST_FIELDS):]
    kc = _kctx(rns, consts)
    j = pl.program_id(1)
    d = dig[0, 0]                             # [B] f32 digit values
    W = w[0]                                  # [4ch8, R] bf16 window block
    B = d.shape[0]

    iota = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    onehot = (iota == d.astype(jnp.int32)[None, :]).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(W, onehot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    rx = sel[0:ch] * 64.0 + sel[ch8:ch8 + ch]
    ry = sel[2 * ch8:2 * ch8 + ch] * 64.0 + sel[3 * ch8:3 * ch8 + ch]

    # digit 0 selects the identity row in every window (scheme._window_table
    # builds rows as [O, base, 2*base, ...]), so the flag needs no gather
    live = (d != 0.0).astype(jnp.float32)[None]     # [1, B]
    one = jnp.broadcast_to(kc.one_rns, rx.shape)

    @pl.when(j == 0)
    def _init():
        sX[:], sY[:], sZ[:] = jnp.zeros_like(rx), jnp.zeros_like(rx), one
        sst[:] = jnp.zeros_like(rx)

    aX, aY, aZ = rp._add_pt(kc, sX[:], sY[:], sZ[:],
                            rp._pt(rx), rp._pt(ry))
    st = sst[:]
    init = live * (1.0 - st)
    upd = live * st
    sX[:] = jnp.where(init > 0, rx, jnp.where(upd > 0, aX, sX[:]))
    sY[:] = jnp.where(init > 0, ry, jnp.where(upd > 0, aY, sY[:]))
    sZ[:] = jnp.where(init > 0, one, jnp.where(upd > 0, aZ, sZ[:]))
    sst[:] = jnp.maximum(st, jnp.broadcast_to(live, st.shape))

    @pl.when(j == nwin - 1)
    def _out():
        ox[:], oy[:] = sX[:], sY[:]
        oz[:] = jnp.where(sst[:] > 0, sZ[:], 0.0)


def window_ladder_tab_pallas(rns: RNSCtx, wsel, ch: int, digits,
                             interpret: bool = False):
    """Fixed-base window accumulation with MXU table selection, one
    kernel.  wsel: bf16 [J, 4*ch8, R] precomputed selection matrix (each
    [4ch8, R] window block streams to VMEM once per batch tile);
    digits: uint [Jd, N] per-lane window digits, Jd <= J.  Returns
    (X, Y, Z) residues, Z = 0 for exponent-0 lanes -- bit-identical to
    window_ladder_pallas on the gathered stream."""
    Jd, n = digits.shape
    C4, R = wsel.shape[1], wsel.shape[2]
    ch8 = C4 // 4
    npad = -(-n // B_TILE) * B_TILE
    dig = digits.astype(jnp.float32)
    if npad != n:
        dig = jnp.pad(dig, ((0, 0), (0, npad - n)))   # pad digit 0: identity
    # Mosaic block-shape rule: the per-window digit row rides as
    # [Jd, 1, N] so its block (1, 1, B_TILE) matches the singleton dim
    dig = dig.reshape(Jd, 1, npad)
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    outs = pl.pallas_call(
        functools.partial(_win_ladder_tab_kernel, rns, Jd, R, ch, ch8),
        grid=(npad // B_TILE, Jd),
        in_specs=_const_specs(rns) + [
            pl.BlockSpec((1, C4, R), lambda t, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B_TILE), lambda t, j: (j, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ch, B_TILE), lambda t, j: (0, t),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((ch, B_TILE), jnp.float32)] * 4,
        interpret=interpret,
    )(*consts, wsel, dig)
    return [o[:, :n] for o in outs]


def _jac_add_full(kc, X1, Y1, Z1, X2, Y2, Z2):
    """General Jacobian + Jacobian addition in RNS (both inputs live,
    neither the identity; degenerate +- equality cases are excluded by
    the caller's probability argument).  Bound audit inline; returns
    bounds (12, 6, 3) <= the ladder invariants."""
    from ..fieldcore import rns as rn
    from ..fieldcore.rns import RVal
    x1, y1, z1 = RVal(X1, 27), RVal(Y1, 27), RVal(Z1, 6)
    x2, y2, z2 = RVal(X2, 27), RVal(Y2, 27), RVal(Z2, 6)
    Z1Z1, Z2Z2, T1, T2, Z1Z2 = rn.r_mul_many(
        kc, [(z1, z1), (z2, z2), (y1, z2), (y2, z1), (z1, z2)])
    U1, U2, S1, S2 = rn.r_mul_many(
        kc, [(x1, Z2Z2), (x2, Z1Z1), (T1, Z2Z2), (T2, Z1Z1)])
    H = rn.r_sub(kc, U2, U1)                   # bound 6
    Rr = rn.r_sub(kc, S2, S1)                  # bound 6
    HH, RR = rn.r_mul_many(kc, [(H, H), (Rr, Rr)])
    HHH, V, Z3 = rn.r_mul_many(kc, [(H, HH), (U1, HH), (Z1Z2, H)])
    X3 = rn.r_sub(kc, rn.r_sub(kc, rn.r_sub(kc, RR, HHH), V), V)  # 12
    RVX3, S1HHH = rn.r_mul_many(kc, [(Rr, rn.r_sub(kc, V, X3)),
                                     (S1, HHH)])
    Y3 = rn.r_sub(kc, RVX3, S1HHH)             # bound 6
    return X3.v, Y3.v, Z3.v


def _dual_ladder_kernel(rns, nwin, Jm, R, ch, ch8, *refs):
    """BOTH encrypt window chains (P^|m| then Q^r) + the final point
    addition in ONE kernel: window blocks stream over the sequential
    grid dim, the two accumulators live in VMEM scratch, and the combine
    g +- h happens in-kernel -- no intermediate Jacobian points ever
    round-trip HBM and the separate madd/normalize(h) launches of the
    split path disappear (the round-4 encrypt fusion).

    Selection is the same one-hot MXU dot as _win_ladder_tab_kernel.
    m_neg lanes negate the first accumulator's Y before the combine
    (C = P^-|m| * Q^r).  Identity handling is flag-exact: st1/st2 track
    whether each chain saw a live window; the general Jacobian addition
    is degenerate only when P^m == +-Q^r, i.e. m == -+ r*q2*R mod ord --
    unreachable without solving the discrete log (documented in
    docs/PERF.md)."""
    from . import rns_pairing as rp
    consts = refs[:len(_CONST_FIELDS)]
    (w, dig, mneg, ox, oy, oz,
     sX1, sY1, sZ1, st1, sX2, sY2, sZ2, st2) = refs[len(_CONST_FIELDS):]
    kc = _kctx(rns, consts)
    j = pl.program_id(1)
    d = dig[0, 0]                             # [B] f32 digit values
    W = w[0]                                  # [4ch8, R] bf16 window block
    B = d.shape[0]

    iota = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    onehot = (iota == d.astype(jnp.int32)[None, :]).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(W, onehot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    rx = sel[0:ch] * 64.0 + sel[ch8:ch8 + ch]
    ry = sel[2 * ch8:2 * ch8 + ch] * 64.0 + sel[3 * ch8:3 * ch8 + ch]

    live = (d != 0.0).astype(jnp.float32)[None]     # [1, B]
    one = jnp.broadcast_to(kc.one_rns, rx.shape)

    @pl.when(j == 0)
    def _init():
        z = jnp.zeros_like(rx)
        sX1[:], sY1[:], sZ1[:], st1[:] = z, z, one, z
        sX2[:], sY2[:], sZ2[:], st2[:] = z, z, one, z

    def _step(sX, sY, sZ, sst):
        aX, aY, aZ = rp._add_pt(kc, sX[:], sY[:], sZ[:],
                                rp._pt(rx), rp._pt(ry))
        st = sst[:]
        init = live * (1.0 - st)
        upd = live * st
        sX[:] = jnp.where(init > 0, rx, jnp.where(upd > 0, aX, sX[:]))
        sY[:] = jnp.where(init > 0, ry, jnp.where(upd > 0, aY, sY[:]))
        sZ[:] = jnp.where(init > 0, one, jnp.where(upd > 0, aZ, sZ[:]))
        sst[:] = jnp.maximum(st, jnp.broadcast_to(live, st.shape))

    @pl.when(j < Jm)
    def _chain_m():
        _step(sX1, sY1, sZ1, st1)

    @pl.when(j >= Jm)
    def _chain_r():
        _step(sX2, sY2, sZ2, st2)

    @pl.when(j == nwin - 1)
    def _combine():
        # negate g's Y where m < 0 (value 27p - y stays bound 27)
        negY = kc.kp[:, 27:28] - sY1[:]
        negY = jnp.where(negY < 0, negY + kc.m, negY)
        Y1 = jnp.where(mneg[0] > 0, negY, sY1[:])
        X3, Y3, Z3 = _jac_add_full(kc, sX1[:], Y1, sZ1[:],
                                   sX2[:], sY2[:], sZ2[:])
        live1 = st1[:] > 0
        live2 = st2[:] > 0
        both = jnp.logical_and(live1, live2)
        ox[:] = jnp.where(both, X3, jnp.where(live1, sX1[:], sX2[:]))
        oy[:] = jnp.where(both, Y3, jnp.where(live1, Y1, sY2[:]))
        oz[:] = jnp.where(both, Z3,
                          jnp.where(live1, sZ1[:],
                                    jnp.where(live2, sZ2[:], 0.0)))


def dual_ladder_pallas(rns: RNSCtx, wsel, ch: int, Jm: int, digits, m_neg,
                       interpret: bool = False):
    """Fused encrypt core: C = P^(+-m) * Q^r as one kernel.

    wsel: bf16 [Jm + Jr, 4*ch8, R] concatenated selection blocks (the
    first Jm windows from the P table, the rest from the Q table);
    digits: uint [Jm + Jr, N] window digits (m's then r's); m_neg:
    uint [N] negate-g mask.  Returns (X, Y, Z) residues with the ladder
    bound invariants; Z = 0 encodes the identity (m = 0 AND r = 0)."""
    Jt, n = digits.shape
    C4, R = wsel.shape[1], wsel.shape[2]
    ch8 = C4 // 4
    npad = -(-n // B_TILE) * B_TILE
    dig = digits.astype(jnp.float32)
    mn = m_neg.astype(jnp.float32).reshape(1, n)
    if npad != n:
        dig = jnp.pad(dig, ((0, 0), (0, npad - n)))
        mn = jnp.pad(mn, ((0, 0), (0, npad - n)))
    dig = dig.reshape(Jt, 1, npad)
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    outs = pl.pallas_call(
        functools.partial(_dual_ladder_kernel, rns, Jt, Jm, R, ch, ch8),
        grid=(npad // B_TILE, Jt),
        in_specs=_const_specs(rns) + [
            pl.BlockSpec((1, C4, R), lambda t, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B_TILE), lambda t, j: (j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_TILE), lambda t, j: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ch, B_TILE), lambda t, j: (0, t),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((ch, B_TILE), jnp.float32)] * 8,
        interpret=interpret,
    )(*consts, wsel, dig, mn)
    return [o[:, :n] for o in outs]


def window_ladder_pallas(rns: RNSCtx, gx, gy, ginf, interpret: bool = False):
    """Fixed-base window accumulation in ONE kernel: the window axis rides
    the (sequential) second grid dimension, streaming each gathered entry
    block HBM->VMEM while the accumulator lives in VMEM scratch.

    gx/gy: [Jd, 2k, N] gathered per-window entries (bound 3);
    ginf: [Jd, N] float {0,1} identity flags.  Returns (X, Y, Z) residue
    arrays with Z = 0 for lanes whose exponent was 0."""
    ch = 2 * rns.k
    Jd, _, n = gx.shape
    npad = -(-n // B_TILE) * B_TILE
    if npad != n:
        pad3 = ((0, 0), (0, 0), (0, npad - n))
        gx = jnp.pad(gx, pad3)
        gy = jnp.pad(gy, pad3)
        ginf = jnp.pad(ginf, ((0, 0), (0, npad - n)), constant_values=1.0)
    # Mosaic needs the last-two block dims to divide (8, 128) or equal the
    # array dims; the per-window flag row rides as [Jd, 1, N] so its block
    # (1, 1, B_TILE) matches the singleton dim exactly.
    ginf3 = ginf.reshape(Jd, 1, npad)
    consts = [getattr(rns, name) for name in _CONST_FIELDS]
    outs = pl.pallas_call(
        functools.partial(_win_ladder_kernel, rns, Jd),
        grid=(npad // B_TILE, Jd),
        in_specs=_const_specs(rns) + [
            pl.BlockSpec((1, ch, B_TILE), lambda t, j: (j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, B_TILE), lambda t, j: (j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B_TILE), lambda t, j: (j, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ch, B_TILE), lambda t, j: (0, t),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ch, npad), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((ch, B_TILE), jnp.float32)] * 4,
        interpret=interpret,
    )(*consts, gx, gy, ginf3)
    return [o[:, :n] for o in outs]
