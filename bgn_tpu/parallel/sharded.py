"""Sharded scheme operations: data-parallel batches + giant-step-parallel
BSGS decryption.

Two scaling axes (SURVEY.md §2.3 / §5):
  - DP (batch sharding): ciphertext batches are sharded along 'data'; the
    scheme kernels are elementwise over the batch, so under jit with
    sharded inputs they run SPMD with zero communication.  The helpers here
    just place data and document out-shardings.
  - Giant-step sharding (the SP/CP analog): the BSGS lookup loop scales as
    sqrt(msg_space); for large message spaces the i-range i in [0, bound]
    is partitioned across devices under shard_map.  Each device starts its
    chunk at csk * gamma_inv^(device*chunk) (a tiny ladder over the device
    index), scans its slice against the replicated baby-step table, and the
    first hit is combined with a min-reduction over the mesh axis -- all
    hits for a given csk encode the same m, so min is exact first-hit
    semantics (gsbs.go:98).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..fieldcore import limbs as lb
from ..ops import bsgs as bsgs_mod
from ..ops import fp2
from .mesh import DATA_AXIS, replicate, shard_ciphertext

_NOT_FOUND = jnp.int32(2 ** 31 - 1)


# ---------------------------------------------------------------------------
# Data-parallel scheme ops
# ---------------------------------------------------------------------------


def encrypt_sharded(pk, ms, mesh, rng=None):
    """Encrypt a host batch directly into a sharded ciphertext."""
    ct = pk.encrypt(ms, rng=rng)
    return shard_ciphertext(ct, mesh)


def mult_sharded(pk, a, b, mesh, rng=None):
    """Pairing EMult on sharded batches: pure DP, no collectives."""
    dev = replicate(pk.dev, mesh)

    pk2 = _with_dev(pk, dev)
    return pk2.mult(a, b, rng=rng)


def _with_dev(pk, dev):
    import copy
    pk2 = copy.copy(pk)
    pk2.dev = dev
    return pk2


# ---------------------------------------------------------------------------
# Giant-step-sharded BSGS decryption
# ---------------------------------------------------------------------------


def _device_chunk(bound: int, ndev: int):
    chunk = -(-(bound + 1) // ndev)
    return chunk


@partial(jax.jit, static_argnames=("mesh", "bound"))
def _bsgs_gt_sharded(ctx, table, gamma_inv, csk, mesh, bound: int):
    """Giant-step-sharded GT lookup: csk [2, L, *batch] already = c^q1."""
    ndev = mesh.shape[DATA_AXIS]
    chunk = _device_chunk(bound, ndev)
    L = ctx.L
    batch_shape = csk.shape[2:]

    # gamma_inv^chunk, computed once (host-static exponent bits)
    chunk_bits = jnp.asarray(lb.int_to_bits(chunk, max(chunk.bit_length(), 1)))
    gi = lb.expand_to(gamma_inv, (2, L) + batch_shape)
    gi_chunk = fp2.pow_bits(ctx, gi, chunk_bits)

    def shard_fn(csk_l, gi_l, gi_chunk_l, table_l):
        d = jax.lax.axis_index(DATA_AXIS)
        # start = csk * (gamma_inv^chunk)^d  -- tiny ladder over device index
        acc = fp2.one(ctx, batch_shape)
        for k in reversed(range(max(ndev - 1, 1).bit_length())):
            acc = fp2.sqr(ctx, acc)
            bit = ((d >> k) & 1).astype(jnp.uint32)
            muld = fp2.mul(ctx, acc, gi_chunk_l)
            acc = fp2.select(jnp.broadcast_to(bit, batch_shape), muld, acc)
        aux0 = fp2.mul(ctx, csk_l, acc)

        def chain(z, _):
            return fp2.mul(ctx, z, gi_l), z

        _, auxs = jax.lax.scan(chain, aux0, None, length=chunk)
        auxs = jnp.moveaxis(auxs, 0, 2)        # [2, L, chunk, *batch]
        words = auxs.reshape((2 * L,) + auxs.shape[2:])
        hits, vals = bsgs_mod._lookup(table_l, words)
        # local i = d*chunk + j; encode candidate m or NOT_FOUND
        jidx = jnp.arange(chunk, dtype=jnp.int32)
        i_global = (d.astype(jnp.int32) * chunk + jidx).reshape(
            (chunk,) + (1,) * len(batch_shape))
        in_range = (i_global <= bound)
        cand = jnp.where(
            hits.astype(bool) & in_range,
            i_global * bound + vals.astype(jnp.int32) + 1,
            _NOT_FOUND)
        local_best = jnp.min(cand, axis=0)
        best = jax.lax.pmin(local_best, DATA_AXIS)
        return best

    best = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(csk, gi, gi_chunk, table)
    found = best != _NOT_FOUND
    return found, jnp.where(found, best, 0)


def decrypt_gt_sharded(pk, sk, tables, ct, mesh):
    """Sharded L2 decryption: DP over the batch is implicit; the giant-step
    range is split over the mesh.  Mirrors reference decrypt semantics
    (positive then negative lane, identity => 0)."""
    ctx = pk.dev.ctx
    csk = _csk_gt(pk.dev, sk.q1_bits, ct.data)
    neg = fp2.conj(ctx, csk)
    f_p, m_p = _bsgs_gt_sharded(ctx, tables.table_gt, tables.gamma_inv_gt,
                                csk, mesh, tables.bound)
    f_n, m_n = _bsgs_gt_sharded(ctx, tables.table_gt, tables.gamma_inv_gt,
                                neg, mesh, tables.bound)
    is_zero = fp2.is_one(ctx, csk).astype(bool)
    m = jnp.where(f_p, m_p, -m_n)
    m = jnp.where(is_zero, 0, m)
    found = is_zero | f_p | f_n
    return np.asarray(m, dtype=np.int64), np.asarray(found)


@jax.jit
def _csk_gt(dev, q1_bits, z):
    return fp2.pow_bits(dev.ctx, z, q1_bits)
