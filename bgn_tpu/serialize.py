"""Serialization of keys and ciphertext batches (reference: gob wrappers,
bgn.go:595-666, ciphertext.go:76-116, bgn.go:501-560).

Byte-compatibility with Go's gob is a non-goal (SURVEY.md §5); value
compatibility is: a saved key/ciphertext reloads to identical group
elements.  Keys go to JSON (hex ints); ciphertext batches go to npz with
canonical (non-Montgomery) limb arrays, so files are portable across limb
widths and backends.

Canonical element bytes (used for gadget hashing and table digests on the
host side) are fixed-width big-endian x||y / re||im, the analog of pbc's
Element.Bytes (the reference keys BSGS tables on Element.String,
gsbs.go:23)."""

from __future__ import annotations

import io
import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import hostmath as hm
from .ops import curve as cv
from .scheme import (BGNPublicKey, BGNSecretKey, Ciphertext,
                     PolyEncodingParams)

_FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# Canonical element bytes
# ---------------------------------------------------------------------------


def coord_nbytes(pk: BGNPublicKey) -> int:
    return 2 * pk.dev.ctx.L  # 16-bit limbs -> 2 bytes each


def point_bytes(pk: BGNPublicKey, P) -> bytes:
    """Canonical bytes of a host point: x||y big-endian; O = all zeros."""
    nb = coord_nbytes(pk)
    if P is None:
        return b"\x00" * (2 * nb)
    return P[0].to_bytes(nb, "big") + P[1].to_bytes(nb, "big")


def gt_bytes(pk: BGNPublicKey, z: Tuple[int, int]) -> bytes:
    nb = coord_nbytes(pk)
    return z[0].to_bytes(nb, "big") + z[1].to_bytes(nb, "big")


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


def public_key_to_json(pk: BGNPublicKey) -> str:
    """Analog of PublicKey.MarshalBinary (bgn.go:597-622)."""
    d = {
        "version": _FORMAT_VERSION,
        "key_bits": pk.key_bits,
        "n": hex(pk.n),
        "l": hex(pk.l),
        "p": hex(pk.p),
        "msg_space": pk.msg_space,
        "deterministic": pk.deterministic,
        "poly_base": pk.poly_params.poly_base,
        "fp_scale_base": pk.poly_params.fp_scale_base,
        "fp_precision": pk.poly_params.fp_precision,
        "P": [hex(pk.P_host[0]), hex(pk.P_host[1])],
        "Q": [hex(pk.Q_host[0]), hex(pk.Q_host[1])],
        # digit encoding keygen chose for the Miller chain ("naf"/"bits"):
        # replayed on load so both views of the key use the same chain
        "n_digits": getattr(pk, "n_digits_kind", None),
    }
    return json.dumps(d)


def public_key_from_json(s: str) -> BGNPublicKey:
    """Analog of PublicKey.UnmarshalBinary (bgn.go:626-666): rebuilds the
    device context from the serialized params."""
    from .scheme import public_key_from_parts

    d = json.loads(s)
    if d["version"] != _FORMAT_VERSION:
        raise ValueError("unsupported key format version")
    poly_params = PolyEncodingParams(d["poly_base"], d["fp_scale_base"],
                                     d["fp_precision"])
    return public_key_from_parts(
        key_bits=d["key_bits"], n=int(d["n"], 16), l=int(d["l"], 16),
        p=int(d["p"], 16), msg_space=d["msg_space"],
        deterministic=d["deterministic"], poly_params=poly_params,
        P_host=tuple(int(v, 16) for v in d["P"]),
        Q_host=tuple(int(v, 16) for v in d["Q"]),
        n_digits=d.get("n_digits"))


def secret_key_to_json(sk: BGNSecretKey) -> str:
    a1 = sk.a1_params
    return json.dumps({
        "version": _FORMAT_VERSION,
        "q1": hex(a1.q1), "q2": hex(a1.q2), "n": hex(a1.n),
        "l": hex(a1.l), "p": hex(a1.p),
        "r": hex(sk.r), "poly_base": sk.poly_base,
    })


def secret_key_from_json(s: str) -> BGNSecretKey:
    d = json.loads(s)
    if d["version"] != _FORMAT_VERSION:
        raise ValueError("unsupported key format version")
    params = hm.A1Params(q1=int(d["q1"], 16), q2=int(d["q2"], 16),
                         n=int(d["n"], 16), l=int(d["l"], 16),
                         p=int(d["p"], 16))
    return BGNSecretKey(params, int(d["r"], 16), d["poly_base"])


# ---------------------------------------------------------------------------
# Ciphertexts
# ---------------------------------------------------------------------------


def _mont_scale_limbs(pk: BGNPublicKey, a: np.ndarray, factor: int
                      ) -> np.ndarray:
    """x -> x*factor mod p over a [L, *batch] limb array, on host ints.

    The Montgomery entry/exit scaling at the serialization boundary runs
    host-side for the same reason as utils/convert.py: a jitted device
    from_mont/to_mont here would cold-compile per batch shape."""
    from .fieldcore import limbs as lb

    L = a.shape[0]
    flat = a.reshape(L, -1)
    vals = [v * factor % pk.p for v in lb.limbs_to_ints(flat)]
    return lb.ints_to_limbs(vals, L).reshape(a.shape)


def _from_mont_np(pk: BGNPublicKey, a) -> np.ndarray:
    R = 1 << (16 * pk.dev.ctx.L)
    return _mont_scale_limbs(pk, np.asarray(a), pow(R, -1, pk.p))


def _to_mont_dev(pk: BGNPublicKey, a: np.ndarray):
    R = 1 << (16 * pk.dev.ctx.L)
    return jnp.asarray(_mont_scale_limbs(pk, a, R % pk.p))


def ciphertext_to_bytes(pk: BGNPublicKey, ct: Ciphertext) -> bytes:
    """Analog of Ciphertext.Bytes (ciphertext.go:76-90): npz of canonical
    limb arrays + level flag."""
    buf = io.BytesIO()
    if ct.level2:
        np.savez(buf, level2=np.int32(1),
                 re=_from_mont_np(pk, ct.data[0]),
                 im=_from_mont_np(pk, ct.data[1]))
    else:
        np.savez(buf, level2=np.int32(0),
                 x=_from_mont_np(pk, ct.data.x),
                 y=_from_mont_np(pk, ct.data.y),
                 inf=np.asarray(ct.data.inf))
    return buf.getvalue()


def validate_g1_values(pk: BGNPublicKey, xs, ys, infs) -> None:
    """Load-time checks for level-1 ciphertext points (VERDICT r3 item
    6): coordinates < p and on-curve (the reference's SetBytes,
    bgn.go:517-524, accepts anything).  Host ints over the batch; the
    full order-n subgroup check is intentionally out of scope here
    (O(batch) scalar mults -- interop.conformance runs it on vectors)."""
    p = pk.p
    for i, (x, y, inf) in enumerate(zip(xs, ys, infs)):
        if inf:
            continue
        if not (0 <= x < p and 0 <= y < p):
            raise ValueError(f"ciphertext[{i}]: coordinate >= p")
        if (y * y - (x * x * x + x)) % p != 0:
            raise ValueError(f"ciphertext[{i}]: point not on the curve")


def validate_gt_values(pk: BGNPublicKey, res, ims) -> None:
    """Load-time checks for level-2 (GT) values: coordinates < p and
    norm(z) == 1 (GT lies in the unitary subgroup of F_p^2; a corrupted
    element fails this with overwhelming probability, at two mulmods per
    element instead of a full z^n test)."""
    p = pk.p
    for i, (re, im) in enumerate(zip(res, ims)):
        if not (0 <= re < p and 0 <= im < p):
            raise ValueError(f"ciphertext[{i}]: GT coordinate >= p")
        if (re * re + im * im) % p != 1:
            raise ValueError(f"ciphertext[{i}]: GT value not unitary "
                             "(corrupt or not a pairing value)")


def ciphertext_from_bytes(pk: BGNPublicKey, data: bytes,
                          validate: bool = True) -> Ciphertext:
    """Analog of NewCiphertextFromBytes (bgn.go:501-526): needs pk to
    rebind the field context.  validate=True (default) rejects
    off-curve / out-of-range material instead of decrypting garbage."""
    from .fieldcore import limbs as lb

    if len(data) == 0:
        raise ValueError("no data provided")
    z = np.load(io.BytesIO(data))
    if int(z["level2"]):
        if validate:
            L = pk.dev.ctx.L
            validate_gt_values(pk,
                               lb.limbs_to_ints(z["re"].reshape(L, -1)),
                               lb.limbs_to_ints(z["im"].reshape(L, -1)))
        R = 1 << (16 * pk.dev.ctx.L)
        zz = np.stack([_mont_scale_limbs(pk, z["re"], R % pk.p),
                       _mont_scale_limbs(pk, z["im"], R % pk.p)], axis=0)
        return Ciphertext(jnp.asarray(zz), True)
    if validate:
        L = pk.dev.ctx.L
        validate_g1_values(pk,
                           lb.limbs_to_ints(z["x"].reshape(L, -1)),
                           lb.limbs_to_ints(z["y"].reshape(L, -1)),
                           np.asarray(z["inf"]).reshape(-1))
    x = _to_mont_dev(pk, z["x"])
    y = _to_mont_dev(pk, z["y"])
    return Ciphertext(cv.AffinePoint(x, y, jnp.asarray(z["inf"])), False)


def poly_ciphertext_to_bytes(pk: BGNPublicKey, pct) -> bytes:
    """Analog of PolyCiphertext.Bytes (ciphertext.go:94-116)."""
    inner = ciphertext_to_bytes(pk, pct.ct)
    buf = io.BytesIO()
    np.savez(buf, degree=np.int32(pct.degree),
             scale_factor=np.int32(pct.scale_factor),
             ct=np.frombuffer(inner, dtype=np.uint8))
    return buf.getvalue()


def poly_ciphertext_from_bytes(pk: BGNPublicKey, data: bytes):
    """Analog of NewPolyCiphertextFromBytes (bgn.go:530-560)."""
    if len(data) == 0:
        raise ValueError("no data provided")
    from .polyct import PolyCiphertext

    z = np.load(io.BytesIO(data))
    ct = ciphertext_from_bytes(pk, z["ct"].tobytes())
    return PolyCiphertext(ct, int(z["degree"]), int(z["scale_factor"]))
