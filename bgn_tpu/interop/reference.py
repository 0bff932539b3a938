"""Import/export of the Go reference's serialized artifacts.

Wrapper structs (all gob-encoded by the reference):
  - ciphertextWrapper{CBytes []byte, L2 bool}            ciphertext.go:17-20
  - polyCiphertextWrapper{CoeffBytes [][]byte, Degree int,
        ScaleFactor int, L2 bool}                        ciphertext.go:34-39
  - publicKeyWrapper{G1, P, Q []byte, N, MsgSpace *big.Int,
        PairingParams string, Deterministic bool,
        PolyEncodingParams *PolyEncodingParams}          bgn.go:43-55
  - PolyEncodingParams{PolyBase, FPScaleBase int,
        FPPrecision float64}                             bgn.go:20-24

Element bytes use pbc's layout (interop/pbc.py); params strings use PBC's
a1 format.  `import_reference_key` / `load_reference_vectors` consume the
JSON that tools/dump_reference.go produces from a live sachaservan/bgn
checkout, giving the value-level conformance channel SURVEY.md §4 calls
for (fixed key + fixed randomness => identical ciphertext bytes).
"""

from __future__ import annotations

import base64
import json
from typing import List, Optional, Tuple

import numpy as np

from .. import hostmath as hm
from ..scheme import (BGNPublicKey, BGNSecretKey, Ciphertext,
                      PolyEncodingParams, public_key_from_parts)
from ..utils import convert
from . import gob, pbc

# -- gob schemas of the reference wrapper structs --

BIG_INT_T = gob.gob_encoder_type("Int")

CIPHERTEXT_WRAPPER_T = gob.struct_of("ciphertextWrapper", [
    ("CBytes", gob.BYTES_T),
    ("L2", gob.BOOL_T),
])

POLY_CIPHERTEXT_WRAPPER_T = gob.struct_of("polyCiphertextWrapper", [
    ("CoeffBytes", gob.slice_of(gob.BYTES_T)),
    ("Degree", gob.INT_T),
    ("ScaleFactor", gob.INT_T),
    ("L2", gob.BOOL_T),
])

POLY_ENCODING_PARAMS_T = gob.struct_of("PolyEncodingParams", [
    ("PolyBase", gob.INT_T),
    ("FPScaleBase", gob.INT_T),
    ("FPPrecision", gob.FLOAT_T),
])

PUBLIC_KEY_WRAPPER_T = gob.struct_of("publicKeyWrapper", [
    ("G1", gob.BYTES_T),
    ("P", gob.BYTES_T),
    ("Q", gob.BYTES_T),
    ("N", BIG_INT_T),
    ("MsgSpace", BIG_INT_T),
    ("PairingParams", gob.STRING_T),
    ("Deterministic", gob.BOOL_T),
    ("PolyEncodingParams", POLY_ENCODING_PARAMS_T),
])


# ---------------------------------------------------------------------------
# Element <-> host value helpers
# ---------------------------------------------------------------------------


def _ct_host_values(pk: BGNPublicKey, ct: Ciphertext) -> list:
    """Batch -> list of host values: points (or None) for L1, (re, im)
    F_p^2 pairs for L2."""
    if ct.level2:
        flat = Ciphertext(ct.data.reshape(ct.data.shape[:2] + (-1,)), True)
        return convert.fp2_to_host(pk.dev.ctx, flat.data)
    B = int(np.prod(ct.batch_shape, dtype=int)) if ct.batch_shape else 1
    flat = ct.reshape((B,))
    return convert.affine_to_host(pk.dev.ctx, flat.data)


def _element_bytes(pk: BGNPublicKey, ct: Ciphertext) -> List[bytes]:
    """Per-element pbc Element.Bytes of a ciphertext batch."""
    vals = _ct_host_values(pk, ct)
    if ct.level2:
        return [pbc.gt_to_bytes(z, pk.p) for z in vals]
    return [pbc.point_to_bytes(P, pk.p) for P in vals]


def _ct_from_element_bytes(pk: BGNPublicKey, blobs: List[bytes],
                           level2: bool) -> Ciphertext:
    from .. import serialize as ser
    ctx = pk.dev.ctx
    if level2:
        zs = [pbc.gt_from_bytes(b, pk.p) for b in blobs]
        # reject corrupt imports at the boundary (VERDICT r3 item 6);
        # the reference's SetBytes (bgn.go:517-524) cannot
        ser.validate_gt_values(pk, [z[0] for z in zs], [z[1] for z in zs])
        return Ciphertext(convert.fp2_from_host(ctx, zs), True)
    pts = [pbc.point_from_bytes(b, pk.p) for b in blobs]
    ser.validate_g1_values(pk,
                           [0 if P is None else P[0] for P in pts],
                           [0 if P is None else P[1] for P in pts],
                           [P is None for P in pts])
    return Ciphertext(convert.affine_from_host(ctx, pts), False)


# ---------------------------------------------------------------------------
# Ciphertexts (reference Ciphertext.Bytes / NewCiphertextFromBytes)
# ---------------------------------------------------------------------------


def ciphertext_to_gob(pk: BGNPublicKey, ct: Ciphertext) -> List[bytes]:
    """Each batch element -> one reference-layout gob blob, byte-compatible
    with Ciphertext.Bytes (ciphertext.go:76-90): the reference type holds
    a single element, so a batch exports to a list of blobs."""
    return [gob.dumps(CIPHERTEXT_WRAPPER_T, {"CBytes": eb, "L2": ct.level2})
            for eb in _element_bytes(pk, ct)]


def ciphertext_from_gob(pk: BGNPublicKey, blobs) -> Ciphertext:
    """Reference gob blob(s) -> a ciphertext batch (the analog of
    NewCiphertextFromBytes, bgn.go:501-526; needs pk to bind the field)."""
    if isinstance(blobs, (bytes, bytearray)):
        blobs = [blobs]
    if not blobs or any(len(b) == 0 for b in blobs):
        raise ValueError("no data provided")
    ws = [gob.loads(bytes(b)) for b in blobs]
    l2s = {bool(w["L2"]) for w in ws}
    if len(l2s) != 1:
        raise ValueError("mixed ciphertext levels in one batch")
    return _ct_from_element_bytes(pk, [w["CBytes"] for w in ws], l2s.pop())


def poly_ciphertext_to_gob(pk: BGNPublicKey, pct) -> bytes:
    """PolyCiphertext -> gob blob (PolyCiphertext.Bytes,
    ciphertext.go:94-116): coefficient elements in pbc layout."""
    return gob.dumps(POLY_CIPHERTEXT_WRAPPER_T, {
        "CoeffBytes": _element_bytes(pk, pct.ct),
        "Degree": pct.degree,
        "ScaleFactor": pct.scale_factor,
        "L2": pct.ct.level2,
    })


def poly_ciphertext_from_gob(pk: BGNPublicKey, data: bytes):
    """gob blob -> PolyCiphertext (NewPolyCiphertextFromBytes,
    bgn.go:530-560)."""
    from ..polyct import PolyCiphertext
    if len(data) == 0:
        raise ValueError("no data provided")
    w = gob.loads(bytes(data))
    ct = _ct_from_element_bytes(pk, w["CoeffBytes"], bool(w["L2"]))
    return PolyCiphertext(ct, int(w["Degree"]), int(w["ScaleFactor"]))


# ---------------------------------------------------------------------------
# Public keys (reference MarshalBinary / UnmarshalBinary)
# ---------------------------------------------------------------------------


def public_key_to_gob(pk: BGNPublicKey) -> bytes:
    """BGNPublicKey -> reference-layout gob blob (PublicKey.MarshalBinary,
    bgn.go:597-622).  G1 is the reference's group-context element (a fresh
    zero element, i.e. the all-zero point)."""
    elen = pbc.element_length_in_bytes(pk.p)
    return gob.dumps(PUBLIC_KEY_WRAPPER_T, {
        "G1": b"\x00" * (2 * elen),
        "P": pbc.point_to_bytes(pk.P_host, pk.p),
        "Q": pbc.point_to_bytes(pk.Q_host, pk.p),
        "N": gob.big_int_gob_encode(pk.n),
        "MsgSpace": gob.big_int_gob_encode(pk.msg_space),
        "PairingParams": pbc.a1_params_to_str(pk.p, pk.n, pk.l),
        "Deterministic": pk.deterministic,
        "PolyEncodingParams": {
            "PolyBase": pk.poly_params.poly_base,
            "FPScaleBase": pk.poly_params.fp_scale_base,
            "FPPrecision": pk.poly_params.fp_precision,
        },
    })


def public_key_from_gob(data: bytes) -> BGNPublicKey:
    """Reference gob blob -> BGNPublicKey (PublicKey.UnmarshalBinary,
    bgn.go:626-666): params string gives (p, n, l) -- including the l the
    reference itself recovers via parseLFromPBCParams -- and P/Q arrive as
    pbc element bytes."""
    w = gob.loads(bytes(data))
    p, n, l = pbc.parse_a1_params_str(w["PairingParams"])
    if gob.big_int_gob_decode(w["N"]) != n:
        raise ValueError("public key N disagrees with pairing params n")
    P_host = pbc.point_from_bytes(w["P"], p)
    Q_host = pbc.point_from_bytes(w["Q"], p)
    if P_host is None or Q_host is None:
        raise ValueError("public key generators cannot be the identity")
    pep = w["PolyEncodingParams"]
    poly_params = PolyEncodingParams(int(pep["PolyBase"]),
                                     int(pep["FPScaleBase"]),
                                     float(pep["FPPrecision"]))
    return public_key_from_parts(
        key_bits=n.bit_length(), n=n, l=l, p=p,
        msg_space=gob.big_int_gob_decode(w["MsgSpace"]),
        deterministic=bool(w["Deterministic"]), poly_params=poly_params,
        P_host=P_host, Q_host=Q_host)


# ---------------------------------------------------------------------------
# Conformance vectors (tools/dump_reference.go output)
# ---------------------------------------------------------------------------


def import_reference_key(vec: dict) -> Tuple[BGNPublicKey, BGNSecretKey]:
    """Build a full (pk, sk) pair from a dump_reference.go vector file.

    The secret side needs (q1, R): q1 is sk.Key, q2 = n/q1, and the
    params string supplies (p, n, l)."""
    pk = public_key_from_gob(base64.b64decode(vec["public_key_gob"]))
    q1 = int(vec["q1"], 16)
    if pk.n % q1 != 0:
        raise ValueError("q1 does not divide n")
    params = hm.A1Params(q1=q1, q2=pk.n // q1, n=pk.n, l=pk.l, p=pk.p)
    sk = BGNSecretKey(params, int(vec["r"], 16),
                      pk.poly_params.poly_base)
    return pk, sk


def load_reference_vectors(path) -> Optional[dict]:
    """Load a dump_reference.go JSON vector file; None if absent."""
    import os
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
