"""Conformance verification against reference-produced vectors.

`verify_reference_vectors` consumes the JSON tools/dump_reference.go dumps
from a live sachaservan/bgn checkout and checks, byte-for-byte:

  1. the public key round-trips through our gob/PBC codecs and its
     (p, n, l, P, Q) satisfy the A1 invariants;
  2. e(P, P) — PBC's Tate pairing output — equals our pairing (hostmath
     golden model, the oracle every device kernel is tested against);
  3. every (m, r) encryption vector reproduces the reference's exact
     ciphertext bytes (EncryptWithRandomness, bgn.go:340-353);
  4. every deterministic homomorphic-op vector (Add/Mult/MultConst/Neg)
     reproduces the reference's exact result bytes;
  5. every ciphertext decrypts to the reference's decrypted value.

The checks run on the golden host model by default (exact ints, fast, no
kernel compiles); pass device=True to additionally run the encryption
vectors through the batched device kernels (slow on CPU at 512-bit:
compiles the full fixed-base kernel graph).
"""

from __future__ import annotations

from typing import Optional

from .. import hostmath as hm
from . import pbc
from .reference import import_reference_key


class ConformanceError(AssertionError):
    pass


def _check(cond, msg):
    if not cond:
        raise ConformanceError(msg)


def verify_reference_vectors(vec: dict, device: bool = False) -> dict:
    """Run all conformance checks; returns {check_name: count} on success,
    raises ConformanceError on the first mismatch."""
    counts = {}
    pk, sk = import_reference_key(vec)
    params = sk.a1_params
    p = params.p

    # 1. key material invariants + byte round-trip
    _check(p == pk.l * pk.n - 1, "p != l*n - 1")
    _check(hm.is_probable_prime(params.q1), "q1 not prime")
    _check(hm.is_probable_prime(params.q2), "q2 not prime")
    _check(hm.on_curve(pk.P_host, p), "P not on curve")
    _check(hm.on_curve(pk.Q_host, p), "Q not on curve")
    _check(hm.ec_mul(pk.n, pk.P_host, p) is None, "P not of order | n")
    _check(hm.ec_mul(params.q1, pk.Q_host, p) is None,
           "Q not of order | q1")
    _check(pbc.point_to_bytes(pk.P_host, p) ==
           bytes.fromhex(vec["p_bytes_hex"]), "P bytes mismatch")
    _check(pbc.point_to_bytes(pk.Q_host, p) ==
           bytes.fromhex(vec["q_bytes_hex"]), "Q bytes mismatch")
    # Q = (P^R)^q2 (bgn.go:116-119)
    _check(hm.ec_mul(params.q2 * sk.r % pk.n, pk.P_host, p) == pk.Q_host,
           "Q != (P^R)^q2")
    counts["key"] = 1

    # 2. the pairing itself vs PBC
    gt_gen = hm.tate_pairing(pk.P_host, pk.P_host, params)
    _check(pbc.gt_to_bytes(gt_gen, p) == bytes.fromhex(
        vec["gt_gen_bytes_hex"]),
        "e(P, P) differs from PBC's Tate pairing")
    counts["pairing"] = 1

    # 3. encryption vectors
    gk = hm.GoldenKey(params=params, P=pk.P_host, Q=pk.Q_host, R=sk.r,
                      msg_space=pk.msg_space)
    cts = []
    for i, cv in enumerate(vec["ciphertexts"]):
        m, r = int(cv["m"]), int(cv["r"], 16)
        C = hm.golden_encrypt(gk, m, r)
        cts.append(C)
        _check(not cv["l2"], f"vector {i}: expected level-1 ciphertext")
        _check(pbc.point_to_bytes(C, p) == bytes.fromhex(cv["bytes_hex"]),
               f"vector {i}: ciphertext bytes mismatch (m={m})")
        got = hm.golden_decrypt_l1(gk, C)
        _check(got == int(cv["decrypted"]),
               f"vector {i}: decrypt {got} != {cv['decrypted']}")
    counts["encrypt"] = len(vec["ciphertexts"])

    # 4. homomorphic op vectors (deterministic mode)
    for i, ov in enumerate(vec.get("ops", [])):
        got = _golden_op(gk, cts, ov)
        want = bytes.fromhex(ov["bytes_hex"])
        if ov["l2"]:
            _check(pbc.gt_to_bytes(got, p) == want,
                   f"op {i} ({ov['op']}): GT bytes mismatch")
        else:
            _check(pbc.point_to_bytes(got, p) == want,
                   f"op {i} ({ov['op']}): point bytes mismatch")
    counts["ops"] = len(vec.get("ops", []))

    if device:
        counts["device_encrypt"] = _verify_device(vec, pk)
    return counts


def _golden_op(gk: hm.GoldenKey, cts, ov):
    """Deterministic-mode reference op semantics on host values."""
    p = gk.params.p
    op, a, b = ov["op"], ov["a"], ov["b"]
    if op == "add":
        return hm.ec_add(cts[a], cts[b], p)
    if op == "mult":
        return hm.tate_pairing(cts[a], cts[b], gk.params)
    if op == "mult_const":
        return hm.ec_mul(b, cts[a], p)
    if op == "neg":
        return hm.ec_neg(cts[a], p)
    if op == "make_l2_add":
        # Add(Mult(ct_a, ct_b), ct_3): the L1 side promotes via
        # makeL2 = e(C, P) (bgn.go:316-321), then GT multiply
        prod = hm.tate_pairing(cts[a], cts[b], gk.params)
        lifted = hm.tate_pairing(cts[3], gk.P, gk.params)
        return hm.fp2_mul(prod, lifted, p)
    raise ConformanceError(f"unknown op {op!r}")


def _verify_device(vec: dict, pk) -> int:
    """Re-run the encryption vectors through the batched device kernel and
    compare pbc bytes (slow at 512-bit on CPU: compiles the kernel)."""
    from .reference import _element_bytes
    ms = [int(cv["m"]) for cv in vec["ciphertexts"]]
    rs = [int(cv["r"], 16) for cv in vec["ciphertexts"]]
    ct = pk.encrypt_with_randomness(ms, rs)
    blobs = _element_bytes(pk, ct)
    for i, cv in enumerate(vec["ciphertexts"]):
        _check(blobs[i] == bytes.fromhex(cv["bytes_hex"]),
               f"vector {i}: device ciphertext bytes mismatch")
    return len(ms)


def synthesize_vectors(key_bits: int = 64, msg_space: int = 101,
                       seed: int = 20260818,
                       rng=None) -> dict:
    """Produce a vectors dict in the exact dump_reference.go layout from
    OUR golden model -- the format-level stand-in until real Go-produced
    fixtures are dropped in (see tools/dump_reference.go)."""
    import base64
    import random
    from ..scheme import PolyEncodingParams, public_key_from_parts
    from .reference import public_key_to_gob

    rng = rng or random.Random(seed)
    gk = hm.golden_keygen(key_bits, msg_space, rng)
    params = gk.params
    pk = public_key_from_parts(
        key_bits=params.n.bit_length(), n=params.n, l=params.l, p=params.p,
        msg_space=msg_space, deterministic=True,
        poly_params=PolyEncodingParams(3, 3, 0.0001),
        P_host=gk.P, Q_host=gk.Q)
    p = params.p

    ms = [0, 1, 2, msg_space // 2, msg_space - 1, 7, 23]
    cts, ct_vecs = [], []
    for i, m in enumerate(ms):
        r = pow(1000003, i + 1, params.n)
        C = hm.golden_encrypt(gk, m, r)
        cts.append(C)
        ct_vecs.append({
            "m": str(m), "r": format(r, "x"), "l2": False,
            "bytes_hex": pbc.point_to_bytes(C, p).hex(),
            "gob_base64": "",
            "decrypted": str(hm.golden_decrypt_l1(gk, C)),
        })

    def op(name, a, b, val, l2):
        enc = pbc.gt_to_bytes if l2 else pbc.point_to_bytes
        return {"op": name, "a": a, "b": b, "l2": l2,
                "bytes_hex": enc(val, p).hex()}

    ops = [
        op("add", 1, 2, hm.ec_add(cts[1], cts[2], p), False),
        op("add", 3, 4, hm.ec_add(cts[3], cts[4], p), False),
        op("mult", 1, 2, hm.tate_pairing(cts[1], cts[2], params), True),
        op("mult", 5, 6, hm.tate_pairing(cts[5], cts[6], params), True),
        op("mult_const", 5, 9, hm.ec_mul(9, cts[5], p), False),
        op("neg", 6, 0, hm.ec_neg(cts[6], p), False),
        op("make_l2_add", 1, 2,
           hm.fp2_mul(hm.tate_pairing(cts[1], cts[2], params),
                      hm.tate_pairing(cts[3], gk.P, params), p), True),
    ]
    return {
        "key_bits": key_bits, "msg_space": msg_space,
        "poly_base": 3, "fp_scale_base": 3, "fp_precision": 0.0001,
        "pairing_params": pbc.a1_params_to_str(p, params.n, params.l),
        "n": format(params.n, "x"),
        "q1": format(params.q1, "x"), "q2": format(params.q2, "x"),
        "r": format(gk.R, "x"),
        "p_bytes_hex": pbc.point_to_bytes(gk.P, p).hex(),
        "q_bytes_hex": pbc.point_to_bytes(gk.Q, p).hex(),
        "gt_gen_bytes_hex": pbc.gt_to_bytes(gk.gt_base(), p).hex(),
        "public_key_gob": base64.b64encode(public_key_to_gob(pk)).decode(),
        "ciphertexts": ct_vecs,
        "ops": ops,
    }
