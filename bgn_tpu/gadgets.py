"""Sigma-protocol ZK gadgets (reference gadgets.go).

Batched versions of the reference's two gadgets:
  - DecryptionProof {Value, Randomness}: verified by re-encryption equality
    (gadgets.go:17-28, 57-61).
  - ProofOfPlaintextKnowledge {Ct, Nonce, DL}: Schnorr-style with
    Fiat-Shamir challenge c = SHA-256(ct_bytes || nonce_bytes)
    (gadgets.go:80-96); the prover needs sk (it uses sk.R, sk.Key and
    N/q1, gadgets.go:45-48 -- a reference quirk preserved here).
    Verify: P^DL == ct^c * nonce (gadgets.go:65-77).

Hashing runs on host over canonical element bytes (the analog of pbc
Element.Bytes); group arithmetic runs batched on device."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Sequence

import jax
import numpy as np

from . import serialize
from .ops import curve as cv
from .scheme import BGNPublicKey, BGNSecretKey, Ciphertext, _rand_below, \
    _signed_bits, _signed_digits
from .utils import convert


@dataclass
class DecryptionProof:
    """Reference DecryptionProof (gadgets.go:18-21); batched."""

    values: List[int]
    randomness: List[int]


@dataclass
class ProofOfPlaintextKnowledge:
    """Reference ProofOfPlaintextKnowledge (gadgets.go:10-14); batched."""

    ct: Ciphertext
    nonce: Ciphertext
    dl: List[int]


def new_decryption_proof(vs: Sequence[int],
                         rs: Sequence[int]) -> DecryptionProof:
    """NewDecryptionProof (gadgets.go:24-28)."""
    return DecryptionProof(list(map(int, vs)), list(map(int, rs)))


def check_decryption_proof(pk: BGNPublicKey, ct: Ciphertext,
                           proof: DecryptionProof) -> np.ndarray:
    """CheckDecryptionProof (gadgets.go:57-61): re-encrypt and compare."""
    enc = pk.encrypt_with_randomness(proof.values, proof.randomness)
    eqv = jax.jit(cv.eq_affine)(ct.data, enc.data)
    return np.asarray(eqv).astype(bool)


def _fiat_shamir(pk: BGNPublicKey, ct: Ciphertext,
                 nonce: Ciphertext) -> List[int]:
    """c = SHA-256(ct_bytes || nonce_bytes) per batch element
    (hash(), gadgets.go:80-96)."""
    ct_pts = convert.affine_to_host(pk.dev.ctx, ct.data)
    nonce_pts = convert.affine_to_host(pk.dev.ctx, nonce.data)
    out = []
    for cp, np_ in zip(ct_pts, nonce_pts):
        h = hashlib.sha256()
        h.update(serialize.point_bytes(pk, cp))
        h.update(serialize.point_bytes(pk, np_))
        out.append(int.from_bytes(h.digest(), "big"))
    return out


def new_proof_of_plaintext_knowledge(
        pk: BGNPublicKey, sk: BGNSecretKey, vs: Sequence[int],
        zs: Sequence[int], rng=None) -> ProofOfPlaintextKnowledge:
    """NewProofOfPlaintextKnowledge (gadgets.go:32-54).

    DL = nonce1 + c*v + R*z*c*(N/q1) mod N."""
    vs = list(map(int, vs))
    zs = list(map(int, zs))
    nonce1s = [_rand_below(pk.n, rng) for _ in vs]
    ct = pk.encrypt_with_randomness(vs, zs)
    nonce = pk.encrypt_with_randomness(nonce1s, [0] * len(vs))
    proof = ProofOfPlaintextKnowledge(ct, nonce, [])
    cs = _fiat_shamir(pk, ct, nonce)
    n_over_q1 = pk.n // sk.key
    dls = []
    for nonce1, c, v, z in zip(nonce1s, cs, vs, zs):
        dl = nonce1 + c * v + sk.r * z * c * n_over_q1
        dls.append(dl % pk.n)
    proof.dl = dls
    return proof


def check_proof_of_plaintext_knowledge(
        pk: BGNPublicKey, ct: Ciphertext,
        proof: ProofOfPlaintextKnowledge) -> np.ndarray:
    """CheckProofOfPlaintextKnoewledge [sic] (gadgets.go:65-77):
    P^DL == ct^c * nonce."""
    cs = _fiat_shamir(pk, proof.ct, proof.nonce)
    res = _pok_verify_kernel(pk.dev, ct.data, proof.nonce.data,
                             *_signed_bits(cs, pk.n),
                             *_signed_digits(proof.dl, pk.n))
    return np.asarray(res).astype(bool)


# Keep the verifier's group algebra in one jitted kernel.
@jax.jit
def _pok_verify_kernel(dev, ct_pt: cv.AffinePoint, nonce_pt: cv.AffinePoint,
                       c_bits, c_neg, dl_digits, dl_neg):
    ctx = dev.ctx
    # P^DL via the fixed-base window table; ct^c needs the generic ladder
    lhs = cv.normalize(ctx, cv.fixed_base_mul(ctx, dev.p_win, dl_digits),
                       rns=dev.rns)
    rhs = cv.scalar_mul(ctx, ct_pt, c_bits)                      # ct^c
    rhs_aff = cv.normalize(ctx, rhs, rns=dev.rns)
    rhs2 = cv.normalize(ctx, cv.add_affine(ctx, rhs_aff, nonce_pt),
                        rns=dev.rns)
    return cv.eq_affine(lhs, rhs2)
