"""Flagship model workloads: encrypted dot product + private aggregation."""

import random

import pytest

from bgn_tpu import scheme
from bgn_tpu.models import aggregation, encrypted_dot

KEY_BITS = 160
MSG_SPACE = 1021


@pytest.fixture(scope="module")
def keypair(shared_keypair):
    return shared_keypair


def test_encrypted_dot(keypair):
    pk, sk, tables = keypair
    x = [1, 2, 3, 4]
    y = [5, 6, 7, 8]
    ct_x = pk.encrypt(x)
    ct_y = pk.encrypt(y)
    out = encrypted_dot.encrypted_dot(pk, ct_x, ct_y)
    assert out.level2
    vals, ok = sk.decrypt_with_status(out, pk, tables)
    assert ok[0] and int(vals[0]) == sum(a * b for a, b in zip(x, y))


def test_encrypted_dot_batched(keypair):
    pk, sk, tables = keypair
    # two vectors side by side: [D=3, B=2]
    xs = [[1, 2], [3, 4], [5, 6]]
    ys = [[7, 8], [9, 1], [2, 3]]
    flat = lambda m: [v for row in m for v in row]
    ct_x = pk.encrypt(flat(xs)).reshape((3, 2))
    ct_y = pk.encrypt(flat(ys)).reshape((3, 2))
    out = encrypted_dot.encrypted_dot(pk, ct_x, ct_y)
    vals, ok = sk.decrypt_with_status(out, pk, tables)
    want = [sum(xs[d][b] * ys[d][b] for d in range(3)) for b in range(2)]
    assert list(vals) == want and all(ok)


def test_aggregate_l1(keypair):
    pk, sk, tables = keypair
    xs = [10, 20, 30, 5]
    ct = pk.encrypt(xs)
    total = aggregation.aggregate(pk, ct)
    vals, ok = sk.decrypt_with_status(total, pk, tables)
    assert ok[0] and int(vals[0]) == sum(xs)


def test_weighted_aggregate(keypair):
    pk, sk, tables = keypair
    xs = [1, 2, 3]
    ws = [10, 1, 5]
    tally = aggregation.weighted_aggregate(pk, pk.encrypt(xs),
                                           pk.encrypt(ws))
    vals, ok = sk.decrypt_with_status(tally, pk, tables)
    assert ok[0] and int(vals[0]) == sum(x * w for x, w in zip(xs, ws))
