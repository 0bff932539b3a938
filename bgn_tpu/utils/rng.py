"""Randomness helpers.

Host randomness uses the `secrets` CSPRNG (analog of crypto/rand,
reference bgn.go:567-574); device-side batched randomness uses JAX threefry
bits reduced mod n (2*key_bits of entropy, statistical distance < 2^-key_bits
from uniform), so jitted pipelines can stay on-device."""

from __future__ import annotations

import secrets


def random_ints_below(n: int, count: int, rng=None):
    """count uniform ints in [0, n) (host, exact rejection sampling)."""
    if rng is None:
        return [secrets.randbelow(n) for _ in range(count)]
    return [rng.randrange(n) for _ in range(count)]
