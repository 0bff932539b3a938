"""Randomness helpers.

Host randomness uses the `secrets` CSPRNG (analog of crypto/rand,
reference bgn.go:567-574); device-side batched randomness uses JAX threefry
bits reduced mod n (2*key_bits of entropy, statistical distance < 2^-key_bits
from uniform), so jitted pipelines can stay on-device."""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp


def random_ints_below(n: int, count: int, rng=None):
    """count uniform ints in [0, n) (host, exact rejection sampling)."""
    if rng is None:
        return [secrets.randbelow(n) for _ in range(count)]
    return [rng.randrange(n) for _ in range(count)]


def make_device_sampler_ctx(n: int, extra_limbs: int = 4):
    """MontCtx over modulus n sized for low-bias device sampling.

    With L' = limbs(n) + extra_limbs, a uniform value x < 2^(16 L') reduced
    mod n has statistical distance <= n / 2^(16 L') <= 2^-64 from uniform
    (the device analog of crypto/rand rejection sampling, bgn.go:567)."""
    from ..fieldcore import limbs as lb
    from ..fieldcore import montgomery as mg
    L = lb.num_limbs_for_bits(n.bit_length()) + extra_limbs
    return mg.make_mont_ctx(n, L=L)


def device_random_below(sampler_ctx, key, batch_shape):
    """Threefry-driven uniform residues mod n, fully on device.

    Returns canonical limbs [L', *batch] < n.  Reduction is two Montgomery
    multiplications: to_mont accepts any x < R' (the CIOS bound gives
    x*R'^2/R' mod n < 2n before the final conditional subtract), and
    from_mont then yields x mod n exactly."""
    from ..fieldcore import montgomery as mg
    L = sampler_ctx.L
    raw = jax.random.bits(key, (L,) + tuple(batch_shape), dtype=jnp.uint32)
    x = raw & jnp.uint32(0xFFFF)
    return mg.from_mont(sampler_ctx, mg.to_mont(sampler_ctx, x))
