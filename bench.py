"""Benchmark harness: batched pairing EMult throughput (the headline metric).

Mirrors the reference's benchmark config (bgn_test.go:8-13, 127-140:
KEYBITS=512, MSGSPACE=1021, deterministic) and reports pairings/s on the
default JAX device.  The reference publishes no numbers (BASELINE.md); the
comparison point is the BASELINE.json north star of 1e5 pairing EMults/s on
a v5e-8, i.e. 12.5k/s per chip -- vs_baseline is value / (per-chip share of
the north star * chips visible).

Prints exactly ONE JSON line to stdout:
  {"metric": "emult_pairings_per_sec", "value": N, "unit": "ops/s",
   "vs_baseline": R}
Supplementary metrics go to stderr.
"""

import json
import os
import random
import sys
import time

import jax
import numpy as np

# Persistent compilation cache: the 512-bit fused-pairing kernels take
# minutes to compile; cache them across bench runs (BGN_TPU_NO_CACHE=1 to
# disable if the cache misbehaves on a backend).
if not os.environ.get("BGN_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

KEY_BITS = 512
MSG_SPACE = 1021
BATCH = 2048
ITERS = 8
NORTH_STAR_PER_CHIP = 100_000 / 8  # BASELINE.json: 1e5 ops/s on v5e-8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bgn_tpu import scheme
    from bgn_tpu.scheme import _mult_kernel

    t0 = time.time()
    rng = random.Random(1234)
    pk, sk = scheme.keygen(KEY_BITS, MSG_SPACE, rng=rng)
    log(f"keygen({KEY_BITS}): {time.time() - t0:.1f}s "
        f"(l={pk.l}, L={pk.dev.ctx.L} limbs)")

    ms = [rng.randrange(MSG_SPACE) for _ in range(BATCH)]
    t0 = time.time()
    a = pk.encrypt(ms, rng=rng)
    b = pk.encrypt(ms, rng=rng)
    jax.block_until_ready((a.data, b.data))
    log(f"encrypt 2x{BATCH}: {time.time() - t0:.1f}s (incl. compile)")

    # warm up / compile the pairing kernel.  NOTE: materialize to host --
    # on the tunneled axon platform block_until_ready can return before the
    # remote computation finishes, so fetch bytes to be safe.
    def materialize(x):
        return np.asarray(x[:, :, 0]).sum()

    t0 = time.time()
    out = _mult_kernel(pk.dev, a.data, b.data)
    materialize(out)
    log(f"pairing compile+first batch: {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(ITERS):
        out = _mult_kernel(pk.dev, a.data, b.data)
    materialize(out)
    dt = time.time() - t0
    rate = BATCH * ITERS / dt
    log(f"EMult: {BATCH * ITERS} pairings in {dt:.2f}s -> {rate:.1f}/s "
        f"on {jax.devices()[0].platform}:{len(jax.devices())} device(s)")

    # Secondary metrics (stderr): batched encrypt + BSGS decrypt ops/s
    # (the second BASELINE.json config).
    from bgn_tpu.scheme import _decrypt_l1_kernel
    t0 = time.time()
    tables = pk.setup_decryption(sk, rng=rng)
    log(f"setup_decryption: {time.time() - t0:.1f}s")
    t0 = time.time()
    found, m = _decrypt_l1_kernel(pk.dev, tables, sk.q1_bits, a.data)
    np.asarray(m).sum()
    log(f"decrypt compile+first batch: {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(ITERS):
        found, m = _decrypt_l1_kernel(pk.dev, tables, sk.q1_bits, a.data)
    np.asarray(m).sum()
    dt_d = time.time() - t0
    log(f"BSGS decrypt: {BATCH * ITERS} in {dt_d:.2f}s -> "
        f"{BATCH * ITERS / dt_d:.1f}/s")
    assert [int(v) for v in np.asarray(m)[:8]] == ms[:8], "decrypt mismatch"

    t0 = time.time()
    for _ in range(ITERS):
        c = pk.encrypt(ms, rng=rng)
    jax.block_until_ready(c.data.x)
    dt_e = time.time() - t0
    log(f"encrypt: {BATCH * ITERS} in {dt_e:.2f}s -> "
        f"{BATCH * ITERS / dt_e:.1f}/s")

    n_chips = len(jax.devices())
    baseline = NORTH_STAR_PER_CHIP * n_chips
    print(json.dumps({
        "metric": "emult_pairings_per_sec",
        "value": round(rate, 2),
        "unit": "ops/s",
        "vs_baseline": round(rate / baseline, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
