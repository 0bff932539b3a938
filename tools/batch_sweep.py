"""Throughput vs batch size for the hot ops (EMult pairing, Encrypt,
Decrypt) on the live chip.  Picks the knee of the curve so bench.py's
BATCH constant is evidence-based, not folklore.

Run on an OTHERWISE-IDLE host: this machine has 2 CPU cores and the
dispatch thread starves under any concurrent load, silently deflating
every measured rate (round-4 note in TODO.md).

Usage: python tools/batch_sweep.py [--bits 512] [--batches 1024,2048,...]
"""
import argparse
import json
import os
import random
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("BGN_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=512)
    ap.add_argument("--batches", default="1024,2048,4096,8192")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from bench import timed  # autoranged >=3s windows (ADVICE r4: the
    #   old single-window rate() here was the exact sub-second methodology
    #   PERF.md documents as +-4x jittery; the knee choice was noise-prone)
    from bgn_tpu.config import BGNParams
    from bgn_tpu.scheme import _decrypt_l1_kernel, _mult_kernel

    rng = random.Random(1234)
    pk, sk = BGNParams(key_bits=args.bits, msg_space=1021).keygen(
        rng=random.Random(1234))
    tables = pk.setup_decryption(sk, rng=rng)
    out = {}
    for B in [int(b) for b in args.batches.split(",")]:
        ms = [rng.randrange(300) for _ in range(B)]
        a = pk.encrypt(ms, rng=rng)
        b = pk.encrypt(ms, rng=rng)
        np.asarray(a.data.x[0]).sum()

        def rate(fn, materialize, iters=args.iters):
            return timed(fn, materialize, iters, B * iters)

        r = {}
        r["encrypt"] = rate(lambda: pk.encrypt(ms, rng=rng),
                            lambda c: np.asarray(c.data.x[0]).sum())
        r["mult"] = rate(lambda: _mult_kernel(pk.dev, a.data, b.data),
                         lambda o: np.asarray(o[:, :, 0]).sum())
        r["decrypt"] = rate(
            lambda: _decrypt_l1_kernel(pk.dev, tables, sk.q1_bits, a.data,
                                       sk.q1_naf)[1],
            lambda o: np.asarray(o).sum())
        out[B] = {k: round(v, 1) for k, v in r.items()}
        print(f"batch {B}: " + json.dumps(out[B]), file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
