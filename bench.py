"""Benchmark harness.

Default (driver contract): the headline batched pairing-EMult metric as ONE
JSON line on stdout plus encrypt/BSGS-decrypt secondaries on stderr.
Mirrors the reference's benchmark config (bgn_test.go:8-13, 127-140:
KEYBITS=512, MSGSPACE=1021, deterministic).  The reference publishes no
numbers (BASELINE.md); the comparison point is the BASELINE.json north star
of 1e5 pairing EMults/s on a v5e-8, i.e. 12.5k/s per chip -- vs_baseline is
value / (per-chip share of the north star * chips visible).

--full: every BASELINE.json config with the reference's bench names
(bgn_test.go:87-140 KeyGen/Add/MultConstant/Mult, poly_test.go:10-66
EncryptPoly/DecryptPoly/AddPoly/MultConstantPoly/MultPoly,
gadgets_test.go:110-140 ProofOfPlaintextKnowledgeGen/Verify), the
fixed-point encrypted dot product (config 4), a 1024-bit section
(config 5's key size; --skip-1024 to omit), and a DP multi-chip scaling
section when >1 device is visible.  Results land in bench_full.json.

Prints exactly ONE JSON line to stdout:
  {"metric": "emult_pairings_per_sec", "value": N, "unit": "ops/s",
   "vs_baseline": R}
Everything else goes to stderr / bench_full.json.
"""

import argparse
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
BATCH = 8192        # knee of the throughput curve for encrypt/add/mult
DECRYPT_BATCH = 2048  # BSGS decrypt peaks at 2048 (tools/batch_sweep.py:
ITERS = 8             # 52.7k/s at 2048 vs 45.4k at 8192)
NORTH_STAR_PER_CHIP = 100_000 / 8  # BASELINE.json: 1e5 ops/s on v5e-8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Transient backend failures (tunneled remote_compile RPC resets, transient
# INTERNAL/UNAVAILABLE states) must not void a whole bench run: every timed
# call retries with backoff, and every section is independent (one failure
# records an error entry and the run continues) -- VERDICT r3 item 1.
_TRANSIENT_MARKERS = ("remote_compile", "INTERNAL", "UNAVAILABLE",
                      "DEADLINE_EXCEEDED", "read body", "Socket closed",
                      "connection reset", "RESOURCE_EXHAUSTED")


def _is_transient(e) -> bool:
    s = f"{type(e).__name__}: {e}"
    return isinstance(e, RuntimeError) and any(m in s
                                               for m in _TRANSIENT_MARKERS)


def with_retry(fn, attempts=5, base_delay=2.0):
    """Run fn(), retrying transient backend errors with exponential
    backoff (2s, 4s, ... capped at 60s)."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1 or not _is_transient(e):
                raise
            d = min(base_delay * (2 ** i), 60.0)
            log(f"  !! transient backend error ({type(e).__name__}): "
                f"{str(e)[:160]} -- retry {i + 1}/{attempts - 1} in {d:.0f}s")
            time.sleep(d)


def section(name, fn):
    """Run one bench section so a failure (even a persistent one) records
    an error entry instead of aborting the run; returns fn() or None."""
    try:
        return with_retry(fn)
    except Exception as e:
        RESULTS[f"{name}__error"] = {
            "error": f"{type(e).__name__}: {str(e)[:400]}"}
        log(f"  !! section {name} FAILED: {type(e).__name__}: "
            f"{str(e)[:200]}")
        return None


RESULTS = {}


def record(name, ops_per_sec, batch, config, note=""):
    RESULTS[name] = {"ops_per_sec": round(ops_per_sec, 2), "batch": batch,
                     "config": config, "note": note}
    log(f"  {name}: {ops_per_sec:.1f} ops/s (batch {batch})"
        + (f" -- {note}" if note else ""))


MIN_WINDOW_S = 3.0   # autorange floor: sub-second windows are dominated
MAX_CHUNKS = 64      # by one-off tunnel readback latency (33k vs 151k
                     # encrypt readings in back-to-back otherwise-idle
                     # runs); keep timing until the window is real


def timed(fn, materialize, iters, total_ops):
    """Compile+warm once, then rate the steady state (total_ops items per
    `iters` calls).  The timing loop autoranges: chunks of `iters` calls
    (one materialize sync per chunk) repeat until MIN_WINDOW_S of wall
    time is covered, so fast ops aren't measured through a single noisy
    tunnel round trip.  Each phase retries transient backend errors; a
    failure mid-timing restarts only the timing loop (warm caches make
    the retry cheap)."""
    with_retry(lambda: materialize(fn()))

    def _time_loop():
        t0 = time.time()
        done = 0
        for _ in range(MAX_CHUNKS):
            out = None
            for _ in range(iters):
                out = fn()
            materialize(out)
            done += total_ops
            el = time.time() - t0
            if el >= MIN_WINDOW_S:
                break
        return done / (time.time() - t0)

    return with_retry(_time_loop)


def mat_ct(ct):
    """Materialize a Ciphertext to host (tunnel-safe sync)."""
    if ct.level2:
        return np.asarray(ct.data[:, :, 0]).sum()
    return np.asarray(ct.data.x[0]).sum()


def bench_core(pk, sk, tables, rng, batch, iters, config, label="",
               decrypt_batch=None):
    """Config 1+3 core ops at one key size: Encrypt/Add/MultConstant/
    Mult/AddL2/Decrypt/DecryptL2 (reference names where they exist).
    Decrypt sections run at decrypt_batch (default: batch) -- the BSGS
    scan's throughput knee is lower than the ladder ops'."""
    from bgn_tpu.scheme import _decrypt_l1_kernel, _decrypt_l2_kernel, \
        _mult_kernel

    sfx = label and f"_{label}"
    dbatch = decrypt_batch or batch
    # ms*ks must stay inside MSG_SPACE for the L2 decrypt section
    ms = [rng.randrange(MSG_SPACE // 3) for _ in range(batch)]
    ks = [rng.randrange(1, 4) for _ in range(batch)]
    a = with_retry(lambda: pk.encrypt(ms, rng=rng))
    b = with_retry(lambda: pk.encrypt(ks, rng=rng))
    # np.asarray readback, NOT block_until_ready: the latter can hang
    # forever on the tunneled axon backend (observed r4, 0%-CPU stall)
    with_retry(lambda: (mat_ct(a), mat_ct(b)))

    section(f"Encrypt{sfx}", lambda: record(
        f"Encrypt{sfx}",
        timed(lambda: pk.encrypt(ms, rng=rng), mat_ct, iters,
              batch * iters), batch, config,
        "host CSPRNG + digit prep included (host-bound above ~100k/s; "
        "see EncryptDevice for the on-device-RNG path)"))

    dev_key = jax.random.key(42)
    section(f"EncryptDevice{sfx}", lambda: record(
        f"EncryptDevice{sfx}",
        timed(lambda: pk.encrypt_device(ms, dev_key), mat_ct, iters,
              batch * iters), batch, config,
        "on-device threefry randomness (utils/rng.py): the jitted-"
        "pipeline production path; only message-digit prep on host"))
    section(f"Add{sfx}", lambda: record(
        f"Add{sfx}",
        timed(lambda: pk.add(a, b), mat_ct, iters, batch * iters),
        batch, config))
    section(f"MultConstant{sfx}", lambda: record(
        f"MultConstant{sfx}",
        timed(lambda: pk.mult_const(a, ks), mat_ct, iters,
              batch * iters), batch, config))

    def _mult_section():
        t0 = time.time()
        prod_raw = _mult_kernel(pk.dev, a.data, b.data)
        np.asarray(prod_raw[:, :, 0]).sum()
        log(f"  pairing compile+first batch: {time.time() - t0:.1f}s")
        emult = timed(lambda: _mult_kernel(pk.dev, a.data, b.data),
                      lambda o: np.asarray(o[:, :, 0]).sum(), iters,
                      batch * iters)
        record(f"Mult{sfx}", emult, batch, 3 if not label else config)
        return emult

    emult = section(f"Mult{sfx}", _mult_section)

    def _l2_sections():
        ad = with_retry(lambda: pk.encrypt(ms[:dbatch], rng=rng)) \
            if dbatch != batch else a
        bd = with_retry(lambda: pk.encrypt(ks[:dbatch], rng=rng)) \
            if dbatch != batch else b
        prod = with_retry(lambda: pk.mult(a, b))
        prod_d = with_retry(lambda: pk.mult(ad, bd)) \
            if dbatch != batch else prod
        section(f"AddL2{sfx}", lambda: record(
            f"AddL2{sfx}",
            timed(lambda: pk.add(prod, prod), mat_ct, iters,
                  batch * iters), batch, 3 if not label else config))
        def _dec_l2():
            # raw-kernel timing, symmetric with the L1 Decrypt section
            # (r4's 29.9k vs 54.0k gap was partly methodology: L2 timed
            # the python decrypt() wrapper incl. status readbacks while
            # L1 timed the kernel -- VERDICT r4 weak #6)
            found, m = _decrypt_l2_kernel(pk.dev, tables, sk.q1_bits,
                                          prod_d.data, sk.q1_naf)
            np.asarray(m).sum()
            record(f"DecryptL2{sfx}",
                   timed(lambda: _decrypt_l2_kernel(
                             pk.dev, tables, sk.q1_bits, prod_d.data,
                             sk.q1_naf)[1],
                         lambda o: np.asarray(o).sum(),
                         max(1, iters // 2),
                         dbatch * max(1, iters // 2)),
                   dbatch, 3 if not label else config)
            got = [int(v) for v in np.asarray(m)[:8]]
            assert got == [m_ * k_ for m_, k_ in zip(ms[:8], ks[:8])], \
                "L2 decrypt mismatch"

        section(f"DecryptL2{sfx}", _dec_l2)

    section(f"L2{sfx}", _l2_sections)

    def _decrypt_section():
        ad = with_retry(lambda: pk.encrypt(ms[:dbatch], rng=rng)) \
            if dbatch != batch else a
        t0 = time.time()
        found, m = _decrypt_l1_kernel(pk.dev, tables, sk.q1_bits, ad.data,
                                      sk.q1_naf)
        np.asarray(m).sum()
        log(f"  decrypt compile+first batch: {time.time() - t0:.1f}s")
        record(f"Decrypt{sfx}",
               timed(lambda: _decrypt_l1_kernel(pk.dev, tables, sk.q1_bits,
                                                ad.data, sk.q1_naf)[1],
                     lambda o: np.asarray(o).sum(), iters, dbatch * iters),
               dbatch, config)
        assert [int(v) for v in np.asarray(m)[:8]] == ms[:8], \
            "decrypt mismatch"

    section(f"Decrypt{sfx}", _decrypt_section)
    return emult


def bench_batch_10k(pk, rng, iters):
    """Config 2: EAdd + EMultC over 10^4 level-1 ciphertexts."""
    B = 10_000
    ms = [rng.randrange(MSG_SPACE) for _ in range(B)]
    ks = [rng.randrange(-3, 4) or 1 for _ in range(B)]
    a = pk.encrypt(ms, rng=rng)
    b = pk.encrypt(ms, rng=rng)
    mat_ct(a), mat_ct(b)
    record("Add_10k", timed(lambda: pk.add(a, b), mat_ct, iters, B * iters),
           B, 2)
    record("MultConstant_10k",
           timed(lambda: pk.mult_const(a, ks), mat_ct, iters, B * iters),
           B, 2)


def bench_poly(pk, sk, tables, rng, iters):
    """Config 2 poly ops, the reference's exact workloads
    (poly_test.go:10-66: value 100.1, MultConstPoly by 1.0)."""
    from bgn_tpu import encoding, polyct

    pt = encoding.new_poly_plaintext(pk, 100.1)
    ct = polyct.encrypt_poly(pk, pt, rng=rng)
    mat_ct(ct.ct)

    def mat_poly(p):
        return mat_ct(p.ct)

    note = "single-value op; dominated by per-dispatch latency off-batch"
    record("EncryptPoly",
           timed(lambda: polyct.encrypt_poly(pk, pt, rng=rng), mat_poly,
                 iters, iters), 1, 2, note)
    record("DecryptPoly",
           timed(lambda: polyct.decrypt_poly(sk, ct, pk, tables),
                 lambda v: float(v.poly_eval()), iters, iters), 1, 2, note)
    record("AddPoly",
           timed(lambda: polyct.add_poly(pk, ct, ct, rng=rng), mat_poly,
                 iters, iters), 1, 2, note)
    record("MultConstantPoly",
           timed(lambda: polyct.mult_const_poly(pk, ct, 1.0, rng=rng),
                 mat_poly, iters, iters), 1, 2, note)
    record("MultPoly",
           timed(lambda: polyct.mult_poly(pk, ct, ct, rng=rng), mat_poly,
                 max(1, iters // 2), max(1, iters // 2)), 1, 2, note)


def bench_poly_batched(pk, sk, tables, rng, iters, B=512, value=100.1):
    """Config 2 poly ops at production batch: B polynomials (the
    reference's poly bench value 100.1, degree 3) per launch via the
    (degree, B) coefficient-batch layout (polyct poly batches).  This is
    the throughput the TPU design exists for -- the batch-1 numbers
    above are pure dispatch latency (VERDICT r4 weak #2: MultPoly 17/s
    at batch 1 plausibly LOST to single-core Go/PBC; MultPoly here runs
    degree^2 * B pairings in one launch against the 59k pairings/s
    budget)."""
    from bgn_tpu import encoding, polyct

    pt = encoding.new_poly_plaintext(pk, value)
    pts = [pt] * B
    batch = with_retry(lambda: polyct.encrypt_poly_batch(pk, pts, rng=rng))
    mat_ct(batch.ct)
    d = batch.degree

    def mat_poly(p):
        return mat_ct(p.ct)

    record(f"EncryptPoly_b{B}",
           timed(lambda: polyct.encrypt_poly_batch(pk, pts, rng=rng),
                 mat_poly, iters, B * iters), B, 2,
           f"degree {d}; polys/s")
    record(f"DecryptPoly_b{B}",
           timed(lambda: polyct.decrypt_poly_batch(sk, batch, pk, tables),
                 lambda ps: float(ps[0].poly_eval()), iters, B * iters),
           B, 2, f"degree {d}; polys/s")
    record(f"AddPoly_b{B}",
           timed(lambda: polyct.add_poly(pk, batch, batch, rng=rng),
                 mat_poly, iters, B * iters), B, 2, f"degree {d}; polys/s")
    record(f"MultConstantPoly_b{B}",
           timed(lambda: polyct.mult_const_poly(pk, batch, 1.0, rng=rng),
                 mat_poly, iters, B * iters), B, 2, f"degree {d}; polys/s")
    record(f"MultPoly_b{B}",
           timed(lambda: polyct.mult_poly(pk, batch, batch, rng=rng),
                 mat_poly, max(1, iters // 4), B * max(1, iters // 4)),
           B, 2, f"degree {d}: {d * d} pairings/poly; polys/s")
    record(f"EvalPoly_b{B}",
           timed(lambda: polyct.eval_poly(pk, batch, rng=rng), mat_ct,
                 iters, B * iters), B, 2, f"degree {d}; polys/s")


def bench_gadgets(pk, sk, rng, iters, batch=256):
    """Config 4: PoK gen/verify (gadgets_test.go:110-140, batched) + the
    fixed-point encrypted dot product."""
    from bgn_tpu import gadgets
    from bgn_tpu.models import encrypted_dot as ed

    for B in (batch, 2048):
        sfx = "" if B == batch else f"_{B}"
        vs = [rng.randrange(pk.n) % MSG_SPACE for _ in range(B)]
        zs = [rng.randrange(pk.n) for _ in range(B)]
        proof = gadgets.new_proof_of_plaintext_knowledge(pk, sk, vs, zs,
                                                         rng=rng)
        ct = proof.ct
        record(f"ProofOfPlaintextKnowledgeGen{sfx}",
               timed(lambda: gadgets.new_proof_of_plaintext_knowledge(
                         pk, sk, vs, zs, rng=rng),
                     lambda p: mat_ct(p.ct), max(1, iters // 2),
                     B * max(1, iters // 2)), B, 4)
        ok = gadgets.check_proof_of_plaintext_knowledge(pk, ct, proof)
        assert bool(ok.all()), "PoK verify rejected a valid proof"
        record(f"ProofOfPlaintextKnowledgeVerify{sfx}",
               timed(lambda: gadgets.check_proof_of_plaintext_knowledge(
                         pk, ct, proof),
                     lambda o: int(np.asarray(o).sum()),
                     max(1, iters // 2), B * max(1, iters // 2)), B, 4,
               "" if B == batch else
               "tunnel round-trip latency amortized at this batch")

    # encrypted dot product: D-element vectors, batch columns (the
    # second batch fills the chip: 8192 Miller loops per launch)
    for D, B in ((16, 128), (16, 512)):
        xs = np.array([[rng.randrange(8) for _ in range(B)]
                       for _ in range(D)])
        ys = np.array([[rng.randrange(8) for _ in range(B)]
                       for _ in range(D)])
        ct_x = pk.encrypt(xs.ravel().tolist(), rng=rng).reshape((D, B))
        ct_y = pk.encrypt(ys.ravel().tolist(), rng=rng).reshape((D, B))
        mat_ct(ct_x), mat_ct(ct_y)
        record(f"EncryptedDot_d{D}_b{B}",
               timed(lambda: ed.encrypted_dot(pk, ct_x, ct_y), mat_ct,
                     max(1, iters // 4), B * max(1, iters // 4)), B, 4,
               f"{D}-element dot: {D} fused Miller loops + ONE final "
               "exp per item")


def bench_multichip(pk, sk, tables, rng, iters):
    """DP scaling: shard the EMult batch over all visible devices
    (lights up the moment >1 chip exists; scaling efficiency vs 1 chip)."""
    from bgn_tpu.parallel import mesh as mesh_mod
    from bgn_tpu.parallel import multihost as mh
    from bgn_tpu.scheme import _mult_kernel

    ndev = len(jax.devices())
    if ndev < 2:
        log("  multichip: 1 device visible -- skipped")
        return
    B = BATCH * ndev
    ms = [rng.randrange(MSG_SPACE) for _ in range(B)]
    mesh = mh.make_global_mesh()
    a = mesh_mod.shard_ciphertext(pk.encrypt(ms, rng=rng), mesh)
    b = mesh_mod.shard_ciphertext(pk.encrypt(ms, rng=rng), mesh)
    mat_ct(a), mat_ct(b)
    rate = timed(lambda: _mult_kernel(pk.dev, a.data, b.data),
                 lambda o: np.asarray(o[:, :, 0]).sum(), iters, B * iters)
    one_chip = RESULTS.get("Mult", {}).get("ops_per_sec")
    eff = f"; scaling efficiency {rate / (one_chip * ndev):.2f}" \
        if one_chip else ""
    record(f"Mult_dp{ndev}", rate, B, 5, f"DP over {ndev} devices{eff}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="all BASELINE.json configs -> bench_full.json")
    ap.add_argument("--skip-1024", action="store_true")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    from bgn_tpu import scheme
    from bgn_tpu.config import BGNParams

    t0 = time.time()
    rng = random.Random(1234)
    params = BGNParams(key_bits=KEY_BITS, msg_space=MSG_SPACE)
    pk, sk = with_retry(lambda: params.keygen(rng=random.Random(1234)))
    rng = random.Random(5678)   # independent stream: retries must not
    keygen_s = time.time() - t0  # desync the data rng
    log(f"keygen({KEY_BITS}): {keygen_s:.1f}s "
        f"(l={pk.l}, L={pk.dev.ctx.L} limbs)")
    t0 = time.time()
    tables = with_retry(lambda: pk.setup_decryption(sk, rng=rng))
    log(f"setup_decryption: {time.time() - t0:.1f}s")

    log(f"== config 1+3: core ops at {KEY_BITS}-bit, batch {BATCH}")
    record("KeyGen", 1.0 / keygen_s, 1, 1, "host-side (single)")
    emult = bench_core(pk, sk, tables, rng, BATCH, args.iters, 1,
                       decrypt_batch=DECRYPT_BATCH)

    if args.full:
        log("== config 2: 10^4-batch EAdd/EMultC + poly ops")
        section("batch_10k",
                lambda: bench_batch_10k(pk, rng, max(2, args.iters // 2)))
        section("poly",
                lambda: bench_poly(pk, sk, tables, rng,
                                   max(2, args.iters // 2)))
        section("poly_batched",
                lambda: bench_poly_batched(pk, sk, tables, rng,
                                           max(2, args.iters // 2)))
        # degree-3 variant (value 7.0 -> balanced digits [1,-1,1]): the
        # 9-pairings-per-poly shape of VERDICT r4 task 1
        section("poly_batched_d3",
                lambda: bench_poly_batched(pk, sk, tables, rng,
                                           max(2, args.iters // 2),
                                           B=1024, value=7.0))
        log("== config 4: gadgets")
        section("gadgets", lambda: bench_gadgets(pk, sk, rng, args.iters))
        log("== config 5: multi-chip DP scaling")
        section("multichip",
                lambda: bench_multichip(pk, sk, tables, rng,
                                        max(2, args.iters // 2)))
        if not args.skip_1024:
            log("== config 5: 1024-bit")

            def _bench_1024():
                t0 = time.time()
                rng2 = random.Random(4321)
                pk2, sk2 = BGNParams(key_bits=1024,
                                     msg_space=MSG_SPACE).keygen(rng=rng2)
                record("KeyGen_1024", 1.0 / (time.time() - t0), 1, 5,
                       "host-side (single)")
                tables2 = pk2.setup_decryption(sk2, rng=rng2)
                bench_core(pk2, sk2, tables2, rng2, 512,
                           max(2, args.iters // 2), 5, label="1024")

            section("core_1024", _bench_1024)
        out = {
            "device": f"{jax.devices()[0].platform}:{len(jax.devices())}",
            "key_bits": KEY_BITS,
            "msg_space": MSG_SPACE,
            "configs": "BASELINE.json 1-5 (multi-host pending >1 host)",
            "results": RESULTS,
        }
        path = os.path.join(os.path.dirname(__file__) or ".",
                            "bench_full.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        log(f"wrote {path}")

    if emult is None:
        # the Mult section failed even after retries; the run still has a
        # record for every surviving section -- report rc=1 with context
        log("headline Mult section failed; see error entries above")
        print(json.dumps({
            "metric": "emult_pairings_per_sec", "value": None,
            "unit": "ops/s", "vs_baseline": None,
            "error": RESULTS.get("Mult__error", {}).get("error", "unknown"),
        }), flush=True)
        sys.exit(1)
    n_chips = len(jax.devices())
    baseline = NORTH_STAR_PER_CHIP * n_chips
    print(json.dumps({
        "metric": "emult_pairings_per_sec",
        "value": round(emult, 2),
        "unit": "ops/s",
        "vs_baseline": round(emult / baseline, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
