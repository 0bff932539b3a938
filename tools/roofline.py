"""Per-kernel roofline for the RNS/MXU hot path (BASELINE.md build target
"per-kernel field arithmetic profiled vs speed-of-light"; VERDICT.md
round-1 item 7).

Run on the TPU chip:  python tools/roofline.py [--batch 2048] [--md]
Prints a measured-vs-speed-of-light table; --md rewrites the table block
in docs/PERF.md.

Model
-----
Every RNS modmul (fieldcore/rns.py:r_mul) does
  * MXU work: two base-extension matmuls [3k+1, 2k] @ [2k, B] bf16
    -> 2 * (2 * (3k+1) * 2k * B) flops;
  * VPU work: ~R_MUL_VPU_UNITS "k*B-sized" fp32 elementwise ops (hand
    count over the r_mul body: digit products, 4-op _red reductions,
    6-bit splits, dtype converts, alpha/correction arithmetic).
Higher-level kernels are r_mul multiples (counts audited against
ops/rns_pairing.py):
  dbl step 21 r_mul, add step 17, point dbl 12, point add 11,
  F_p^2 sqr 2 + mul 3 (pow step <= 5), F_p pow step <= 2.
Speed-of-light = VPU-issue time (the path is VPU-bound: at k = 45 one
r_mul issues ~60*45 = 2700 VPU ops/element vs ~24.5k MXU flops/element =
0.13 us/elem-batch-of-1024 on the 197 TF MXU -- negligible).

Peaks (TPU v5e, public numbers: jax-ml.github.io/scaling-book):
  MXU 197e12 bf16 flop/s; HBM 8.1e11 B/s;
  VPU ~3.9e12 fp32 op/s (8x128 lanes x 4 ALUs x ~0.94 GHz).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BGN_TPU_RNS_MILLER", "1")

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("BGN_TPU_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

MXU_PEAK = 197e12          # bf16 flop/s, v5e
VPU_PEAK = 3.9e12          # fp32 elementwise op/s, v5e (estimate)
HBM_PEAK = 8.1e11          # B/s, v5e

R_MUL_VPU_UNITS = 60       # fp32 ops of size k*B per r_mul (hand count)

# r_mul multiples per kernel step (audited against ops/rns_pairing.py)
RMUL = {"dbl_step": 21, "add_step": 17, "pt_dbl": 12, "pt_add": 11,
        "fp2_sqr": 2, "fp2_mul": 3}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rmul_vpu_ops(k, B):
    return R_MUL_VPU_UNITS * k * B


def rmul_mxu_flops(k, B):
    return 2 * (2 * (3 * k + 1) * 2 * k * B)


def timeit(fn, mat, iters=8):
    mat(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    mat(out)
    return (time.time() - t0) / iters


class Row:
    def __init__(self, name, t_batch, B, n_rmul, hbm_bytes, note=""):
        self.name, self.t, self.B, self.note = name, t_batch, B, note
        self.n_rmul = n_rmul
        self.hbm = hbm_bytes

    def cells(self, k):
        vpu = self.n_rmul * rmul_vpu_ops(k, 1)        # per element
        mxu = self.n_rmul * rmul_mxu_flops(k, 1)
        sol = vpu / VPU_PEAK                          # s/element at peak
        t_elem = self.t / self.B
        return [
            self.name,
            f"{self.t * 1e3:.1f}",
            f"{t_elem * 1e6:.2f}",
            f"{vpu / 1e3:.1f}k",
            f"{sol * 1e6:.2f}",
            f"{100 * sol / t_elem:.0f}%",
            f"{100 * mxu / t_elem / MXU_PEAK:.1f}%",
            f"{self.hbm / self.t / 1e9:.0f}",
            self.note,
        ]


HDR = ["kernel", "ms/batch", "us/elem", "VPU ops/elem", "SoL us/elem",
       "% of VPU SoL", "MXU % peak", "HBM GB/s", "notes"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--md", action="store_true",
                    help="rewrite the roofline block in docs/PERF.md")
    args = ap.parse_args()
    B = args.batch

    import random

    from bgn_tpu import scheme
    from bgn_tpu.fieldcore import rns as rn
    from bgn_tpu.ops import pallas_rns as prns
    from bgn_tpu.ops import rns_pairing as rp
    from bgn_tpu.scheme import _decrypt_l1_kernel, _encrypt_kernel

    log(f"backend: {jax.default_backend()}  batch: {B}")
    rng = random.Random(1234)
    t0 = time.time()
    pk, sk = scheme.keygen(512, 1021, rng=rng)
    dev = pk.dev
    rns = dev.rns
    k, ch, L = rns.k, 2 * rns.k, dev.ctx.L
    nbits = int(dev.n_bits.shape[0])
    log(f"keygen: {time.time() - t0:.1f}s  k={k} L={L} nbits={nbits}")
    tables = pk.setup_decryption(sk, rng=rng)

    ms = [rng.randrange(1021) for _ in range(B)]
    a = pk.encrypt(ms, rng=rng)
    b = pk.encrypt(ms, rng=rng)
    jax.block_until_ready(a.data.x)
    ax = rn.to_rns_mont(rns, a.data.x).v
    ay = rn.to_rns_mont(rns, a.data.y).v
    f32 = 4
    state_b = ch * B * f32

    rows = []

    # --- r_mul: 128-chain inside one jit (XLA path) ---
    @jax.jit
    def chain(x, y):
        def body(c, _):
            return rn.r_mul(rns, rn.RVal(c, 3), rn.RVal(y, 3)).v, None
        out, _ = jax.lax.scan(body, x, None, length=128)
        return out

    t = timeit(lambda: chain(ax, ay), lambda o: np.asarray(o[0]).sum())
    rows.append(Row("r_mul (XLA scan x128)", t / 128, B, 1,
                    3 * state_b, "per-mul HBM: x,y in + out"))

    # --- Miller step kernels (Pallas, scan of 64) ---
    one = jnp.broadcast_to(rns.one_rns, ax.shape)

    @jax.jit
    def dbl64(X, Y, Z, fr, fi, xb, yb):
        def body(c, _):
            return tuple(prns.dbl_step_pallas(rns, *c, rp._pt(xb),
                                              rp._pt(yb))), None
        out, _ = jax.lax.scan(body, (X, Y, Z, fr, fi), None, length=64)
        return out

    t = timeit(lambda: dbl64(ax, ay, one, one, jnp.zeros_like(one),
                             ax, ay),
               lambda o: np.asarray(o[0][0]).sum())
    rows.append(Row("Miller dbl step (Pallas)", t / 64, B, RMUL["dbl_step"],
                    12 * state_b, "5 state + 2 line args in, 5 out"))

    @jax.jit
    def add64(X, Y, Z, fr, fi, axx, ayy):
        def body(c, _):
            return tuple(prns.add_step_pallas(
                rns, *c, rp._pt(axx), rp._pt(ayy), rp._pt(axx),
                rp._pt(ayy))), None
        out, _ = jax.lax.scan(body, (X, Y, Z, fr, fi), None, length=64)
        return out

    t = timeit(lambda: add64(ax, ay, one, one, jnp.zeros_like(one),
                             ax, ay),
               lambda o: np.asarray(o[0][0]).sum())
    rows.append(Row("Miller add step (Pallas)", t / 64, B, RMUL["add_step"],
                    14 * state_b, ""))

    # --- whole pairing, loop mode vs step mode ---
    n_pair_rmul = ((nbits - 1) * RMUL["dbl_step"]
                   + (nbits // 2) * RMUL["add_step"]
                   + nbits * (RMUL["fp2_sqr"] + RMUL["fp2_mul"] // 2 + 1)
                   + nbits * 2)  # final exp: fp2 pow + Fermat inversion pow

    for mode in ("loop", "1"):
        rp._PALLAS_MODE = mode
        pair = jax.jit(lambda d, u, v: rp.pairing_rns(
            d.ctx, d.rns, u, v, d.n_bits, d.l_bits))
        t = timeit(lambda: pair(dev, a.data, b.data),
                   lambda o: np.asarray(o[:, :, 0]).sum(), iters=4)
        tag = "whole-loop kernel" if mode == "loop" else "per-step kernels"
        rows.append(Row(f"pairing ({tag})", t, B, n_pair_rmul,
                        (4 + 4) * L * B * f32,
                        "limb in/out only (loop state in VMEM)"
                        if mode == "loop" else
                        f"~{3 * nbits} state round trips"))
        jax.clear_caches()

    # --- decrypt (ladder + BSGS) and encrypt (window ladders) ---
    rp._PALLAS_MODE = "loop"
    n_lad_rmul = (nbits - 1) * (RMUL["pt_dbl"] + RMUL["pt_add"] // 2)
    t = timeit(lambda: _decrypt_l1_kernel(dev, tables, sk.q1_bits,
                                          a.data, sk.q1_naf)[1],
               lambda o: np.asarray(o).sum(), iters=4)
    rows.append(Row("L1 decrypt (ladder+BSGS)", t, B, n_lad_rmul,
                    2 * L * B * f32, "BSGS scan adds ~33 limb madds"))

    rng_np = np.random.default_rng(7)
    Jp = dev.p_win.x.shape[1]
    Jq = dev.q_win.x.shape[1]
    m_digits = jnp.asarray(rng_np.integers(0, 16, (Jp, B), np.uint32))
    r_digits = jnp.asarray(rng_np.integers(0, 16, (Jq, B), np.uint32))
    m_neg = jnp.zeros((B,), jnp.uint32)
    n_enc_rmul = (Jp + Jq) * RMUL["pt_add"]
    t = timeit(lambda: _encrypt_kernel(dev, m_digits, m_neg, r_digits),
               lambda o: np.asarray(o.x[0]).sum(), iters=4)
    rows.append(Row("encrypt (fused dual ladder)", t, B, n_enc_rmul,
                    2 * (Jp + Jq) * state_b,
                    "in-kernel one-hot MXU table select; knee at 8192"))
    jax.clear_caches()

    # --- render ---
    widths = [max(len(HDR[i]), max(len(r.cells(k)[i]) for r in rows))
              for i in range(len(HDR))]

    def fmt(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in
                                 zip(cells, widths)) + " |"

    lines = [fmt(HDR),
             "|" + "|".join("-" * (w + 2) for w in widths) + "|"]
    lines += [fmt(r.cells(k)) for r in rows]
    table = "\n".join(lines)
    print(table)

    if args.md:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "PERF.md")
        src = open(path).read()
        begin, end = "<!-- roofline:begin -->", "<!-- roofline:end -->"
        dev0 = jax.devices()[0]
        block = (f"{begin}\nMeasured on {dev0.device_kind} "
                 f"({jax.default_backend()}), 512-bit key, batch {B}, "
                 f"k={k} channels (tools/roofline.py):\n\n{table}\n{end}")
        if begin in src:
            pre = src[:src.index(begin)]
            post = src[src.index(end) + len(end):]
            src = pre + block + post
        else:
            src += "\n\n## Roofline (measured vs speed-of-light)\n\n" \
                   + block + "\n"
        open(path, "w").write(src)
        log(f"wrote roofline table to {path}")


if __name__ == "__main__":
    main()
