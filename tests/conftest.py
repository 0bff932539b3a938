"""Test configuration: force the local CPU backend with 8 virtual devices
so multi-chip sharding paths are exercised without TPU hardware (the
fake-backend layer the reference lacks; SURVEY.md §4 item 4).

NOTE: this environment preloads jax at interpreter startup with the
tunneled TPU platform already configured (jax_platforms="axon,cpu"), so
env-var overrides are too late -- the override must go through
jax.config.update before any backend is initialized."""
import os

flags = os.environ.get("XLA_FLAGS", "")
# xla_cpu_parallel_codegen_split_count=1: XLA:CPU sporadically SIGABRTs
# while compiling our large unrolled/scan graphs with parallel codegen.
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_parallel_codegen_split_count=1").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: XLA:CPU compiles of the 512-bit graphs
# dominate suite wall time (TODO.md round-1 item); cache them across runs
# and across the per-module jax.clear_caches() below (which drops only the
# in-memory executables).  BGN_TPU_NO_CACHE=1 to disable.
if not os.environ.get("BGN_TPU_NO_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def pytest_collection_modifyitems(config, items):
    """Tests marked `slow` (multi-minute 1024-bit CPU compiles) run only
    when explicitly requested via BGN_TPU_RUN_SLOW=1."""
    if os.environ.get("BGN_TPU_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: set BGN_TPU_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# NOTE (r5): the per-module autouse jax.clear_caches() that lived here
# is gone.  It existed for sporadic XLA:CPU SIGABRTs in backend_compile;
# those coincided with a persistent cache populated on a DIFFERENT
# machine (cpu_aot_loader logged feature-mismatch loads that "could lead
# to execution errors such as SIGILL").  With the cache rebuilt on this
# host the crashes have not reproduced, and the clear was the single
# largest suite cost: each of ~15 modules re-traced the whole shared
# kernel set (~10-20s python tracing per large kernel).  Mode-flip tests
# now clear surgically via tests/_kernels.clear_mode_kernels.


@pytest.fixture(scope="session")
def shared_keypair64():
    """ONE 64-bit keypair shared across the fast test modules.  Same
    rationale as shared_keypair: MontCtx.p_host keys the jit and
    persistent caches by key VALUE, so every distinct 64-bit key used to
    retrace + recompile the whole kernel set (test_rns alone built 8)."""
    import random

    from bgn_tpu import scheme
    rng = random.Random(5)
    return scheme.keygen(64, 101, rng=rng)


@pytest.fixture(scope="session")
def shared_tables64(shared_keypair64):
    import random

    pk, sk = shared_keypair64
    return pk.setup_decryption(sk, rng=random.Random(5))


@pytest.fixture(scope="session")
def shared_keypair():
    """ONE 160-bit keypair + decrypt tables shared across test modules
    (VERDICT r3 item 8): MontCtx.p_host is a static pytree field, so the
    jit AND persistent caches are keyed by key VALUE -- per-module random
    keys defeated both and re-traced every kernel per module.  Reference
    test constants otherwise (bgn_test.go:8-13, at 160-bit for CPU
    speed)."""
    import random

    from bgn_tpu import scheme
    rng = random.Random(1602024)
    pk, sk = scheme.keygen(160, 1021, rng=rng)
    tables = pk.setup_decryption(sk, rng=rng)
    return pk, sk, tables
