"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (the fake-backend layer the
reference lacks; SURVEY.md §4 item 4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
