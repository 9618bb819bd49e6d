"""Test configuration: force a virtual 8-device CPU platform for sharding tests.

Must set XLA flags before jax initializes.  All tests run on CPU so they are
hermetic w.r.t. TPU availability; multi-chip sharding is exercised on the
virtual 8-device host platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
