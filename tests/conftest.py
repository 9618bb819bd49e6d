"""Test configuration: force a virtual 8-device CPU platform for sharding tests.

The axon sitecustomize programmatically sets ``jax_platforms="axon,cpu"``,
overriding the JAX_PLATFORMS env var — so the config must be updated via
jax.config AFTER import (before any backend initializes).  All tests run on
CPU (hermetic w.r.t. TPU availability); multi-chip sharding is exercised on
the virtual 8-device host platform.  Matmul precision is forced to float32 so
torch-parity tests compare like for like.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# smoke tests exercise the LPIPS loss shape without real backbone weights;
# production training hard-errors instead (losses/perceptual_loss.py)
os.environ.setdefault("CRDR_ALLOW_RANDOM_LPIPS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
