"""Test harness: run everything on CPU with 8 virtual devices.

Must set env vars before the first ``import jax`` anywhere in the test
session so multi-chip sharding tests can build an 8-device mesh without
TPU hardware.
"""

import os
import sys
from pathlib import Path

# Import the package from the repo root without requiring installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
