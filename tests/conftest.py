"""Test harness: run everything on CPU with 8 virtual devices.

The ambient environment pre-registers a TPU tunnel backend ("axon") via a
sitecustomize hook and pins ``jax_platforms`` to it; routing tests through
that tunnel would serialize every op over RPC.  Backends initialize lazily,
so overriding the config + XLA flags here (before any device use) reliably
lands the whole suite on an 8-device virtual CPU, which is also what the
multi-chip sharding tests need.
"""

import os
import sys
from pathlib import Path

# Import the package from the repo root without requiring installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("QWEN3_TPU_TESTS") == "1":
    # Escape hatch: leave the ambient (TPU) backend alone so the
    # TPU-gated suites (tests/test_tpu_kernels.py) can run on real
    # hardware: QWEN3_TPU_TESTS=1 pytest tests/test_tpu_kernels.py
    import jax  # noqa: E402
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    assert len(jax.devices()) == 8, (
        "test harness expected 8 virtual CPU devices, got "
        f"{jax.devices()} — platform override failed"
    )
