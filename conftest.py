"""Test environment: run on CPU with 8 virtual devices for sharding tests.

A sitecustomize in this image may import jax and register a TPU backend at
interpreter startup (before this conftest). Backends initialize lazily on
first use, so the jax.config updates below still force the CPU platform.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# float64 available for parity tests (TPU runs use float32; tests that care
# about TPU dtypes cast explicitly)
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
