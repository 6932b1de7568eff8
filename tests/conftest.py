"""Test configuration: run JAX on CPU with x64 (parity with the float64
reference) and 8 virtual devices for multi-chip sharding tests.

Set PYRO2_TPU_TESTS=1 to keep the real device backend instead (enables
tests/test_pallas_tpu.py's on-chip kernel validation; the CPU-pinned
suite skips it).

Note: this environment's site hook forces jax_platforms="axon,cpu" (the
real TPU via a tunnel), overriding the JAX_PLATFORMS env var -- so the
platform must be forced through jax.config AFTER importing jax.
"""

import os

_on_device = os.environ.get("PYRO2_TPU_TESTS", "0") == "1"

if not _on_device:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not _on_device:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
