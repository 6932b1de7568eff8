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

# the suite is compile-dominated (2-vCPU host): persist compiled
# executables across runs so repeated suite invocations skip most of it
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax-tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the expensive compile-heavy tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: expensive compile-heavy test; skipped unless "
                   "--runslow or PYRO2_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest
    if config.getoption("--runslow") or \
            os.environ.get("PYRO2_RUN_SLOW", "0") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or "
                                   "PYRO2_RUN_SLOW=1) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
