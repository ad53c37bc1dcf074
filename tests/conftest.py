"""Test configuration.

- Forces the CPU platform with 8 virtual devices so multi-device sharding
  paths run without TPU hardware (the environment may pin JAX_PLATFORMS to
  the TPU tunnel, and a pytest plugin may import jax before this file —
  handle both).
- Enables the persistent compilation cache so repeat runs skip XLA compiles.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above

jax.config.update("jax_compilation_cache_dir", "/tmp/gaot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked 'slow' (full tier: heavy e2e/parity tests)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy end-to-end / parity tests, opt-in via --runslow "
        "(default tier: ~4-5 min solo on this box's single CPU core, up to "
        "~2x under load; full tier ~15-25 min). Skip accounting for the "
        "default tier (46 skips as of round 5): all but a handful are "
        "slow-marked heavy-tier tests; the remainder are TPU-only Pallas "
        "kernel tests that conditionally skip on the CPU mesh.")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
