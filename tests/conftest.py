"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-device sharding paths are exercised without TPU hardware.

The environment may pin JAX_PLATFORMS=axon (TPU tunnel) and a pytest plugin
may import jax before this file runs, so set both the env vars and the jax
config (backends initialize lazily, so config updates still take effect)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # XLA_FLAGS fallback above
