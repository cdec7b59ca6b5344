"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
x64 is enabled so float64 golden tests against the reference physics (the
reference simulates in float64, plb/engine/mpm_simulator.py:8) are meaningful;
library code always passes explicit dtypes and works in both modes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# This machine has a single CPU core and XLA-CPU compiles slowly; persist
# compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
