"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
x64 is enabled so float64 golden tests against the reference physics (the
reference simulates in float64, plb/engine/mpm_simulator.py:8) are meaningful;
library code always passes explicit dtypes and works in both modes.
"""
import os

# This machine pre-imports jax from a sitecustomize.py before ANY user code
# runs, with JAX_PLATFORMS=axon (the real TPU) baked into the config default —
# so setting env vars here is too late for the platform choice. The backends
# are not initialized yet, though, so jax.config.update still works; XLA_FLAGS
# is read lazily at CPU-client creation, so the env var still works for the
# virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# This machine has a single CPU core and XLA-CPU compiles slowly; persist
# compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
