"""Test configuration: force an 8-device virtual CPU mesh so tests run
without TPU hardware and without per-op remote-compile latency.

Note: the axon sitecustomize registers the TPU backend at interpreter boot
and overwrites `jax_platforms`, so setting JAX_PLATFORMS in the environment
is not enough — we must update the jax config after import, before any
backend is instantiated.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent CPU compile cache for the test lane: without it every pytest
# process recompiles the big step programs from scratch on this 1-core
# host (the "fast" lane was >9 min, mostly compiles). The cache directory
# is repo-local (survives /tmp cleanup) but NOT committed (.gitignore):
# CPU executables are architecture-specific scratch.
_cpu_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
os.makedirs(_cpu_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cpu_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
