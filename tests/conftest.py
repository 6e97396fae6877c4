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
