"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware.

Note: this image pre-imports jax via an axon sitecustomize at interpreter
startup with JAX_PLATFORMS=axon, so setting env vars here is too late for
platform selection — we must update jax.config directly (backends are not yet
initialized when conftest runs, so this still takes effect).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
