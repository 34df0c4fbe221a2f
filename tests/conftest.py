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

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (full-spp golden parity; >30 min on CPU)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, skipped unless --runslow or RPT_RUN_SLOW=1"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RPT_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; pass --runslow (or RPT_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
