"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit/integration tests use the CPU
backend with 8 virtual devices so multi-chip sharding paths are exercised
without hardware (the analogue of the reference's single-process `cargo test`,
SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
