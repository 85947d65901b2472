"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit/integration tests use the CPU
backend with 8 virtual devices so multi-chip sharding paths are exercised
without hardware (the analogue of the reference's single-process `cargo test`,
SURVEY.md §4).

NOTE: this image preloads jax and registers the TPU ("axon") backend via
sitecustomize, so env vars set here are too late — the platform MUST be
forced programmatically before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the limbed field kernels produce large XLA
# graphs; caching makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
