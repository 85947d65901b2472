"""Persistent XLA compile-cache setup.

One cache dir per (backend, host machine): a TPU-tunnel process compiles its
host-side CPU executables on the REMOTE machine, whose CPU features differ
from the local one — sharing a single dir poisons it with AOT artifacts that
SIGILL/segfault when a local CPU run loads them (observed: cpu_aot_loader
"machine feature +prefer-no-gather is not supported on the host machine",
then a segfault in backend_compile_and_load).
"""

from __future__ import annotations

import hashlib
import os
import platform


def setup_compile_cache(base: str = "/tmp/sirius_tpu_xla_cache") -> str:
    """Point jax's persistent compilation cache at a per-backend+host dir.
    Call before (or after) importing jax, ideally before any jit runs.

    The dir key also includes whether the axon TPU tunnel is present
    (PALLAS_AXON_POOL_IPS): under the tunnel, even CPU-backend programs may
    be compiled by the REMOTE compile service with that machine's CPU
    features (+avx512*, +prefer-no-gather, ...) — sharing a dir with
    tunnel-bypassed local runs poisons it with AOT artifacts that warn or
    crash on load (observed round 4: a poisoned entry killed one of eight
    in-process collective participants, aborting the CPU-mesh dryrun with
    a rendezvous termination timeout)."""
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    host = hashlib.sha256(
        (platform.machine() + platform.node()).encode()
    ).hexdigest()[:8]
    # only the CPU backend needs the split: a tunnel process doing CPU
    # compiles gets remote-featured AOT artifacts, a bypassed one local —
    # the TPU dir stays stable so TPU cache warming survives either way
    tunnel = "-rc" if backend == "cpu" and os.environ.get("PALLAS_AXON_POOL_IPS") else ""
    path = f"{base}-{backend}-{host}{tunnel}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
