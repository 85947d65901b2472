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
    Call before (or after) importing jax, ideally before any jit runs."""
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    host = hashlib.sha256(
        (platform.machine() + platform.node()).encode()
    ).hexdigest()[:8]
    path = f"{base}-{backend}-{host}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
