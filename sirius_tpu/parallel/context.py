"""Active-mesh context: opt-in multi-chip execution for the protocol paths.

The reference has no distributed layer (SURVEY.md §2.8); here a process-wide
active mesh switches the hot paths to their sharded variants without
threading a mesh argument through every protocol call:

- `CommitmentKey.commit_device` routes through `msm_sharded` (per-device
  bucket kernels, window totals combined once)
- `run_sps_protocol` places round witness arrays row-sharded, so the jitted
  gate/lookup row sweeps downstream inherit the sharding via GSPMD
  propagation (XLA inserts halo exchanges for rotations and psums for
  reductions)

The Poseidon transcript always stays on the host controller, keeping
absorb/squeeze order device-count invariant (SURVEY.md §5).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_ACTIVE_MESH: Optional[Mesh] = None


def get_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextmanager
def mesh_context(mesh: Mesh):
    prev = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def row_sharding():
    """NamedSharding(P('rows', None)) for the active mesh, else None.

    Passed as an explicit in/out_sharding on jitted protocol programs so
    GSPMD sees consistent annotations instead of inferring mixed layouts
    (the round-3 dryrun's 'involuntary full rematerialization' on W0 came
    from exactly such an inference mismatch)."""
    mesh = get_mesh()
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec("rows", None))


def replicated_sharding():
    """Fully-replicated NamedSharding for the active mesh, else None."""
    mesh = get_mesh()
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec())
