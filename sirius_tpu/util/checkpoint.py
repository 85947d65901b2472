"""Accumulator checkpoint / resume.

The reference only caches commitment keys (SURVEY.md §5 "Checkpoint /
resume"); long folds (2^16 steps) need real accumulator checkpointing, keyed
by the public-parameter digest so resumes can't mix incompatible setups.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..fields import gold
from ..fields.constants import CURVES, CurveSpec
from ..nifs.sangria import RelaxedPlonkInstance, RelaxedPlonkTrace, RelaxedPlonkWitness
from ..plonk.structure import PlonkWitness


def _point_to_json(pt) -> dict:
    return {"inf": pt.is_identity, "x": hex(pt.x or 0), "y": hex(pt.y or 0)}


def _point_from_json(curve: CurveSpec, d: dict):
    if d["inf"]:
        return gold.identity(curve)
    return gold.AffinePoint(curve, int(d["x"], 16), int(d["y"], 16))


def save_sangria_accumulator(path: str, curve: CurveSpec, acc: RelaxedPlonkTrace, pp_digest_hex: str, step: int):
    """Instance as JSON + witness arrays as npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    U = acc.U
    meta = {
        "pp_digest": pp_digest_hex,
        "step": step,
        "curve": curve.name,
        "W_commitments": [_point_to_json(c) for c in U.W_commitments],
        "consistency_markers": [hex(v) for v in U.consistency_markers],
        "challenges": [hex(v) for v in U.challenges],
        "E_commitment": _point_to_json(U.E_commitment),
        "u": hex(U.u),
        "sc_hash_acc": None if U.sc_instances_hash_acc is None else hex(U.sc_instances_hash_acc),
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    np.savez(
        path + ".npz",
        E=np.asarray(acc.W.E),
        **{f"W{i}": np.asarray(w) for i, w in enumerate(acc.W.W)},
    )


def _instance_to_json(u) -> dict:
    return {
        "W_commitments": [_point_to_json(c) for c in u.W_commitments],
        "instances": [[hex(v) for v in inst] for inst in u.instances],
        "challenges": [hex(v) for v in u.challenges],
    }


def _instance_from_json(curve: CurveSpec, d: dict):
    from ..plonk.structure import PlonkInstance

    return PlonkInstance(
        [_point_from_json(curve, c) for c in d["W_commitments"]],
        [[int(v, 16) for v in inst] for inst in d["instances"]],
        [int(v, 16) for v in d["challenges"]],
    )


def save_cyclefold_state(path: str, ivc, pp_digest_hex: str):
    """Full cyclefold IVC state: PG accumulator (instance + witness + betas
    + e), support Sangria accumulator, the pending primary trace, and the
    step counter / z-state.  Keyed by the pp digest like the sangria saver."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    acc = ivc.self_acc
    meta = {
        "pp_digest": pp_digest_hex,
        "step": ivc.step,
        "z_0": [hex(v) for v in ivc.z_0],
        "z_i": [hex(v) for v in ivc.z_i],
        "pg_u": _instance_to_json(acc.trace.u),
        "pg_betas": [hex(b) for b in acc.betas],
        "pg_e": hex(acc.e),
        "primary_u": _instance_to_json(ivc.primary_trace.u),
        "support_U": {
            "W_commitments": [_point_to_json(c) for c in ivc.support_acc.U.W_commitments],
            "consistency_markers": [hex(v) for v in ivc.support_acc.U.consistency_markers],
            "challenges": [hex(v) for v in ivc.support_acc.U.challenges],
            "E_commitment": _point_to_json(ivc.support_acc.U.E_commitment),
            "u": hex(ivc.support_acc.U.u),
            "sc_hash_acc": None
            if ivc.support_acc.U.sc_instances_hash_acc is None
            else hex(ivc.support_acc.U.sc_instances_hash_acc),
        },
        "support_pub_instances": [
            [[hex(v) for v in col] for col in insts] for insts in ivc.support_pub_instances
        ],
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    np.savez(
        path + ".npz",
        supE=np.asarray(ivc.support_acc.W.E),
        **{f"pgW{i}": np.asarray(w) for i, w in enumerate(acc.trace.w.W)},
        **{f"priW{i}": np.asarray(w) for i, w in enumerate(ivc.primary_trace.w.W)},
        **{f"supW{i}": np.asarray(w) for i, w in enumerate(ivc.support_acc.W.W)},
    )


def load_cyclefold_state(path: str, pp, pp_digest_hex: str):
    """Reconstruct a CyclefoldIVC mid-fold from a checkpoint; raises on a
    pp-digest mismatch."""
    import jax.numpy as jnp

    from ..fields.constants import bn256_g1, grumpkin
    from ..ivc.cyclefold_ivc import CyclefoldIVC
    from ..nifs.protogalaxy import Accumulator
    from ..plonk.structure import PlonkTrace

    with open(path + ".json") as f:
        meta = json.load(f)
    if meta["pp_digest"] != pp_digest_hex:
        raise ValueError(
            f"checkpoint pp digest {meta['pp_digest']} != expected {pp_digest_hex}"
        )
    data = np.load(path + ".npz")
    ivc = CyclefoldIVC.__new__(CyclefoldIVC)
    ivc.pp = pp
    ivc.step = meta["step"]
    ivc.z_0 = [int(v, 16) for v in meta["z_0"]]
    ivc.z_i = [int(v, 16) for v in meta["z_i"]]
    pg_u = _instance_from_json(bn256_g1, meta["pg_u"])
    pg_w = PlonkWitness([jnp.asarray(data[f"pgW{i}"]) for i in range(len(pg_u.W_commitments))])
    ivc.self_acc = Accumulator(
        PlonkTrace(pg_u, pg_w),
        [int(b, 16) for b in meta["pg_betas"]],
        int(meta["pg_e"], 16),
    )
    pri_u = _instance_from_json(bn256_g1, meta["primary_u"])
    pri_w = PlonkWitness([jnp.asarray(data[f"priW{i}"]) for i in range(len(pri_u.W_commitments))])
    ivc.primary_trace = PlonkTrace(pri_u, pri_w)
    su = meta["support_U"]
    U = RelaxedPlonkInstance(
        W_commitments=[_point_from_json(grumpkin, d) for d in su["W_commitments"]],
        consistency_markers=[int(v, 16) for v in su["consistency_markers"]],
        challenges=[int(v, 16) for v in su["challenges"]],
        E_commitment=_point_from_json(grumpkin, su["E_commitment"]),
        u=int(su["u"], 16),
        sc_instances_hash_acc=None if su["sc_hash_acc"] is None else int(su["sc_hash_acc"], 16),
    )
    W = RelaxedPlonkWitness(
        [jnp.asarray(data[f"supW{i}"]) for i in range(len(su["W_commitments"]))],
        jnp.asarray(data["supE"]),
    )
    ivc.support_acc = RelaxedPlonkTrace(U, W)
    ivc.support_pub_instances = [
        [[int(v, 16) for v in col] for col in insts]
        for insts in meta["support_pub_instances"]
    ]
    return ivc


def load_sangria_accumulator(path: str, pp_digest_hex: str) -> tuple[RelaxedPlonkTrace, int]:
    """Raises if the checkpoint's pp digest doesn't match."""
    import jax.numpy as jnp

    with open(path + ".json") as f:
        meta = json.load(f)
    if meta["pp_digest"] != pp_digest_hex:
        raise ValueError(
            f"checkpoint pp digest {meta['pp_digest']} != expected {pp_digest_hex}"
        )
    curve = CURVES[meta["curve"]]
    data = np.load(path + ".npz")
    W = [jnp.asarray(data[f"W{i}"]) for i in range(len(meta["W_commitments"]))]
    U = RelaxedPlonkInstance(
        W_commitments=[_point_from_json(curve, d) for d in meta["W_commitments"]],
        consistency_markers=[int(v, 16) for v in meta["consistency_markers"]],
        challenges=[int(v, 16) for v in meta["challenges"]],
        E_commitment=_point_from_json(curve, meta["E_commitment"]),
        u=int(meta["u"], 16),
        sc_instances_hash_acc=None if meta["sc_hash_acc"] is None else int(meta["sc_hash_acc"], 16),
    )
    return RelaxedPlonkTrace(U, RelaxedPlonkWitness(W, jnp.asarray(data["E"]))), meta["step"]
