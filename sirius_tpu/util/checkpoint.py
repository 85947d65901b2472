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
