"""Host-side conversions between Python ints and limb arrays.

Layout: little-endian, NUM_LIMBS x LIMB_BITS (16 x 16) limbs in uint32.
This layout is chosen so that a limb product fits a uint32 exactly and
column sums of 16 products fit with lazy carries (see `jfield.py`).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from .constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS


def int_to_limbs(x: int) -> np.ndarray:
    """Single int -> (NUM_LIMBS,) uint32 array."""
    assert 0 <= x < (1 << (NUM_LIMBS * LIMB_BITS))
    out = np.empty(NUM_LIMBS, dtype=np.uint32)
    for i in range(NUM_LIMBS):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs) -> int:
    """(NUM_LIMBS,) array -> int."""
    arr = np.asarray(limbs, dtype=np.uint64)
    x = 0
    for i in range(NUM_LIMBS - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[i])
    return x


def ints_to_limbs(xs: Sequence[int]) -> np.ndarray:
    """Batch: list of ints -> (n, NUM_LIMBS) uint32 (byte-packed, fast)."""
    buf = b"".join(x.to_bytes(32, "little") for x in xs)
    return (
        np.frombuffer(buf, dtype="<u2").astype(np.uint32).reshape(len(xs), NUM_LIMBS)
    )


def limbs_to_ints(arr) -> list[int]:
    """Batch: (..., NUM_LIMBS) -> flat list of ints (C-order over leading axes)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint32).reshape(-1, NUM_LIMBS))
    buf = a.astype("<u2").tobytes()
    return [
        int.from_bytes(buf[i * 32 : (i + 1) * 32], "little") for i in range(a.shape[0])
    ]
