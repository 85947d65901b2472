"""Multi-scalar multiplication kernels (device).

TPU-native replacement for halo2curves `best_multiexp` (reference
`src/commitment.rs:81-90`; SURVEY.md §2.8 item 2).  Instead of the CPU
Pippenger's sequential bucket pushes, a fully data-parallel formulation:

  per c-bit window (lax.scan over windows — one compiled body):
    digits        = c-bit slice of the scalar limbs
    sort          = argsort(digits) -> contiguous bucket segments
    segment sums  = segmented inclusive scan (Hillis-Steele via fori_loop:
                    log n iterations of one vectorized complete-EC-add body)
    bucket table  = searchsorted gather of each segment's last element
    window total  = sum_v v * B_v via suffix-scan + total-scan
  combine windows by Horner (fori_loop, c doublings + 1 add per window).

Scan bodies compile once; the whole MSM is a single XLA program.  Rows shard
over the mesh axis for multi-chip (see parallel/).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jpoint import Curve, Points
from ..fields.constants import LIMB_BITS, NUM_LIMBS

WINDOW_BITS = LIMB_BITS  # default window = one 16-bit storage limb


def _shifted(P: Points, ident: Points, shift) -> Points:
    """P[i - shift] with identity fill for i < shift (shift may be traced)."""
    n = P.x.shape[0]
    idx = jnp.arange(n)
    rolled = Points(
        jnp.roll(P.x, shift, axis=0),
        jnp.roll(P.y, shift, axis=0),
        jnp.roll(P.z, shift, axis=0),
    )
    keep = (idx >= shift)[:, None]
    return Points(
        jnp.where(keep, rolled.x, ident.x),
        jnp.where(keep, rolled.y, ident.y),
        jnp.where(keep, rolled.z, ident.z),
    )


def _segmented_scan_add(curve: Curve, P: Points, seg: jnp.ndarray) -> Points:
    """Inclusive segmented scan of EC adds over sorted segment ids.

    Hillis-Steele: log2(n) rounds of one vectorized complete add; the body
    compiles once (shift is a traced value)."""
    n = P.x.shape[0]
    ident = curve.identity((n,))
    steps = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n)

    def body(j, carry):
        P = carry
        shift = jnp.int32(1) << j
        Pprev = _shifted(P, ident, shift)
        seg_prev = jnp.roll(seg, shift, axis=0)
        same = (idx >= shift) & (seg_prev == seg)
        combined = curve.add(P, Pprev)
        return curve.select(same, combined, P)

    return jax.lax.fori_loop(0, steps, body, P)


def _suffix_scan_add(curve: Curve, P: Points) -> Points:
    """S[i] = sum_{j >= i} P[j] (inclusive suffix sums)."""
    n = P.x.shape[0]
    ident = curve.identity((n,))
    steps = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n)

    def body(j, carry):
        P = carry
        shift = jnp.int32(1) << j
        # P[i + shift] with identity fill for i >= n - shift
        rolled = Points(
            jnp.roll(P.x, -shift, axis=0),
            jnp.roll(P.y, -shift, axis=0),
            jnp.roll(P.z, -shift, axis=0),
        )
        keep = (idx < n - shift)[:, None]
        Pnext = Points(
            jnp.where(keep, rolled.x, ident.x),
            jnp.where(keep, rolled.y, ident.y),
            jnp.where(keep, rolled.z, ident.z),
        )
        return curve.add(P, Pnext)

    return jax.lax.fori_loop(0, steps, body, P)


def msm(curve: Curve, scalars_std: jnp.ndarray, points: Points, window_bits: int = WINDOW_BITS,
        strategy: str = "scan") -> Points:
    """MSM over fixed-width windows.

    scalars_std: uint32 (n, 16) limbs in *standard* (non-Montgomery) form.
    points: Jacobian batch (n,).  Returns a single Jacobian point (shape ()).

    strategy:
      "scan"  — full-width Hillis-Steele segmented scan (n*log n adds, but
                compile-friendly; the default).
      "merge" — work-efficient shrinking bucket merge (~n adds); currently
                triggers a pathological XLA compile blowup inside lax.scan
                (minutes even for tiny inputs) — kept for the planned
                Pallas-based rework, do not use as default yet.
    """
    n = scalars_std.shape[0]
    c = window_bits
    assert LIMB_BITS % c == 0
    num_windows = (NUM_LIMBS * LIMB_BITS) // c
    cmask = np.uint32((1 << c) - 1)

    # (num_windows, n) digit matrix
    digits = jnp.stack(
        [
            (scalars_std[:, (w * c) // LIMB_BITS] >> ((w * c) % LIMB_BITS)) & cmask
            for w in range(num_windows)
        ]
    )

    SENT = np.uint32(0xFFFFFFFF)
    num_buckets = (1 << c) - 1

    def window_body(_, d_raw):
        # zero digits are dead from the start (bucket 0 contributes nothing)
        d0 = jnp.where(d_raw == 0, SENT, d_raw)
        order = jnp.argsort(d0)
        d = d0[order]
        P = Points(points.x[order], points.y[order], points.z[order])
        P = curve.select(d == SENT, curve.identity((n,)), P)

        # --- work-efficient bucket reduction: repeatedly merge adjacent
        # same-bucket pairs, compact dead slots by re-sorting, shrink the
        # static size.  live <= m/2 + num_buckets + 1 per round, so total
        # EC-add work is ~n + B*log(n) (classic Pippenger's n insertions),
        # not the n*log(n) of a full-width scan.
        m = n
        while m > 2 * num_buckets + 4:
            if m % 2:
                d = jnp.concatenate([d, jnp.full((1,), SENT, jnp.uint32)])
                ident1 = curve.identity((1,))
                P = Points(*(jnp.concatenate([a, b]) for a, b in zip(P, ident1)))
                m += 1
            da, db = d[0::2], d[1::2]
            Pa = Points(P.x[0::2], P.y[0::2], P.z[0::2])
            Pb = Points(P.x[1::2], P.y[1::2], P.z[1::2])
            same = (da == db) & (da != SENT)
            merged = curve.select(same, curve.add(Pa, Pb), Pa)
            leftb_d = jnp.where(same, SENT, db)
            leftb_P = curve.select(same, curve.identity((m // 2,)), Pb)
            new_d = jnp.concatenate([da, leftb_d])
            new_P = Points(*(jnp.concatenate([a, b]) for a, b in zip(merged, leftb_P)))
            new_size = min(m, m // 2 + num_buckets + 2)
            order2 = jnp.argsort(new_d)[:new_size]
            d = new_d[order2]
            P = Points(new_P.x[order2], new_P.y[order2], new_P.z[order2])
            m = new_size

        # --- finish the (now small) residue with the segmented scan
        scanned = _segmented_scan_add(curve, P, d)
        vs = jnp.arange(1, 1 << c, dtype=jnp.uint32)
        idx = jnp.clip(jnp.searchsorted(d, vs, side="right") - 1, 0, m - 1)
        seg_last = Points(scanned.x[idx], scanned.y[idx], scanned.z[idx])
        present = d[idx] == vs
        buckets = curve.select(present, seg_last, curve.identity(vs.shape))
        # sum_v v*B_v: suffix sums S_j then sum_j S_j (= element 0 of a
        # second suffix scan)
        suffix = _suffix_scan_add(curve, buckets)
        total_scan = _suffix_scan_add(curve, suffix)
        total = Points(total_scan.x[0], total_scan.y[0], total_scan.z[0])
        return None, total

    _, totals = jax.lax.scan(window_body, None, digits)

    # Horner from the most significant window down
    acc = Points(totals.x[-1], totals.y[-1], totals.z[-1])

    def horner_body(i, acc):
        w = num_windows - 2 - i
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.dbl(a), acc)
        return curve.add(acc, Points(totals.x[w], totals.y[w], totals.z[w]))

    if num_windows > 1:
        acc = jax.lax.fori_loop(0, num_windows - 1, horner_body, acc)
    return acc


@lru_cache(maxsize=None)
def _msm_jit(curve: Curve, window_bits: int, strategy: str):
    return jax.jit(partial(msm, curve, window_bits=window_bits, strategy=strategy))


def msm_jitted(curve: Curve, scalars_std, points, window_bits: int = WINDOW_BITS,
               strategy: str = "scan") -> Points:
    return _msm_jit(curve, window_bits, strategy)(scalars_std, points)


def msm_naive(curve: Curve, scalars_std: jnp.ndarray, points: Points) -> Points:
    """Binary double-and-add reference kernel (for tests / tiny inputs)."""
    nbits = 16 * NUM_LIMBS

    def body(i, acc):
        b = nbits - 1 - i
        acc = curve.dbl(acc)
        bit = (scalars_std[:, b // LIMB_BITS] >> (b % LIMB_BITS)) & 1
        masked = curve.select(bit > 0, points, curve.identity(points.shape))
        return curve.add(acc, curve.sum_reduce(masked, axis=0))

    return jax.lax.fori_loop(0, nbits, body, curve.identity(()))
