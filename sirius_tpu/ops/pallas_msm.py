"""Fully-fused Pallas MSM: bucket accumulation with the table in VMEM.

Replaces the XLA one-hot bucket kernel of `msm.py` for large inputs.  The
round-1 fused path kept the bucket table as a jit loop-carry in HBM: every
accumulation step streamed the whole (W, G, B) table through HBM twice,
capping the measured rate at ~15M EC-adds/s vs the ~55M/s the Pallas mixed
adder sustains on resident data (reference workload `src/commitment.rs:81-90`,
Pippenger via halo2 `best_multiexp`).

Design (one kernel, one grid):

  lanes   = ONE window x 1024 groups per grid cell -> (8, 128) u32 tiles
  scratch = Jacobian bucket table (B, L, 8, 128) x3 resident in VMEM
  grid    = (W windows, n/(1024*TS) step-blocks); step axis innermost,
            table re-initialised at step 0, flushed to HBM at the last step
  digits  = signed c-bit windows (B = 2^(c-1) buckets; negative digits add
            the negated point), packed mag | neg<<31, laid out
            (W, g, 8, 128) so the per-step load is one full aligned tile
            indexed only on leading dims (dynamic SUBLANE slicing is a
            Mosaic slow path that cost 7x in the first layout)
  points  = affine Montgomery x/y streamed (L, TS, 8, 128), shared by all
            window cells; per-step one-hot select over the bucket axis +
            one fused incomplete mixed add (`pallas_madd._madd_core`)

The group-merge tree (128 -> 1 per window), the v*B_v suffix sums and the
Horner window combine run as ordinary XLA on the (W, B)-point table the
kernel emits — together with digit extraction they are traced into the SAME
jit so the MSM is one device program with a single (3, L) transfer out.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.jpoint import Curve, Points
from ..fields.constants import LIMB_BITS, NUM_LIMBS
from .msm import _extract_digits_signed, _roll_fill

L = NUM_LIMBS
LANE = 128
SUBL = 8  # windows per grid cell (sublane axis)


def _msm_table_kernel(f, B: int, TS: int, n_steps: int,
                      digits_ref, px_ref, py_ref,
                      sx_ref, sy_ref, sz_ref,
                      ox_ref, oy_ref, oz_ref,
                      tx, ty, tz):
    """One grid cell = ONE window x 1024 groups: accumulate TS point-tiles
    into the VMEM bucket table.  All dynamic indexing (the step counter) is
    on LEADING (untiled) dims — dynamic sublane slicing measurably wrecks
    Mosaic codegen (the first layout, windows on sublanes, ran 7x below the
    madd roofline because every operand load was a dynamic sublane gather).
    Array-limb form (ops/limb_kernels.py): values are (L, ...) arrays.

    The table is SEEDED from sx/sy/sz — the previous chunk's table (or zeros
    for the first chunk: z == 0 rows are identities for `k_madd_incomplete`
    and every downstream add, y never consulted).  Threading the raw table
    through HBM between fixed-size chunks lets one Mosaic compile serve all
    commitment sizes while the expensive 1024->1 group merge runs only once
    per MSM instead of once per chunk (the per-chunk merge cost 34% of a
    2^20 MSM)."""
    from .limb_kernels import k_madd_incomplete

    ts_idx = pl.program_id(1)

    @pl.when(ts_idx == 0)
    def _init():
        tx[...] = sx_ref[0]
        ty[...] = sy_ref[0]
        tz[...] = sz_ref[0]

    iota_b = jax.lax.broadcasted_iota(jnp.uint32, (B, SUBL, LANE), 0) + 1

    def body(t, _):
        v = digits_ref[0, t]  # (8, 128) u32: mag | neg<<31
        neg = v >> 31
        mag = v & jnp.uint32(0x7FFFFFFF)
        oh = mag[None] == iota_b  # (B, 8, 128)

        # contiguous (L, B, 8, 128) table loads; select-chain gather over the
        # bucket axis in registers (exactly one bucket matches; dead digits
        # match none, fall back to row 0, discarded by the write mask).
        # Limb-major layout keeps every access contiguous, and Mosaic has no
        # uint reductions so the chain replaces a masked sum.
        def gather(tref):
            rows = tref[:]  # (L, B, 8, 128)
            acc = rows[:, 0]
            for b in range(1, B):
                acc = jnp.where(oh[b][None], rows[:, b], acc)
            return rows, acc

        (rx, X), (ry, Y), (rz, Z) = gather(tx), gather(ty), gather(tz)

        qx = px_ref[:, t]  # (L, 8, 128)
        qy_pos = py_ref[:, t]
        qy_neg = f.sub(jnp.zeros_like(qy_pos), qy_pos)
        qy = jnp.where((neg > 0)[None], qy_neg, qy_pos)

        x3, y3, z3 = k_madd_incomplete(f, X, Y, Z, qx, qy)

        tx[:] = jnp.where(oh[None], x3[:, None], rx)
        ty[:] = jnp.where(oh[None], y3[:, None], ry)
        tz[:] = jnp.where(oh[None], z3[:, None], rz)
        return 0

    jax.lax.fori_loop(0, TS, body, 0)

    @pl.when(ts_idx == n_steps - 1)
    def _flush():
        ox_ref[0] = tx[...]
        oy_ref[0] = ty[...]
        oz_ref[0] = tz[...]


GROUPS = SUBL * LANE  # 1024 parallel accumulation lanes per window


# ---------------------------------------------------------------------------
# Limb-FIRST curve ops on lists of arrays (plain XLA, outside Pallas).
#
# The jnp-level Points/Curve ops put limbs on the LAST axis; XLA maps the
# last axis to the 128-wide lane dimension, so (..., 16)-shaped field ops
# run at 1/8 lane utilization.  The bucket-table kernel's output is already
# limb-major — doing the whole merge/suffix/Horner tail limb-first measured
# 2.11 s -> tens of ms at 2^16 (it was 95% of the MSM wall-clock).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _table_call(curve: Curve, B: int, W: int, g: int, TS: int, interpret: bool = False):
    from .limb_kernels import KF

    f = KF(curve.fb)
    n_steps = g // TS
    grid = (W, n_steps)
    kern = partial(_msm_table_kernel, f, B, TS, n_steps)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TS, SUBL, LANE), lambda w, ts: (w, ts, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TS, SUBL, LANE), lambda w, ts: (0, ts, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TS, SUBL, LANE), lambda w, ts: (0, ts, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(
                (1, L, B, SUBL, LANE), lambda w, ts: (w, 0, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 3,
        out_specs=[
            pl.BlockSpec((1, L, B, SUBL, LANE), lambda w, ts: (w, 0, 0, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((W, L, B, SUBL, LANE), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, B, SUBL, LANE), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # table scratch + double-buffered point tiles exceed the 16M
            # default scoped limit; v5e has 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _merge_kernel(f, x_ref, y_ref, z_ref, ox, oy, oz):
    """Full 1024 -> 1 group-merge in VMEM.  Big levels (1024 -> 32) unrolled
    with proper halving (~97% of the adds, shapes must shrink); the 32 -> 1
    tail is ONE traced add in a fixed-shape fori_loop with sublane rolls
    (upper rows become garbage that row 0 never reads) — 5 tiny levels for
    the trace cost of one."""
    from .limb_kernels import k_add_complete

    cur = (x_ref[:], y_ref[:], z_ref[:])  # (L, 1024, 128) each
    n_grp = GROUPS
    TAIL = 32
    while n_grp > TAIL:
        h = n_grp // 2
        lo = tuple(a[:, :h] for a in cur)
        hi = tuple(a[:, h:n_grp] for a in cur)
        cur = tuple(k_add_complete(f, lo, hi))
        n_grp = h

    def tail_body(i, carry):
        shift = jnp.int32(TAIL) >> (i + 1)
        rolled = tuple(
            pltpu.roll(a, -shift, axis=1) if hasattr(pltpu, "roll")
            else jnp.roll(a, -shift, axis=1)
            for a in carry
        )
        return tuple(k_add_complete(f, carry, rolled))

    cur = jax.lax.fori_loop(0, TAIL.bit_length() - 1, tail_body, cur)
    ox[:] = cur[0][:, :1]
    oy[:] = cur[1][:, :1]
    oz[:] = cur[2][:, :1]


@lru_cache(maxsize=None)
def _merge_call(curve: Curve, WB: int, interpret: bool = False):
    """One-kernel group merge: (L, 1024, WB) x3 -> (L, 1, WB) x3, grid over
    128-lane blocks (25 MB of operand VMEM per cell)."""
    from .limb_kernels import KF

    f = KF(curve.fb)
    in_spec = pl.BlockSpec((L, GROUPS, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, 1, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_merge_kernel, f),
        grid=(WB // LANE,),
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, 1, WB), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _window_count(c: int) -> int:
    return (NUM_LIMBS * LIMB_BITS + c - 1) // c + 1  # + signed carry window


@lru_cache(maxsize=None)
def _chunk_accum_jit(curve: Curve, c: int, n_chunk: int, TS: int,
                     interpret: bool = False):
    """ONE compiled program per (curve, window, chunk) shape: digits ->
    seeded VMEM table kernel -> raw (W, L, B, 8, 128) x3 bucket tables.

    Every MSM size reuses this fixed chunk shape (zero-padding for the tail
    chunk), so the expensive Mosaic compile happens once per process instead
    of once per commitment size — a cold k=17 fold step used to recompile
    the fused kernel for each of {primary W, support W, bench} sizes at
    ~15 min apiece through the remote-compile tunnel.  The raw table threads
    through HBM as the next chunk's seed (~0.3 ms at HBM bandwidth)."""
    W_real = _window_count(c)
    B = 1 << (c - 1)
    g = n_chunk // GROUPS

    def run(scalars_std, px, py, sx, sy, sz):
        mags, negs = _extract_digits_signed(scalars_std, c)  # (W_real, n)
        packed = mags | (negs.astype(jnp.uint32) << 31)
        digits = packed.reshape(W_real, g, SUBL, LANE)
        pxl = jnp.transpose(px, (1, 0)).reshape(L, g, SUBL, LANE)
        pyl = jnp.transpose(py, (1, 0)).reshape(L, g, SUBL, LANE)
        return _table_call(curve, B, W_real, g, TS, interpret)(
            digits, pxl, pyl, sx, sy, sz
        )

    # interpret mode (CPU tests): jitting the Pallas emulation is a
    # minutes-long XLA compile; run it eagerly instead
    return run if interpret else jax.jit(run)


@lru_cache(maxsize=None)
def _finish_jit(curve: Curve, c: int, interpret: bool = False):
    """Table finish, run ONCE per MSM: Pallas 1024->1 group merge, then the
    suffix-of-suffix (sum_v v*B_v) + Horner window combine; returns
    standard-form (3, L) Jacobian.

    The group merge runs with the bucket axis padded up to a 128-lane
    multiple (WB = W*B = 1376 -> 1408 for c=6): the unpadded width used to
    fall back to 10 UNROLLED XLA halving levels of complete adds — both the
    dominant compile cost and an HBM-bound tail."""
    W_real = _window_count(c)
    B = 1 << (c - 1)
    WB = W_real * B
    WBp = ((WB + LANE - 1) // LANE) * LANE

    def run(otx, oty, otz):
        def to_flat(a):  # (W, L, B, 8, 128) -> (L, 1024, WBp)
            flat = jnp.transpose(a, (1, 3, 4, 0, 2)).reshape(L, GROUPS, WB)
            if WBp != WB:
                # zero-pad: z = 0 columns are identities for the complete
                # adds inside the merge (y is never read for identities)
                flat = jnp.pad(flat, ((0, 0), (0, 0), (0, WBp - WB)))
            return flat

        mx, my, mz = _merge_call(curve, WBp, interpret)(
            to_flat(otx), to_flat(oty), to_flat(otz)
        )

        def to_pts(a):  # (L, 1, WBp) -> (W, B, L)
            return jnp.transpose(a[:, 0, :WB], (1, 0)).reshape(W_real, B, L)

        buckets = Points(to_pts(mx), to_pts(my), to_pts(mz))
        bsteps = max((B - 1).bit_length(), 1)
        identWB = curve.identity((W_real, B))

        def suf_body(j, Pc):
            shift = jnp.int32(1) << j
            Pnext = _roll_fill(Pc, identWB, shift, axis=1, forward=False)
            return curve.add(Pc, Pnext)

        suffix = jax.lax.fori_loop(0, bsteps, suf_body, buckets)
        total_scan = jax.lax.fori_loop(0, bsteps, suf_body, suffix)
        totals = Points(total_scan.x[:, 0], total_scan.y[:, 0], total_scan.z[:, 0])

        def at(i):
            return Points(*(jax.lax.dynamic_index_in_dim(tc, i, keepdims=False) for tc in totals))

        def horner(i, acc):
            w = W_real - 2 - i
            for _ in range(c):
                acc = curve.dbl(acc)
            return curve.add(acc, at(w))

        acc = jax.lax.fori_loop(0, W_real - 1, horner, at(W_real - 1))
        fm = curve.fb.from_mont
        return jnp.stack([fm(acc.x), fm(acc.y), fm(acc.z)])

    return run if interpret else jax.jit(run)


DEFAULT_CHUNK_LOG = 17


def msm_vmem(curve: Curve, scalars_std: jnp.ndarray, points: Points,
             window_bits: int = 6, step_block: int = 32, interpret: bool = False,
             chunk: int | None = None):
    """VMEM-table MSM; points must be affine Montgomery encodings (z = 1,
    distinct, non-identity — the commitment-key contract).  Returns a host
    gold.AffinePoint.

    Inputs are processed in fixed-size chunks (SIRIUS_TPU_MSM_CHUNK_LOG,
    default 2^17) so every commitment size shares the same compiled
    programs; the raw bucket table threads through HBM as each chunk's seed
    and ONE finish program does the group merge + suffix sums + Horner."""
    import os

    from ..fields import gold
    from ..fields.limb import limbs_to_ints

    c = window_bits
    n = scalars_std.shape[0]
    if chunk is None:
        chunk = 1 << int(os.environ.get("SIRIUS_TPU_MSM_CHUNK_LOG", str(DEFAULT_CHUNK_LOG)))
    blk = GROUPS * step_block
    chunk = max(blk, chunk)
    # ONE chunk shape per curve, period: the Mosaic table-kernel compile is
    # keyed by its (W, n_steps) grid, so even a 2^15 "small" variant would
    # recompile the expensive kernel.  Padding a 2^14 commit to a full 2^17
    # chunk costs tens of ms of VPU time vs minutes of remote compile.
    size = chunk
    pad = (-n) % size
    if pad:
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((pad, scalars_std.shape[1]), scalars_std.dtype)]
        )
        # pad points with copies of the first point: their digits are all
        # dead (zero scalars) so they are never accumulated
        points = Points(*(
            jnp.concatenate([pc, jnp.broadcast_to(pc[:1], (pad,) + pc.shape[1:])])
            for pc in points
        ))
        n += pad

    W_real = _window_count(c)
    B = 1 << (c - 1)
    tbl = [jnp.zeros((W_real, L, B, SUBL, LANE), jnp.uint32)] * 3
    step = _chunk_accum_jit(curve, c, size, step_block, interpret)
    for i in range(0, n, size):
        sl = slice(i, i + size)
        tbl = step(scalars_std[sl], points.x[sl], points.y[sl], *tbl)

    out = _finish_jit(curve, c, interpret)(*tbl)
    x, y, z = limbs_to_ints(np.asarray(out))
    p = curve.fb.p
    if z % p == 0:
        return gold.identity(curve.spec)
    zi = gold.inv_mod(z % p, p)
    return gold.AffinePoint(curve.spec, x * zi * zi % p, y * zi * zi * zi % p)
