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
from .pallas_madd import _F, _madd_core
from .msm import _extract_digits_signed, _roll_fill

L = NUM_LIMBS
LANE = 128
SUBL = 8  # windows per grid cell (sublane axis)


def _msm_table_kernel(f: _F, B: int, TS: int, n_steps: int,
                      digits_ref, px_ref, py_ref,
                      ox_ref, oy_ref, oz_ref,
                      tx, ty, tz):
    """One grid cell = ONE window x 1024 groups: accumulate TS point-tiles
    into the VMEM bucket table.  All dynamic indexing (the step counter) is
    on LEADING (untiled) dims — dynamic sublane slicing measurably wrecks
    Mosaic codegen (the first layout, windows on sublanes, ran 7x below the
    madd roofline because every operand load was a dynamic sublane gather)."""
    ts_idx = pl.program_id(1)

    @pl.when(ts_idx == 0)
    def _init():
        zero = jnp.zeros((L, B, SUBL, LANE), jnp.uint32)
        tx[...] = zero
        tz[...] = zero
        one = jnp.stack([jnp.full((B, SUBL, LANE), f.one_mont[l], jnp.uint32) for l in range(L)])
        ty[...] = one

    iota_b = jax.lax.broadcasted_iota(jnp.uint32, (B, SUBL, LANE), 0) + 1

    def body(t, _):
        v = digits_ref[0, t]  # (8, 128) u32: mag | neg<<31
        neg = v >> 31
        mag = v & jnp.uint32(0x7FFFFFFF)
        oh = mag[None] == iota_b  # (B, 8, 128)

        # per limb: ONE contiguous (B, 8, 128) table-row load, select-chain
        # gather in registers (exactly one bucket matches; dead digits match
        # none, fall back to row 0, and are discarded by the write mask),
        # then ONE contiguous store of the masked update.  Limb-major table
        # layout keeps every access contiguous — the strided (B-stride-L)
        # variant ran 3x slower, and Mosaic has no uint reductions so the
        # chain replaces a masked sum.
        def gather(tref):
            rows, out = [], []
            for l in range(L):
                tl = tref[l]  # (B, 8, 128)
                acc = tl[0]
                for b in range(1, B):
                    acc = jnp.where(oh[b], tl[b], acc)
                rows.append(tl)
                out.append(acc)
            return rows, out

        (rx, X), (ry, Y), (rz, Z) = gather(tx), gather(ty), gather(tz)

        qx = [px_ref[l, t] for l in range(L)]
        qy_pos = [py_ref[l, t] for l in range(L)]
        qy_neg = f.sub([jnp.zeros((SUBL, LANE), jnp.uint32)] * L, qy_pos)
        is_neg = neg > 0
        qy = [jnp.where(is_neg, a, b) for a, b in zip(qy_neg, qy_pos)]

        x3, y3, z3 = _madd_core(f, X, Y, Z, qx, qy)

        for l in range(L):
            tx[l] = jnp.where(oh, x3[l][None], rx[l])
            ty[l] = jnp.where(oh, y3[l][None], ry[l])
            tz[l] = jnp.where(oh, z3[l][None], rz[l])
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


def _lf_is_zero(a):
    nz = a[0] == 0
    for x in a[1:]:
        nz = nz & (x == 0)
    return nz


def _lf_select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _lf_identity(f: _F, shape):
    zero = jnp.zeros(shape, jnp.uint32)
    return (
        [zero] * L,
        [jnp.full(shape, f.one_mont[l], jnp.uint32) for l in range(L)],
        [zero] * L,
    )


def _lf_eq(a, b):
    e = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        e = e & (x == y)
    return e


def _lf_dbl(f: _F, X, Y, Z):
    """Jacobian doubling, a=0 (dbl-2009-l); identity-safe (z3 = 2*y*z)."""
    A = f.square(X)
    Bq = f.square(Y)
    C = f.square(Bq)
    T = f.square(f.add(X, Bq))
    D = f.double(f.sub(f.sub(T, A), C))
    E = f.add(f.double(A), A)
    Fv = f.square(E)
    x3 = f.sub(Fv, f.double(D))
    y3 = f.sub(f.mul(E, f.sub(D, x3)), f.double(f.double(f.double(C))))
    z3 = f.double(f.mul(Y, Z))
    return x3, y3, z3


def _complete_add_kernel(f: _F, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    P = ([x1[i] for i in range(L)], [y1[i] for i in range(L)], [z1[i] for i in range(L)])
    Q = ([x2[i] for i in range(L)], [y2[i] for i in range(L)], [z2[i] for i in range(L)])
    X3, Y3, Z3 = _lf_add(f, P, Q)
    for i in range(L):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


@lru_cache(maxsize=None)
def _complete_add_call(curve: Curve, S: int):
    """Pallas complete Jacobian add over (L, S, 128) limb-first arrays."""
    f = _F(curve.fb)
    blk = min(8, S)
    spec = pl.BlockSpec((L, blk, LANE), lambda s: (0, s, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, S, LANE), jnp.uint32)
    return pl.pallas_call(
        partial(_complete_add_kernel, f),
        grid=(S // blk,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
    )


def _lf_add(f: _F, P, Q):
    """Complete Jacobian addition (mirror of `Curve.add`) on limb-first
    lists; handles identities, doubling and inverse pairs by select."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    z1z1 = f.square(Z1)
    z2z2 = f.square(Z2)
    u1 = f.mul(X1, z2z2)
    u2 = f.mul(X2, z1z1)
    s1 = f.mul(f.mul(Y1, Z2), z2z2)
    s2 = f.mul(f.mul(Y2, Z1), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)
    hh = f.square(h)
    r2 = f.square(r)
    hhh = f.mul(h, hh)
    v = f.mul(u1, hh)
    x3 = f.sub(f.sub(r2, hhh), f.double(v))
    y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, hhh))
    z3 = f.mul(f.mul(Z1, Z2), h)
    general = (x3, y3, z3)

    p_inf = _lf_is_zero(Z1)
    q_inf = _lf_is_zero(Z2)
    h_zero = _lf_is_zero(h)
    r_zero = _lf_is_zero(r)
    dbl_case = h_zero & r_zero & ~p_inf & ~q_inf
    inf_case = h_zero & ~r_zero & ~p_inf & ~q_inf

    out = general
    dblP = _lf_dbl(f, X1, Y1, Z1)
    out = tuple(_lf_select(dbl_case, a, b) for a, b in zip(dblP, out))
    ident = _lf_identity(f, out[0][0].shape)
    out = tuple(_lf_select(inf_case, a, b) for a, b in zip(ident, out))
    out = tuple(_lf_select(q_inf, a, b) for a, b in zip(P, out))
    out = tuple(_lf_select(p_inf, a, b) for a, b in zip(Q, out))
    return out


@lru_cache(maxsize=None)
def _table_call(curve: Curve, B: int, W: int, g: int, TS: int, interpret: bool = False):
    f = _F(curve.fb)
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
        ],
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


def _msm_fused_vmem(curve: Curve, c: int, W_real: int, g: int, TS: int,
                    interpret: bool,
                    scalars_std: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Traced end-to-end MSM: digits -> table kernel -> merge -> Horner.

    scalars_std: (n, L) standard-form limbs; px/py: (n, L) Montgomery affine
    coordinates (z = 1 implied).  Returns standard-form (3, L) Jacobian.
    """
    n = scalars_std.shape[0]
    B = 1 << (c - 1)
    mags, negs = _extract_digits_signed(scalars_std, c)  # (W_real, n)
    packed = mags | (negs.astype(jnp.uint32) << 31)
    # (W, n) -> (W, g, 8, 128); point i = (step i//1024, sub i//128%8, lane i%128)
    digits = packed.reshape(W_real, g, SUBL, LANE)
    pxl = jnp.transpose(px, (1, 0)).reshape(L, g, SUBL, LANE)
    pyl = jnp.transpose(py, (1, 0)).reshape(L, g, SUBL, LANE)

    otx, oty, otz = _table_call(curve, B, W_real, g, TS, interpret)(digits, pxl, pyl)

    # --- group-merge tree, heavy levels (1024 -> 8 groups) in the Pallas
    # complete-add kernel over limb-first tiles.  The pure-XLA limb-first
    # variant OOM'd the compiler (~500k-op graph from unrolled CIOS muls);
    # the limb-LAST variant ran at 1/8 lane utilization (2.1 s at 2^16).
    WB = W_real * B
    assert WB % LANE == 0, "W*B must be a multiple of 128 for the merge kernel"

    def to_flat(a):  # (W, L, B, 8, 128) -> (L, 1024, WB)
        return jnp.transpose(a, (1, 3, 4, 0, 2)).reshape(L, GROUPS, WB)

    cur = tuple(to_flat(a) for a in (otx, oty, otz))
    n_grp = GROUPS
    while n_grp > 8:
        h = n_grp // 2
        S = (h * WB) // LANE
        lo = tuple(a[:, :h].reshape(L, S, LANE) for a in cur)
        hi = tuple(a[:, h:].reshape(L, S, LANE) for a in cur)
        ox, oy, oz = _complete_add_call(curve, S)(*lo, *hi)
        cur = tuple(a.reshape(L, h, WB) for a in (ox, oy, oz))
        n_grp = h

    # --- remaining tiny tail (8 -> 1 groups, suffix sums, Horner) in the
    # compact limb-last jpoint ops: (L, 8, WB) -> (8, W, B, L)
    def to_points(coords):
        return Points(*(
            jnp.transpose(a, (1, 2, 0)).reshape(8, W_real, B, L) for a in coords
        ))

    table = to_points(cur)
    while table.x.shape[0] > 1:
        h = table.x.shape[0] // 2
        lo = Points(*(tc[:h] for tc in table))
        hi = Points(*(tc[h:] for tc in table))
        table = curve.add(lo, hi)
    buckets = Points(*(tc[0] for tc in table))  # (W, B, L)

    # suffix-of-suffix = sum_v v * B_v per window
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


@lru_cache(maxsize=None)
def _msm_fused_vmem_jit(curve: Curve, c: int, W_real: int, g: int, TS: int,
                        interpret: bool = False):
    return jax.jit(partial(_msm_fused_vmem, curve, c, W_real, g, TS, interpret))


def msm_vmem(curve: Curve, scalars_std: jnp.ndarray, points: Points,
             window_bits: int = 6, step_block: int = 32, interpret: bool = False):
    """VMEM-table MSM; points must be affine Montgomery encodings (z = 1,
    distinct, non-identity — the commitment-key contract).  Returns a host
    gold.AffinePoint."""
    from ..fields import gold
    from ..fields.limb import limbs_to_ints

    c = window_bits
    n = scalars_std.shape[0]
    blk = GROUPS * step_block
    pad = (-n) % blk
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
    g = n // GROUPS
    W_real = (NUM_LIMBS * LIMB_BITS + c - 1) // c + 1  # + signed carry window

    out = _msm_fused_vmem_jit(curve, c, W_real, g, step_block, interpret)(
        scalars_std, points.x, points.y
    )
    x, y, z = limbs_to_ints(np.asarray(out))
    p = curve.fb.p
    if z % p == 0:
        return gold.identity(curve.spec)
    zi = gold.inv_mod(z % p, p)
    return gold.AffinePoint(curve.spec, x * zi * zi % p, y * zi * zi * zi % p)
