"""Pallas column-NTT kernel: the full butterfly ladder VMEM-resident.

Replaces the XLA ladder of `ops/ntt.py::_col_ntt` for the four-step
decomposition's two column passes.  Why: the XLA ladder materializes every
stage's intermediates to HBM (measured: the 2^20 four-step transform runs
at ~158 ms against a ~5 ms VPU-op-count bound — the gap is inter-stage
HBM traffic, see BENCHDATA.md roofline).  This kernel loads a block of
columns once, runs ALL log2(size) stages on it in VMEM, and writes it out
once: HBM traffic drops from ~2·stages·bytes to 2·bytes per pass.

Layout inside the kernel: blocks are (L, size, R_blk) uint32 (limb-first,
R on the 128-wide lanes).  Every stage uses the MERGED view
(L, nb, 2, m*R_blk) so the minor axis is always >= R_blk lanes wide even
for m < 8 (the 5D (.., m, R) view would put m on the sublane axis and
starve it for early stages).  Twiddles are statically sliced from the full
(L, size/2) table and broadcast-expanded in-VMEM per stage.

Field ops are `fields.jfield_lf.FieldLF` methods — pure jnp with the limb
axis leading, which Mosaic compiles as VPU ops over (sublane, lane) tiles.

Reference parity: same butterfly schedule as `ops/ntt.py::_col_ntt`
(reference `src/fft.rs:83-155`); the four-step mid-twiddle (outside this
kernel) carries coset/scale factors, so the kernel needs no last-stage
special casing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import NUM_LIMBS
from ..fields.jfield_lf import MASK, FieldLF

L = NUM_LIMBS


class _KernelFieldLF(FieldLF):
    """FieldLF variant whose carry ops avoid `.at[0].add` (lowered as
    scatter-add, which Mosaic's TC kernel type does not implement) —
    the +1 injections use leading-axis concatenation instead.  Bit-exact
    same semantics; only used inside Pallas kernels."""

    def _cond_sub_p(self, r):
        import jax.numpy as jnp

        t = r + self._bcast_const(self._notp_col, r.ndim)
        t = jnp.concatenate([(t[0] + 1)[None], t[1:]], axis=0)
        d, co = self._ripple(t)
        return jnp.where(co > 0, d, r)

    def sub(self, a, b):
        import jax.numpy as jnp

        a, b = self._align(a, b)
        t = a + (b ^ MASK)
        t = jnp.concatenate([(t[0] + 1)[None], t[1:]], axis=0)
        d, co = self._ripple(t)
        d2, _ = self._ripple(d + self._bcast_const(self._p_col, d.ndim))
        return jnp.where(co > 0, d, d2)


def _ladder_body(lf, a, table, size: int, Rb: int):
    """All butterfly stages on one resident block a: (L, size, Rb)."""
    m = 1
    while m < size:
        nb = size // (2 * m)
        v = a.reshape(L, nb, 2, m * Rb)
        lo, hi = v[:, :, 0], v[:, :, 1]
        if m == 1 and size > 2:
            t = hi  # omega^0 == 1
        else:
            w = table[:, ::nb][:, :m]  # (L, m)
            wexp = jnp.broadcast_to(w[:, :, None], (L, m, Rb)).reshape(L, m * Rb)
            t = lf.mul(hi, wexp[:, None])
        a = jnp.stack([lf.add(lo, t), lf.sub(lo, t)], axis=2).reshape(L, size, Rb)
        m *= 2
    return a


def col_ntt_pallas(lf, a: jnp.ndarray, rev: np.ndarray, table,
                   r_blk: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """NTT along axis 1 of a: (L, size, R); bit-reversal applied here.

    table: (L, size/2) twiddle table (forward or inverse).  One pallas
    program per R-block; all log2(size) stages VMEM-resident.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os

    if r_blk is None:
        r_blk = int(os.environ.get("SIRIUS_TPU_NTT_RBLK", "128"))
    size, R = a.shape[1], a.shape[2]
    a = a[:, jnp.asarray(rev), :]
    if R % r_blk:
        r_blk = R  # fallback: single block
    grid = (R // r_blk,)

    import copy

    def kernel(a_ref, w_ref, p_ref, notp_ref, out_ref):
        # pallas forbids captured array constants: rebind the field's
        # modulus columns to kernel inputs; _KernelFieldLF avoids the
        # scatter-add carry injections Mosaic cannot lower
        lf2 = copy.copy(lf)
        lf2.__class__ = _KernelFieldLF
        lf2._p_col = p_ref[:].reshape(L)
        lf2._notp_col = notp_ref[:].reshape(L)
        out_ref[:] = _ladder_body(lf2, a_ref[:], w_ref[:], size, r_blk)

    table = jnp.asarray(table)
    half = max(size // 2, 1)
    p_col = jnp.asarray(np.asarray(lf._p_col).reshape(L, 1))
    notp_col = jnp.asarray(np.asarray(lf._notp_col).reshape(L, 1))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, size, R), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, size, r_blk), lambda r: (0, 0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, half), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, size, r_blk), lambda r: (0, 0, r), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, table, p_col, notp_col)
