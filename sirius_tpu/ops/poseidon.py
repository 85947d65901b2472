"""Poseidon sponge: constant generation (Grain LFSR), host transcript hash,
and a batched device permutation.

Replaces the reference's PSE `poseidon` crate + `src/poseidon/poseidon_hash.rs`
(SURVEY.md §2.1).  Semantics mirrored bit-for-bit:

- Grain LFSR parameter derivation (80-bit state, Poseidon-paper taps, 160
  discarded bits, self-shrinking output), round constants with rejection
  sampling, Cauchy MDS from non-rejection samples — the same construction the
  PSE crate uses, so hash outputs match the reference transcript.
- Sponge semantics of `poseidon_hash.rs:182-237`: buffered absorb; per-RATE
  chunk permutation with the +1 padding folded into the chunk after the last
  input; an extra empty permutation when len(buf) is an exact RATE multiple;
  squeeze = state[1] truncated to `num_bits` little-endian; state (but NOT the
  buffer) resets after output.
- Initial state: [2^64, 0, ..., 0] (PSE `State::default()` capacity tag).

Design departure (documented): we run the *unoptimized* Poseidon round
sequence (ARC -> sbox -> full MDS for every round).  The PSE crate's
sparse-matrix "optimized" schedule is algebraically identical in output; we
prefer the plain schedule because on TPU the full-MDS partial round is a
single small matmul and the simpler structure is what the on-circuit chip
verifies.  Hash outputs are unaffected (verified against the reference's
inline golden vector in tests/test_poseidon.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import FieldSpec
from ..fields.jfield import Field, field_for

STATE_BITS = 80


class Grain:
    """Grain LFSR from the Poseidon reference spec (also used by PSE poseidon
    and halo2_gadgets).  Host-side, setup-time only."""

    def __init__(self, field: FieldSpec, t: int, r_f: int, r_p: int):
        bits = [1] * STATE_BITS

        def set_bits(offset: int, length: int, value: int):
            # parameters are placed MSB-first
            for i in range(length):
                bits[offset + length - 1 - i] = (value >> i) & 1

        FIELD_TAG_PRIME = 1
        SBOX_TAG_POW = 0
        set_bits(0, 2, FIELD_TAG_PRIME)
        set_bits(2, 4, SBOX_TAG_POW)
        set_bits(6, 12, field.num_bits)
        set_bits(18, 12, t)
        set_bits(30, 10, r_f)
        set_bits(40, 10, r_p)

        self.state = bits
        self.field = field
        # discard the first 160 update bits
        for _ in range(160):
            self._update()

    def _update(self) -> int:
        s = self.state
        nb = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [nb]
        return nb

    def next_bit(self) -> int:
        """Self-shrinking output: evaluate update bits in pairs; when the
        first is 1 emit the second, otherwise discard both."""
        while True:
            a = self._update()
            b = self._update()
            if a:
                return b

    def _next_bits_value(self) -> int:
        """Draw field.num_bits bits, first bit = MSB, as an integer."""
        v = 0
        for _ in range(self.field.num_bits):
            v = (v << 1) | self.next_bit()
        return v

    def next_field_element(self) -> int:
        """Rejection sampling (round constants)."""
        while True:
            v = self._next_bits_value()
            if v < self.field.modulus:
                return v

    def next_field_element_without_rejection(self) -> int:
        """No rejection: reduce mod p (MDS x/y samples)."""
        return self._next_bits_value() % self.field.modulus


@dataclass(frozen=True)
class PoseidonSpec:
    """Round constants + MDS for a (field, T, RATE, r_f, r_p) instance."""

    field: FieldSpec
    t: int
    rate: int
    r_f: int
    r_p: int
    round_constants: tuple  # (r_f + r_p) tuples of t ints
    mds: tuple  # t tuples of t ints

    @property
    def initial_state(self) -> list[int]:
        # PSE poseidon State::default(): capacity element 2^64, rest zero
        return [1 << 64] + [0] * (self.t - 1)


@lru_cache(maxsize=None)
def poseidon_spec(field: FieldSpec, t: int, rate: int, r_f: int, r_p: int) -> PoseidonSpec:
    assert rate == t - 1
    grain = Grain(field, t, r_f, r_p)
    p = field.modulus
    rc = tuple(
        tuple(grain.next_field_element() for _ in range(t)) for _ in range(r_f + r_p)
    )
    xs = [grain.next_field_element_without_rejection() for _ in range(t)]
    ys = [grain.next_field_element_without_rejection() for _ in range(t)]
    mds = tuple(
        tuple(pow((x + y) % p, -1, p) for y in ys) for x in xs
    )
    return PoseidonSpec(field, t, rate, r_f, r_p, rc, mds)


# ---------------------------------------------------------------------------
# Host permutation + sponge (python ints; transcript sequencing path)
# ---------------------------------------------------------------------------


def permute(spec: PoseidonSpec, state: list[int], inputs: Sequence[int]) -> list[int]:
    """One absorbing permutation: add inputs (+1 padding marker right after
    the last input when it fits) then run the full round schedule.

    Mirrors the reference's `pre_round` absorption folding
    (`poseidon_hash.rs:206-237`) in its unoptimized-equivalent form.
    """
    p = spec.field.modulus
    t, r_f, r_p = spec.t, spec.r_f, spec.r_p
    assert len(inputs) <= spec.rate
    s = list(state)
    for i, v in enumerate(inputs):
        s[1 + i] = (s[1 + i] + v) % p
    if len(inputs) < spec.rate:
        s[1 + len(inputs)] = (s[1 + len(inputs)] + 1) % p

    half = r_f // 2
    for r in range(r_f + r_p):
        rc = spec.round_constants[r]
        s = [(x + c) % p for x, c in zip(s, rc)]
        if half <= r < half + r_p:
            s[0] = pow(s[0], 5, p)
        else:
            s = [pow(x, 5, p) for x in s]
        s = [sum(m * x for m, x in zip(row, s)) % p for row in spec.mds]
    return s


class PoseidonHash:
    """Host transcript random oracle (`ROTrait` analogue).

    Reference: `src/poseidon/poseidon_hash.rs:155-237` and
    `src/poseidon/random_oracle.rs:22-79`.  Note the reference's buffer is
    *not* cleared by `output` — squeezing re-hashes the whole absorbed prefix
    and further absorbs extend it; we reproduce that.
    """

    def __init__(self, spec: PoseidonSpec):
        self.spec = spec
        self.buf: list[int] = []

    def absorb_field(self, v: int) -> "PoseidonHash":
        self.buf.append(v % self.spec.field.modulus)
        return self

    def absorb_iter(self, vs) -> "PoseidonHash":
        for v in vs:
            self.absorb_field(int(v))
        return self

    def absorb_point(self, pt) -> "PoseidonHash":
        """Absorb an affine point's coordinates cast into this field
        (identity absorbs (0, 0)); reference `poseidon_hash.rs:128-141`."""
        p = self.spec.field.modulus
        if pt.is_identity:
            self.buf += [0, 0]
        else:
            self.buf += [pt.x % p, pt.y % p]
        return self

    def squeeze(self, num_bits: int) -> int:
        """Output `num_bits` little-endian bits of state[1] as an integer.

        The result is < 2^num_bits, suitable for lifting into any field of
        >= num_bits bits (the reference squeezes into a *different* field D).
        """
        spec = self.spec
        rate = spec.rate
        buf = list(self.buf)
        exact = len(buf) % rate == 0

        state = spec.initial_state
        for i in range(0, len(buf), rate):
            state = permute(spec, state, buf[i : i + rate])
        if exact:
            state = permute(spec, state, [])

        return state[1] & ((1 << num_bits) - 1)


# ---------------------------------------------------------------------------
# Device batched permutation (for hot hash chains / batched transcript work)
# ---------------------------------------------------------------------------


class DevicePoseidon:
    """Vectorized Poseidon permutation over a batch: state uint32[batch, T, L].

    MDS mixing is expressed as per-element field muls with constant matrix
    entries (broadcast), which XLA fuses; a future Pallas/MXU path can swap in
    the fixed-operand matmul formulation without changing callers.
    """

    def __init__(self, spec: PoseidonSpec):
        self.spec = spec
        self.f: Field = field_for(spec.field)
        t = spec.t
        self.rc = np.asarray(
            self.f.encode([c for row in spec.round_constants for c in row])
        ).reshape(len(spec.round_constants), t, -1)
        self.mds = np.asarray(self.f.encode([c for row in spec.mds for c in row])).reshape(
            t, t, -1
        )
        self.permute = jax.jit(self.permute)

    def initial_state(self, batch: int) -> jnp.ndarray:
        init = self.f.encode(self.spec.initial_state)  # (T, L)
        return jnp.broadcast_to(init, (batch,) + init.shape)

    def permute(self, state: jnp.ndarray, inputs: jnp.ndarray | None = None, pad: bool = True):
        """state: (batch, T, L); inputs: (batch, k, L) with k <= RATE or None."""
        f, spec = self.f, self.spec
        t, r_f, r_p = spec.t, spec.r_f, spec.r_p
        if inputs is not None and inputs.shape[1] > 0:
            k = inputs.shape[1]
            absorbed = f.add(state[:, 1 : 1 + k], inputs)
            state = jnp.concatenate([state[:, :1], absorbed, state[:, 1 + k :]], axis=1)
        else:
            k = 0
        if pad and k < spec.rate:
            one = f.ones((state.shape[0], 1))
            padded = f.add(state[:, 1 + k : 2 + k], one)
            state = jnp.concatenate([state[:, : 1 + k], padded, state[:, 2 + k :]], axis=1)

        half = r_f // 2
        rc = jnp.asarray(self.rc)
        mds = jnp.asarray(self.mds)

        def mix(state):
            # state' = mds @ state over the field: (t, t) x (batch, t)
            prod = f.mul(mds[None], state[:, None, :, :])  # (batch, t, t, L)
            return f.sum_reduce(prod, axis=2)

        def full_round(r, state):
            state = f.add(state, rc[r][None])
            state = f.mul(f.square(f.square(state)), state)
            return mix(state)

        def partial_round(r, state):
            state = f.add(state, rc[r][None])
            s0 = state[:, 0]
            s0 = f.mul(f.square(f.square(s0)), s0)
            state = jnp.concatenate([s0[:, None], state[:, 1:]], axis=1)
            return mix(state)

        state = jax.lax.fori_loop(0, half, full_round, state)
        state = jax.lax.fori_loop(half, half + r_p, partial_round, state)
        state = jax.lax.fori_loop(half + r_p, r_f + r_p, full_round, state)
        return state
