"""Witness tape: op semantics, Python/C++ replay parity, gadget equivalence."""

import random

import numpy as np
import pytest

from sirius_tpu.frontend.tape import (
    TapeBuilder,
    Tr,
    bit,
    inv0,
    is_zero,
)

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _run(tape, inputs, trs):
    slots = [t.s if isinstance(t, Tr) else None for t in trs]
    # ints that were constant-folded at trace time pass through unchanged
    out_slots = [s for s in slots if s is not None]
    vals = tape.replay_values(inputs, out_slots)
    it = iter(vals)
    return [next(it) if s is not None else t for s, t in zip(slots, trs)]


def _run_py(tape, inputs, trs):
    out_slots = np.asarray([t.s for t in trs], dtype=np.uint32)
    raw = tape._replay_py(inputs, out_slots)
    return [int.from_bytes(bytes(raw[i]), "little") for i in range(len(trs))]


def test_basic_ops_match_python_ints():
    rng = random.Random(1)
    xs = [rng.randrange(P) for _ in range(4)]
    tape = TapeBuilder()
    a, b, c, d = tape.inputs(4)

    outs = []
    want = []
    outs.append((a + b) % P); want.append((xs[0] + xs[1]) % P)
    outs.append((a * b + c * d) % P); want.append((xs[0] * xs[1] + xs[2] * xs[3]) % P)
    outs.append((a - b) % P); want.append((xs[0] - xs[1]) % P)
    outs.append(pow(a, 5, P)); want.append(pow(xs[0], 5, P))
    outs.append(a % Q); want.append(xs[0] % Q)
    outs.append((a * b) // Q); want.append((xs[0] * xs[1]) // Q)
    outs.append((a >> 17) & 0xFFFF); want.append((xs[0] >> 17) & 0xFFFF)
    outs.append(bit(b, 200)); want.append((xs[1] >> 200) & 1)
    outs.append(inv0(c, P)); want.append(pow(xs[2], -1, P))
    outs.append(is_zero(d)); want.append(0)
    # negative intermediate -> floor shift (reduced for the byte interface)
    outs.append((((a - b) - (1 << 80)) >> 30) % P)
    want.append((((xs[0] - xs[1]) - (1 << 80)) >> 30) % P)
    outs.append(divmod(a * b + c, Q)[0]); want.append(divmod(xs[0] * xs[1] + xs[2], Q)[0])
    # constant folding with ints mixed in
    outs.append((3 * a + 7) % P); want.append((3 * xs[0] + 7) % P)

    got_py = _run_py(tape, xs, outs)
    assert got_py == want

    from sirius_tpu import native

    if native._load_tape() is not None:
        got_cpp = _run(tape, xs, outs)
        assert got_cpp == want
    else:
        pytest.skip(f"native tape unavailable: {native._tape_error}")


def test_inv0_and_iszero_edge_cases():
    tape = TapeBuilder()
    a, b = tape.inputs(2)
    outs = [inv0(a, P), is_zero(a), inv0(b, P), is_zero(b)]
    vals = _run_py(tape, [0, 5], outs)
    assert vals == [0, 1, pow(5, -1, P), 0]
    from sirius_tpu import native

    if native._load_tape() is not None:
        out_slots = np.asarray([t.s for t in outs], dtype=np.uint32)
        raw = tape.replay([0, 5], out_slots)
        got = [int.from_bytes(bytes(raw[i]), "little") for i in range(4)]
        assert got == [0, 1, pow(5, -1, P), 0]


def test_mod_skip_when_bounded():
    """A second % by the same modulus is elided by range analysis."""
    tape = TapeBuilder()
    (a,) = tape.inputs(1)
    r = (a * a) % P
    n_ops = len(tape.code)
    r2 = r % P
    assert r2 is r and len(tape.code) == n_ops


def test_control_flow_leak_raises():
    tape = TapeBuilder()
    (a,) = tape.inputs(1)
    with pytest.raises(TypeError):
        bool(a)
    with pytest.raises(TypeError):
        [1, 2][a]


def test_fuzz_cpp_vs_python():
    from sirius_tpu import native

    if native._load_tape() is None:
        pytest.skip(f"native tape unavailable: {native._tape_error}")
    rng = random.Random(7)
    tape = TapeBuilder()
    ins = tape.inputs(6)
    vals = [rng.randrange(P) for _ in range(6)]
    exprs = list(ins)
    py_vals = list(vals)
    for i in range(300):
        op = rng.randrange(8)
        j, k = rng.randrange(len(exprs)), rng.randrange(len(exprs))
        x, xv = exprs[j], py_vals[j]
        y, yv = exprs[k], py_vals[k]
        if op == 0:
            e, v = (x + y) % P, (xv + yv) % P
        elif op == 1:
            e, v = (x - y) % P, (xv - yv) % P
        elif op == 2:
            e, v = (x * y) % Q, (xv * yv) % Q
        elif op == 3:
            e, v = pow(x, 5, P), pow(xv, 5, P)
        elif op == 4:
            e, v = inv0(x, Q), (pow(xv % Q, -1, Q) if xv % Q else 0)
        elif op == 5:
            sh = rng.randrange(1, 200)
            e, v = (x >> sh), (xv >> sh)
        elif op == 6:
            m = rng.randrange(1, 1 << 64)
            e, v = x & m, xv & m
        else:
            e, v = divmod(x * y, P)[0], divmod(xv * yv, P)[0]
        exprs.append(e)
        py_vals.append(v)
    # keep only canonical (< 2^256, >= 0) outputs for the byte interface
    keep = [(e, v) for e, v in zip(exprs, py_vals) if isinstance(e, Tr) and 0 <= v < (1 << 256)]
    out_slots = np.asarray([e.s for e, _ in keep], dtype=np.uint32)
    raw = tape.replay(vals, out_slots)
    got = [int.from_bytes(bytes(raw[i]), "little") for i in range(len(keep))]
    assert got == [v for _, v in keep]
