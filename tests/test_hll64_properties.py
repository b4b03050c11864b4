"""Property-based tests (hypothesis) for the clean-room HLL64 sketch —
the algebraic laws that make it safe as a distributed aggregate: Spark's
partial/final aggregation and streaming state merging are only correct if
the sketch is a commutative, associative, idempotent monoid whose estimate
is insertion-order- and partitioning-invariant (the property the reference
asserts with two goldens, tests/HLL/test_examples.py:88-98 — here it is
asserted for arbitrary inputs and partitionings)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from hyperloglog_pyspark_spark.functions import hll64

P = 8

values = st.lists(st.one_of(st.integers(-1000, 1000), st.text(max_size=8)), max_size=200)


def sketch(vals, p=P):
    regs = hll64.empty_registers(p)
    hll64.update_registers(regs, [str(v) for v in vals], p)
    return regs


@given(values, values)
@settings(max_examples=50, deadline=None)
def test_merge_commutative(xs, ys):
    ab = hll64.merge_registers(sketch(xs), sketch(ys))
    ba = hll64.merge_registers(sketch(ys), sketch(xs))
    assert np.array_equal(ab, ba)


@given(values, values, values)
@settings(max_examples=50, deadline=None)
def test_merge_associative(xs, ys, zs):
    left = hll64.merge_registers(hll64.merge_registers(sketch(xs), sketch(ys)), sketch(zs))
    right = hll64.merge_registers(sketch(xs), hll64.merge_registers(sketch(ys), sketch(zs)))
    assert np.array_equal(left, right)


@given(values)
@settings(max_examples=50, deadline=None)
def test_merge_idempotent_and_identity(xs):
    s = sketch(xs)
    assert np.array_equal(hll64.merge_registers(s, s), s)
    assert np.array_equal(hll64.merge_registers(s, hll64.empty_registers(P)), s)


@given(values, st.integers(1, 7))
@settings(max_examples=50, deadline=None)
def test_partitioning_invariance(xs, n_parts):
    """Merging per-partition sketches == one global sketch, for ANY split —
    the law that makes map-side partial aggregation correct."""
    whole = sketch(xs)
    merged = hll64.empty_registers(P)
    for i in range(n_parts):
        merged = hll64.merge_registers(merged, sketch(xs[i::n_parts]))
    assert np.array_equal(merged, whole)


@given(values)
@settings(max_examples=50, deadline=None)
def test_duplicates_do_not_change_state(xs):
    assert np.array_equal(sketch(xs + xs), sketch(xs))


@given(values)
@settings(max_examples=30, deadline=None)
def test_estimate_accuracy_envelope(xs):
    """|error| within 3·1.04/√m relative PLUS a 3-register absolute
    allowance (str-canonicalized equality, the reference's semantics),
    and exact-zero estimate for the empty sketch.

    The absolute term is load-bearing: linear counting corrects for the
    EXPECTED number of register-index collisions, so a per-instance bound
    must tolerate the actual ones — with 2 distinct values hypothesis can
    (and did) find a pair landing in one register (probability ~1/m),
    where the estimate is ~1.002 and no purely relative envelope holds.
    At scale the additive 3 is negligible next to the 3σ term."""
    distinct = len({str(v) for v in xs})
    est = hll64.estimate(sketch(xs))
    if distinct == 0:
        assert est == 0.0
    else:
        m = 1 << P
        slack = (3 * 1.04 / (m**0.5) + 0.02) * distinct + 3.0
        assert abs(est - distinct) <= slack


@given(values)
@settings(max_examples=30, deadline=None)
def test_serialize_roundtrip(xs):
    s = sketch(xs)
    assert np.array_equal(hll64.deserialize(hll64.serialize(s)), s)
