"""API-level drop-in parity: the reference's public three-function
surface (HLL/examples.py) re-exposed by hyperloglog_pyspark_spark.api
must reproduce the reference's OWN integration goldens
(tests/HLL/test_examples.py:86-110) on its own fixtures, called with the
reference's calling conventions."""

from __future__ import annotations

import json

import pytest

from hyperloglog_pyspark_spark.api import (
    calculate_empirical_accuracy,
    estimate_distinct_elements,
    estimate_distinct_elements_parallel,
)

K = 2**12


def _load(name):
    with open(f"/root/reference/tests/HLL/{name}") as f:
        return json.load(f)


def test_local_estimate_golden():
    # reference golden 645.2579301443818 (test_examples.py:86-87)
    items = _load("data.txt")
    assert estimate_distinct_elements(items, K) == pytest.approx(
        645.2579301443818, abs=1e-12
    )


def test_parallel_estimate_golden(spark):
    # reference golden 2875.28999 over the 15-sequence fixture
    # (test_examples.py:100-102)
    seqs = _load("data2.txt")
    est = estimate_distinct_elements_parallel(seqs, K, spark)
    assert round(est - 2875.28999, 5) == 0


def test_empirical_accuracy_goldens(spark):
    # reference goldens: abs err −7.257930144381817, rel err
    # −0.011376066057024792 on data.txt (test_examples.py:104-110)
    items = _load("data.txt")
    card = estimate_distinct_elements(items, K)
    abs_err = calculate_empirical_accuracy(items, card, spark, relative=False)
    rel_err = calculate_empirical_accuracy(items, card, spark, relative=True)
    assert round(abs_err - (-7.257930144381817), 5) == 0
    assert round(rel_err - (-0.011376066057024792), 5) == 0


def test_empirical_accuracy_counts_raw_items(spark):
    # The reference oracle distincts RAW items (HLL/examples.py:83), a
    # different equality than the estimators' str()-before-sha1: to the
    # oracle [11, "11"] has 2 distinct values and [11, 11.0] has 1.
    assert calculate_empirical_accuracy([11, "11"], 2.0, spark, relative=False) == 0.0
    assert calculate_empirical_accuracy([11, 11.0], 1.0, spark, relative=False) == 0.0


def test_parallel_accepts_session_or_context(spark):
    # the reference passed a SparkContext; both handles must work
    seqs = _load("data2.txt")[:3]
    via_session = estimate_distinct_elements_parallel(seqs, K, spark)
    via_context = estimate_distinct_elements_parallel(
        seqs, K, spark.sparkContext
    )
    assert via_session == via_context


def test_hash_func_kwarg_local():
    # The reference constructor takes a pluggable hash
    # (HyperLogLog.py:58, hash_func=hashlib.sha1); the drop-in surface
    # forwards it. md5 must (a) run, (b) agree with a hand-rolled
    # reference-semantics md5 sketch, (c) differ from the sha1 estimate
    # on the same items (different hash -> different registers).
    import hashlib
    import math

    from hyperloglog_pyspark_spark.functions import hll64

    items = list(range(500))
    est_md5 = estimate_distinct_elements(items, K, hash_func=hashlib.md5)
    est_sha1 = estimate_distinct_elements(items, K)
    assert est_md5 != est_sha1

    # reference semantics by hand: first 16 hex chars of md5(str(x)),
    # key = low p bits, rank over the remaining bits
    p = hll64.p_from_k(K)
    m = 1 << p
    regs = [0] * m
    for x in items:
        h = int(hashlib.md5(str(x).encode()).hexdigest()[:16], 16)
        key = h & (m - 1)
        rest = h >> p
        regs[key] = max(regs[key], 64 - p - rest.bit_length() + 1)
    zeros = regs.count(0)
    lc = m * math.log(m / zeros)
    assert est_md5 == pytest.approx(lc, abs=1e-9)


def test_hash_func_kwarg_parallel(spark):
    # local and distributed sketches are the same monoid: with md5
    # threaded through the Arrow aggregate, the parallel estimate of a
    # flattened corpus equals the local estimate of the same elements.
    import hashlib

    items = [f"u{i}" for i in range(300)]
    seqs = [items[:150], items[100:]]
    est_par = estimate_distinct_elements_parallel(
        seqs, K, spark, hash_func=hashlib.md5
    )
    est_loc = estimate_distinct_elements(items, K, hash_func=hashlib.md5)
    assert est_par == pytest.approx(est_loc, abs=1e-9)
