"""Golden-parity tests for the clean-room HLL64 sketch.

The reference's goldens are deterministic (fixed sha1 hash, SURVEY.md §5);
inside the linear-counting regime — which covers every golden the
reference asserts — our estimates must be bit-for-bit equal to the
documented values (BASELINE.md)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.functions import hll64
from hyperloglog_pyspark_spark.functions.hll64_spark import estimate_distinct, hll64_estimate_col, hll64_sketch
from hyperloglog_pyspark_spark.sources.catalog import load_table


def _estimate(values, k):
    p = hll64.p_from_k(k)
    regs = hll64.empty_registers(p)
    hll64.update_registers(regs, values, p)
    return hll64.estimate(regs)


class TestGoldens:
    def test_three_distinct_k_2_17(self):
        # BASELINE.md: 3.0000343327992325 (HLL64, k=2^17, LC regime)
        assert _estimate(["abc", "def", "ghi"], 2**17) == pytest.approx(3.0000343327992325, abs=1e-12)

    def test_three_distinct_k_250(self):
        # BASELINE.md: 3.017716672522796 (k=250 → p=8, m=256)
        assert _estimate(["abc", "def", "ghi"], 250) == pytest.approx(3.017716672522796, abs=1e-12)

    def test_duplicates_do_not_change_estimate(self):
        assert _estimate(["abc", "def", "ghi"] * 50, 250) == _estimate(["abc", "def", "ghi"], 250)

    def test_str_canonicalization(self):
        # HyperLogLog.py:110 semantics: str() before hashing — 11 and "11"
        # collide; 11 and 11.0 do not.
        assert _estimate([11, "11"], 2**17) == _estimate([11], 2**17)
        assert _estimate([11, 11.0], 2**17) == pytest.approx(2.0, abs=0.01)

    def test_lc_formula(self):
        # With no register collisions, LC = m·ln(m/(m−n)) exactly.
        m = 2**17
        assert _estimate(list("abcdefghij"), m) == pytest.approx(m * math.log(m / (m - 10)), abs=1e-9)


class TestMergeSemantics:
    def _regs(self, values, p=12):
        r = hll64.empty_registers(p)
        hll64.update_registers(r, values, p)
        return r

    def test_merge_commutative_associative(self):
        a, b, c = self._regs(["x", "y"]), self._regs(["y", "z"]), self._regs(["w"])
        ab = hll64.merge_registers(a, b)
        ba = hll64.merge_registers(b, a)
        assert (ab == ba).all()
        abc1 = hll64.merge_registers(hll64.merge_registers(a, b), c)
        abc2 = hll64.merge_registers(a, hll64.merge_registers(b, c))
        assert (abc1 == abc2).all()

    def test_merge_equals_union(self):
        a, b = self._regs(["x", "y", "z"]), self._regs(["z", "w"])
        u = self._regs(["x", "y", "z", "w"])
        assert (hll64.merge_registers(a, b) == u).all()

    def test_p_compat_fix(self):
        # k=250 and k=256 share p=8 and MUST merge (the reference's raw-k
        # equality check is a documented latent bug, SURVEY.md §4).
        a = self._regs(["x"], hll64.p_from_k(250))
        b = self._regs(["y"], hll64.p_from_k(256))
        assert hll64.merge_registers(a, b).size == 256

    def test_incompatible_p_raises(self):
        with pytest.raises(ValueError, match="incompatible"):
            hll64.merge_registers(self._regs(["x"], 8), self._regs(["x"], 12))

    def test_k_range_validation(self):
        for bad in (2, 15, 2**18 + 1):
            with pytest.raises(ValueError):
                hll64.p_from_k(bad)


class TestSparkIntegration:
    def test_global_estimate_matches_local(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        dist = estimate_distinct(ev, "user_id", 2**12).collect()[0]["estimate"]
        local_vals = [r["user_id"] for r in ev.select("user_id").collect()]
        assert dist == pytest.approx(_estimate(local_vals, 2**12), abs=1e-9)

    def test_grouped_sketch_tolerance(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        est = hll64_estimate_col(hll64_sketch(ev, ["event_type"], "user_id", 2**12))
        exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n"))
        rows = exact.join(est, "event_type").collect()
        assert rows
        for r in rows:
            assert abs(r["estimate"] - r["n"]) / r["n"] <= 3 * 1.04 / 64.0


class TestReferenceDataGoldens:
    """Bit-for-bit parity with the reference's own integration goldens on
    its own test fixtures (tests/HLL/data.txt, data2.txt — read-only):
    the strongest capability-parity evidence available."""

    K = 2**12

    def _load(self, name):
        import json

        with open(f"/root/reference/tests/HLL/{name}") as f:
            return json.load(f)

    def test_data_txt_golden(self):
        # reference golden 645.2579301443818 (test_examples.py:86-87)
        data = self._load("data.txt")
        assert _estimate([str(x) for x in data], self.K) == pytest.approx(
            645.2579301443818, abs=1e-12
        )

    def test_data2_txt_distributed_golden(self):
        # reference golden 2875.28999 over 15 partition-sequences merged
        # via __add__ (test_examples.py:100-102); per-sequence sketches
        # merged == global sketch (partitioning invariance).
        seqs = self._load("data2.txt")
        p = hll64.p_from_k(self.K)
        merged = hll64.empty_registers(p)
        for seq in seqs:
            r = hll64.empty_registers(p)
            hll64.update_registers(r, [str(x) for x in seq], p)
            merged = hll64.merge_registers(merged, r)
        assert hll64.estimate(merged) == pytest.approx(2875.28999, abs=1e-5)

    def test_data2_txt_spark_aggregate_matches_golden(self, spark):
        # The Spark two-phase aggregate path must land on the same value as
        # the reference's mapPartitions+reduce pipeline.
        seqs = self._load("data2.txt")
        flat = [(str(x),) for seq in seqs for x in seq]
        df = spark.createDataFrame(flat, "v string").repartition(15)
        est = estimate_distinct(df, "v", self.K).first().estimate
        assert est == pytest.approx(2875.28999, abs=1e-5)

    def test_data_txt_relative_error_golden(self):
        # reference golden: relative error −1.1376 % vs 638 true distinct
        # (test_examples.py:109-110, the calculate_empirical_accuracy path)
        data = self._load("data.txt")
        est = _estimate([str(x) for x in data], self.K)
        exact = len({str(x) for x in data})
        assert exact == 638
        assert (exact - est) / exact * 100 == pytest.approx(-1.1376, abs=1e-3)


class TestBiasCorrection:
    """HLL++ bias-correction stage (Heule et al. appendix tables) and the
    32-bit variant — the two reference-parity gaps closed in round 2."""

    def test_bias_interpolates_published_tables(self):
        # At an interior curve point the 6-NN window surrounds it, so the
        # interpolated bias must sit within the local bias neighborhood.
        from hyperloglog_pyspark_spark.functions.hllpp_bias_tables import (
            bias_data,
            raw_estimate_data,
        )

        for p in range(4, 19):
            curve, biases = raw_estimate_data(p), bias_data(p)
            i = len(curve) // 2
            got = hll64.estimate_bias(curve[i], p)
            window = biases[i - 6 : i + 6]
            assert min(window) - 1e-9 <= got <= max(window) + 1e-9

    def test_bias_nonzero_below_curve_start(self):
        # Reference divergence pin: below the curve's start the reference's
        # negative-start slice returns bias 0 (HyperLogLog.py:224); the
        # correct clamped window interpolates the head of the table.
        from hyperloglog_pyspark_spark.functions.hllpp_bias_tables import bias_data

        got = hll64.estimate_bias(1.0, 4)
        head = bias_data(4)[:6]
        assert got == pytest.approx(sum(head) / 6, abs=1e-12)
        assert got > 0

    def test_midrange_bias_corrected_accuracy(self):
        # n between the LC threshold and 5m: the regime the bias stage
        # exists for. p=14: sigma = 1.04/128 ~ 0.8%; assert 3 sigma-ish.
        p, n = 14, 40000
        regs = hll64.empty_registers(p)
        hll64.update_registers(regs, [f"mid{i}" for i in range(n)], p)
        est = hll64.estimate(regs)
        m = 1 << p
        harm = sum(2.0 ** -int(r) for r in regs)
        raw = hll64.alpha(m) * m * m / harm
        assert 5 * m >= raw > hll64.threshold(p), "fixture must hit the bias regime"
        assert abs(est - n) / n < 0.03
        assert abs(est - n) <= abs(raw - n), "bias correction should not hurt"


class TestHLL32:
    def test_golden_lc(self):
        # reference golden (tests/HLL/test_HyperLogLog.py:169): k=250,
        # data ['abc','def','ghi'] -> 3.017716672522796.
        regs = hll64.empty_registers(hll64.p_from_k(250, hash_bits=32))
        hll64.update_registers(regs, ["abc", "def", "ghi"], 8, hash_bits=32)
        assert hll64.estimate32(regs) == pytest.approx(3.017716672522796, abs=1e-12)

    def test_duplicates_invariant(self):
        a = hll64.empty_registers(8)
        hll64.update_registers(a, ["abc", "def", "ghi"] * 40, 8, hash_bits=32)
        b = hll64.empty_registers(8)
        hll64.update_registers(b, ["abc", "def", "ghi"], 8, hash_bits=32)
        assert hll64.estimate32(a) == hll64.estimate32(b)

    def test_high_range_correction_formula(self):
        # Saturated registers push E past 2^32/30; the corrected estimate
        # must follow -2^32 ln(1 - E/2^32) (the reference's branch raises
        # NameError on a bare `log`, HyperLogLog.py:153 — fixed here).
        import numpy as np

        regs = np.full(16, 28, dtype=np.uint8)
        m = 16
        harm = m * 2.0**-28
        e = hll64.alpha(m) * m * m / harm
        assert e > 2**32 / 30.0
        want = -(2**32) * math.log(1 - e / 2**32)
        assert hll64.estimate32(regs) == pytest.approx(want, rel=1e-12)

    def test_k_range_32(self):
        with pytest.raises(ValueError):
            hll64.p_from_k(2**17, hash_bits=32)
        assert hll64.p_from_k(2**16, hash_bits=32) == 16
