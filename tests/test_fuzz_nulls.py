"""Differential fuzzing under NULLs: the TPC-H fixtures are nearly
NULL-free, so three-valued logic (predicate UNKNOWN, null-propagating
scalar functions, aggregate null-skipping) is the least-exercised
semantic surface. This module injects deterministic NULLs into a copy
of customer (every 7th nationkey, every 11th name) and cross-checks
random expression trees against DuckDB over the same parquet.

Dialect traps deliberately designed around (same output required):
- string concatenation uses ``||`` (SQL-standard NULL-propagating in
  both engines) — DuckDB's CONCAT() *skips* NULLs while Spark's
  returns NULL, so CONCAT is excluded here;
- every aggregate row also checks COUNT(*) - COUNT(e) so a divergence
  in WHICH rows go NULL is caught even when the non-null values agree.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.sources.catalog import load_table

_CON: dict = {}

_STR_BASE = ["c_name", "c_mktsegment", "'xy_z'"]
_INT_BASE = ["c_custkey", "c_nationkey", "3"]


@pytest.fixture(scope="module")
def nulled_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("nulled")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 != 0, F.col("c_name")).alias("c_name"),
        F.when(F.col("c_custkey") % 7 != 0, F.col("c_nationkey")).alias(
            "c_nationkey"
        ),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 != 0, F.col("c_acctbal")).alias(
            "c_acctbal"
        ),
    )
    cust.repartition(4).write.parquet(str(out / "customer.parquet"))
    cust.createOrReplaceTempView("_fzn_cust")
    return str(out)


def _oracle_row(nulled_dir, q):
    from tests.helpers import fuzz_oracle_row

    def make_con():
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{nulled_dir}/customer.parquet/*.parquet')"
        )
        return con

    return fuzz_oracle_row(_CON, make_con, q)


@st.composite
def null_string_exprs(draw, depth=0):
    if depth >= 2:
        return draw(st.sampled_from(_STR_BASE))
    kind = draw(
        st.sampled_from(
            ["base", "upper", "lower", "trim", "substr", "replace", "cat", "coalesce"]
        )
    )
    if kind == "base":
        return draw(st.sampled_from(_STR_BASE))
    inner = draw(null_string_exprs(depth=depth + 1))
    if kind == "substr":
        k = draw(st.integers(min_value=1, max_value=8))
        return f"SUBSTRING({inner}, 1, {k})"
    if kind == "replace":
        return f"REPLACE({inner}, 'a', '_')"
    if kind == "cat":
        other = draw(null_string_exprs(depth=depth + 1))
        return f"(({inner}) || ({other}))"
    if kind == "coalesce":
        return f"COALESCE({inner}, '<null>')"
    return f"{kind.upper()}({inner})"


@st.composite
def null_int_exprs(draw, depth=0):
    if depth >= 2:
        return draw(st.sampled_from(_INT_BASE))
    kind = draw(
        st.sampled_from(["base", "add", "mod", "abs", "case", "coalesce", "nullif"])
    )
    if kind == "base":
        return draw(st.sampled_from(_INT_BASE))
    a = draw(null_int_exprs(depth=depth + 1))
    if kind == "abs":
        return f"ABS({a})"
    if kind == "mod":
        m = draw(st.integers(min_value=2, max_value=13))
        return f"(({a}) % {m})"
    if kind == "coalesce":
        return f"COALESCE({a}, -1)"
    if kind == "nullif":
        n = draw(st.integers(min_value=0, max_value=6))
        return f"NULLIF({a}, {n})"
    b = draw(null_int_exprs(depth=depth + 1))
    if kind == "add":
        return f"(({a}) + ({b}))"
    return f"(CASE WHEN ({a}) > ({b}) THEN ({a}) ELSE ({b}) END)"


@st.composite
def null_predicates(draw, depth=0):
    kind = draw(
        st.sampled_from(
            ["cmp", "is_null", "is_not_null", "in", "distinct_from", "and", "or", "not"]
            if depth < 2
            else ["cmp", "is_null", "is_not_null", "in", "distinct_from"]
        )
    )
    if kind == "cmp":
        e = draw(null_int_exprs())
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
        v = draw(st.integers(min_value=0, max_value=40))
        return f"(({e}) {op} {v})"
    if kind == "is_null":
        return f"(({draw(null_int_exprs())}) IS NULL)"
    if kind == "is_not_null":
        return f"(({draw(null_string_exprs())}) IS NOT NULL)"
    if kind == "in":
        vals = draw(
            st.lists(st.integers(min_value=0, max_value=24), min_size=1, max_size=4)
        )
        return f"(({draw(null_int_exprs())}) IN ({', '.join(map(str, vals))}))"
    if kind == "distinct_from":
        a = draw(null_int_exprs())
        b = draw(null_int_exprs())
        return f"(({a}) IS DISTINCT FROM ({b}))"
    if kind == "not":
        return f"(NOT {draw(null_predicates(depth=depth + 1))})"
    a = draw(null_predicates(depth=depth + 1))
    b = draw(null_predicates(depth=depth + 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


@given(expr=null_string_exprs())
@settings(max_examples=50, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_null_string_exprs_match(expr, spark, nulled_dir):
    q = (
        "SELECT CAST(COUNT(*) - COUNT(e) AS BIGINT) AS n_null, "
        "CAST(COUNT(DISTINCT e) AS BIGINT) AS d, "
        "CAST(COALESCE(SUM(LENGTH(e)), 0) AS BIGINT) AS sl "
        f"FROM (SELECT {expr} AS e FROM {{t}})"
    )
    got = spark.sql(q.format(t="_fzn_cust")).first()
    want = _oracle_row(nulled_dir, q.format(t="customer"))
    if want is None:
        return
    for col in ["n_null", "d", "sl"]:
        assert getattr(got, col) == int(want[col]), (expr, col)


@given(expr=null_int_exprs())
@settings(max_examples=50, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_null_int_exprs_match(expr, spark, nulled_dir):
    q = (
        "SELECT CAST(COUNT(*) - COUNT(e) AS BIGINT) AS n_null, "
        "CAST(COALESCE(SUM(e), 0) AS BIGINT) AS s, "
        "CAST(COUNT(DISTINCT e) AS BIGINT) AS d "
        f"FROM (SELECT CAST({expr} AS BIGINT) AS e FROM {{t}})"
    )
    got = spark.sql(q.format(t="_fzn_cust")).first()
    want = _oracle_row(nulled_dir, q.format(t="customer"))
    if want is None:
        return
    for col in ["n_null", "s", "d"]:
        assert getattr(got, col) == int(want[col]), (expr, col)


@given(pred=null_predicates())
@settings(max_examples=60, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_null_predicates_match(pred, spark, nulled_dir):
    """Three-valued logic: UNKNOWN must exclude a row from WHERE in both
    engines; also cross-check the NOT-complement so rows lost to UNKNOWN
    (neither in pred nor NOT pred) agree."""
    q = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_true, "
        f"CAST(SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT) AS n_not, "
        f"CAST(SUM(CASE WHEN ({pred}) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk "
        "FROM {t}"
    )
    got = spark.sql(q.format(t="_fzn_cust")).first()
    want = _oracle_row(nulled_dir, q.format(t="customer"))
    if want is None:
        return
    for col in ["n", "n_true", "n_not", "n_unk"]:
        assert getattr(got, col) == int(want[col]), (pred, col)
    assert got.n_true + got.n_not + got.n_unk == got.n, pred
