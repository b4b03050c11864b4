"""Differential fuzzing: hypothesis-generated filter/aggregate queries run
on Spark AND DuckDB over the same parquet — any count/sum divergence is an
engine-semantics bug. This generalizes the fixed oracle suite: instead of
76 hand-written queries, arbitrary predicate trees over lineitem.

Kept to semantics both engines define identically: integer/decimal
comparisons, BETWEEN, IN, AND/OR/NOT, string prefix matching, date
cutoffs. (Float equality and LIKE wildcards are deliberately excluded —
cross-engine edge semantics differ.)"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hyperloglog_pyspark_spark.sources.catalog import load_table
from tests.helpers import duck_con

# DuckDB 1.0.0 hits "Attempted to dereference unique_ptr that is NULL" on some
# generated predicates (e.g. an OR of two identical BETWEEN conjunctions) and
# an InternalException invalidates the whole connection.  The fuzz tests use
# their own lazily-rebuilt connection (never the shared `duck` fixture, which
# the rest of the suite depends on) and treat oracle-side internal errors as
# a vacuous pass after confirming Spark itself still answers the query —
# the rebuild machinery is shared (tests/helpers.py::fuzz_oracle_row).
_FUZZ_CON: dict = {}


def _oracle_row(sf_dir, q):
    from tests.helpers import fuzz_oracle_row

    return fuzz_oracle_row(_FUZZ_CON, lambda: duck_con(sf_dir), q)

# (spark_sql_expr, duckdb_expr) pairs — same string when dialects agree.
_NUM_COLS = ["l_orderkey", "l_linenumber", "l_quantity"]
_FLAGS = ["A", "N", "R"]
_STATUS = ["F", "O"]


@st.composite
def predicates(draw, depth=0):
    kind = draw(
        st.sampled_from(
            ["num_cmp", "between", "in_flag", "status_eq", "date_lt", "and", "or", "not"]
            if depth < 2
            else ["num_cmp", "between", "in_flag", "status_eq", "date_lt"]
        )
    )
    if kind == "num_cmp":
        col = draw(st.sampled_from(_NUM_COLS))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
        val = draw(st.integers(0, 60))
        return f"({col} {op} {val})"
    if kind == "between":
        col = draw(st.sampled_from(_NUM_COLS))
        lo = draw(st.integers(0, 40))
        hi = lo + draw(st.integers(0, 20))
        return f"({col} BETWEEN {lo} AND {hi})"
    if kind == "in_flag":
        vals = draw(st.lists(st.sampled_from(_FLAGS), min_size=1, max_size=3, unique=True))
        lit = ", ".join(f"'{v}'" for v in vals)
        return f"(l_returnflag IN ({lit}))"
    if kind == "status_eq":
        return f"(l_linestatus = '{draw(st.sampled_from(_STATUS))}')"
    if kind == "date_lt":
        y = draw(st.integers(1995, 2001))
        op = draw(st.sampled_from(["<", ">="]))
        return f"(l_shipdate {op} DATE '{y}-07-01')"
    if kind == "not":
        return f"(NOT {draw(predicates(depth=depth + 1))})"
    a = draw(predicates(depth=depth + 1))
    b = draw(predicates(depth=depth + 1))
    return f"({a} {'AND' if kind == 'and' else 'OR'} {b})"


@pytest.fixture(scope="module")
def lineitem_view(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_fuzz_li")
    return "_fuzz_li"


@given(pred=predicates())
@settings(max_examples=50, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_predicate_counts_match(pred, spark, sf_dir, lineitem_view):
    q = (
        "SELECT COUNT(*) AS n, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s, "
        "CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d "
        "FROM {t} WHERE " + pred
    )
    got = spark.sql(q.format(t=lineitem_view)).first()
    want = _oracle_row(sf_dir, q.format(t="lineitem"))
    if want is None:  # oracle bug, engine already answered — vacuous pass
        return
    assert got.n == int(want.n), pred
    assert got.d == int(want.d), pred
    if got.n:
        assert got.s == pytest.approx(float(want.s), abs=1e-6), pred


@st.composite
def join_specs(draw):
    """Random orders⋈customer joins with random predicates and join type."""
    how = draw(st.sampled_from(["INNER", "LEFT", "SEMI", "ANTI"]))
    seg = draw(st.lists(st.sampled_from(
        ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]),
        min_size=1, max_size=3, unique=True))
    status = draw(st.sampled_from(["F", "O", "P"]))
    seg_lit = ", ".join(f"'{s}'" for s in seg)
    return how, f"c_mktsegment IN ({seg_lit})", f"o_orderstatus = '{status}'"


@pytest.fixture(scope="module")
def join_views(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_fz_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_fz_cust")


@given(spec=join_specs())
@settings(max_examples=30, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_join_counts_match(spec, spark, sf_dir, join_views):
    how, cpred, opred = spec
    q = (
        "SELECT COUNT(*) AS n FROM (SELECT * FROM {o} WHERE " + opred + ") o "
        f"{how} JOIN " + "(SELECT * FROM {c} WHERE " + cpred + ") c ON o.o_custkey = c.c_custkey"
    )
    got = spark.sql(q.format(o="_fz_orders", c="_fz_cust")).first().n
    want = _oracle_row(sf_dir, q.format(o="orders", c="customer"))
    if want is None:  # oracle bug, engine already answered — vacuous pass
        return
    assert got == int(want.n), (how, cpred, opred)


# ROWS frames are only cross-engine deterministic under a TOTAL order. The
# synthetic lineitem duplicates (l_orderkey, l_linenumber) (~12k groups at
# sf0.01), so the fuzz order adds every input the window reads: remaining
# ties then have identical quantity AND identical checksum weight (same
# l_orderkey), making every frame aggregate tie-invariant.
_WIN_ORDER = "l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_suppkey, l_partkey"


@st.composite
def window_specs(draw):
    """Random ROWS-frame window aggregates over a tie-invariant total order
    — semantics both engines define identically. l_quantity is
    integer-valued, so every windowed sum/checksum is exact in doubles
    (no order-dependent rounding)."""
    fn = draw(st.sampled_from(["SUM", "COUNT", "MIN", "MAX"]))
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey % 10"]))
    lo = draw(st.sampled_from(["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(["CURRENT ROW", "1 FOLLOWING", "4 FOLLOWING"]))
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        lo = "1 PRECEDING"
    return (
        f"{fn}(l_quantity) OVER (PARTITION BY {part} "
        f"ORDER BY {_WIN_ORDER} ROWS BETWEEN {lo} AND {hi})"
    )


@given(wexpr=window_specs())
@settings(max_examples=30, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_window_frames_match(wexpr, spark, sf_dir, lineitem_view):
    """Checksum the full windowed column (weighted by a row key) so any
    per-row frame-boundary divergence shows up, without shipping 60k rows
    across the comparison."""
    q = (
        "SELECT CAST(SUM(w * (l_orderkey % 97)) AS BIGINT) AS chk, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM ("
        f"SELECT l_orderkey, {wexpr} AS w FROM {{t}})"
    )
    got = spark.sql(q.format(t=lineitem_view)).first()
    want = _oracle_row(sf_dir, q.format(t="lineitem"))
    if want is None:  # oracle bug, engine already answered — vacuous pass
        return
    assert got.n == int(want.n), wexpr
    assert got.chk == int(want.chk), wexpr


@st.composite
def groupby_specs(draw):
    """Random grouped aggregate + HAVING threshold — the partial/final
    aggregation path under arbitrary group keys and post-filters."""
    key = draw(st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey % 7", "l_partkey % 13"]))
    having = draw(st.integers(min_value=0, max_value=5000))
    return key, having


@given(spec=groupby_specs())
@settings(max_examples=30, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_grouped_aggregates_match(spec, spark, sf_dir, lineitem_view):
    key, having = spec
    q = (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, "
        "CAST(SUM(grp_n) AS BIGINT) AS total_rows, "
        "CAST(SUM(grp_q) AS BIGINT) AS total_qty FROM ("
        f"SELECT {key} AS k, COUNT(*) AS grp_n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS BIGINT) AS grp_q "
        "FROM {t} GROUP BY k "
        f"HAVING COUNT(*) > {having})"
    )
    got = spark.sql(q.format(t=lineitem_view)).first()
    want = _oracle_row(sf_dir, q.format(t="lineitem"))
    if want is None:  # oracle bug, engine already answered — vacuous pass
        return
    for col in ["n_groups", "total_rows", "total_qty"]:
        g, w = getattr(got, col), want[col]
        assert (g is None and (w is None or w != w)) or g == int(w), (spec, col, g, w)


# --- composed plans: filter -> join -> group -> having -> window -> top-k --

_C_KEYS = ["l_suppkey % 11", "l_partkey % 13", "(l_suppkey + l_partkey) % 7"]
_C_AGGS = [
    "CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS BIGINT)",
    "CAST(COUNT(*) AS BIGINT)",
    "CAST(MIN(l_quantity) AS BIGINT)",
    "CAST(MAX(l_quantity) AS BIGINT)",
    "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)",
]


@st.composite
def composed_specs(draw):
    """A full random plan: predicate tree -> optional orders join ->
    grouped aggregate -> HAVING -> ranking window over the group rows ->
    optional top-k cut. One spec exercises scan+filter+join+agg+window+
    limit in a single cross-checked query — the composition coverage the
    fixed per-operator fuzz tests don't reach."""
    pred = draw(predicates())
    join = draw(st.sampled_from([None, "INNER", "LEFT"]))
    status = draw(st.sampled_from(["F", "O", "P"]))
    keys = list(_C_KEYS) + (["COALESCE(o_custkey % 17, -1)"] if join else [])
    key = draw(st.sampled_from(keys))
    agg = draw(st.sampled_from(_C_AGGS))
    having = draw(st.integers(min_value=0, max_value=200))
    topk = draw(st.sampled_from([3, 10, 50, None]))
    return pred, join, status, key, agg, having, topk


def _composed_sql(spec, li, orders):
    pred, join, status, key, agg, having, topk = spec
    join_sql = (
        f" {join} JOIN {orders} ON l_orderkey = o_orderkey"
        f" AND o_orderstatus = '{status}'"
        if join
        else ""
    )
    inner = (
        f"SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS grp_n, {agg} AS m "
        f"FROM {li}{join_sql} WHERE {pred} GROUP BY 1 "
        f"HAVING COUNT(*) > {having}"
    )
    # k is distinct per group, so (m DESC, k) is a TOTAL order — the rank
    # column and any top-k cut are cross-engine deterministic.
    ranked = (
        f"SELECT k, grp_n, m, ROW_NUMBER() OVER (ORDER BY m DESC, k) AS rn "
        f"FROM ({inner})"
    )
    cut = f"SELECT * FROM ({ranked}) WHERE rn <= {topk}" if topk else ranked
    return (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(rn * (k + 1) + m + grp_n), 0) AS BIGINT) AS chk "
        f"FROM ({cut})"
    )


@pytest.fixture(scope="module")
def composed_views(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_fzc_li")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_fzc_ord")


@given(spec=composed_specs())
@settings(max_examples=100, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_composed_plans_match(spec, spark, sf_dir, composed_views):
    q_spark = _composed_sql(spec, "_fzc_li", "_fzc_ord")
    q_duck = _composed_sql(spec, "lineitem", "orders")
    got = spark.sql(q_spark).first()
    want = _oracle_row(sf_dir, q_duck)
    if want is None:  # oracle bug, engine already answered — vacuous pass
        return
    assert got.n == int(want.n), spec
    assert got.chk == int(want.chk), spec


# --- scalar expression trees: string + integer function composition ------

_STR_BASE = ["c_name", "c_mktsegment", "'xy_z'"]
_INT_BASE = ["c_custkey", "c_nationkey", "3", "7"]


@st.composite
def string_exprs(draw, depth=0):
    """Random string-function composition over customer columns —
    functions whose semantics the two dialects define identically
    (1-based SUBSTRING, UPPER/LOWER/TRIM/REPLACE/REVERSE/CONCAT)."""
    if depth >= 2:
        return draw(st.sampled_from(_STR_BASE))
    kind = draw(
        st.sampled_from(
            ["base", "upper", "lower", "trim", "substr", "replace", "reverse", "concat"]
        )
    )
    if kind == "base":
        return draw(st.sampled_from(_STR_BASE))
    inner = draw(string_exprs(depth=depth + 1))
    if kind == "substr":
        k = draw(st.integers(min_value=1, max_value=8))
        return f"SUBSTRING({inner}, 1, {k})"
    if kind == "replace":
        a = draw(st.sampled_from(["a", "e", "r", "#"]))
        b = draw(st.sampled_from(["z", "", "_Q"]))
        return f"REPLACE({inner}, '{a}', '{b}')"
    if kind == "concat":
        other = draw(string_exprs(depth=depth + 1))
        return f"CONCAT({inner}, {other})"
    return f"{kind.upper()}({inner})"


@st.composite
def int_exprs(draw, depth=0):
    """Random integer arithmetic/conditional composition over customer
    keys — +, *, %, ABS, LEAST/GREATEST, CASE. A leading % bounds every
    operand so products can't overflow BIGINT in either engine."""
    if depth >= 2:
        return draw(st.sampled_from(_INT_BASE))
    kind = draw(
        st.sampled_from(["base", "add", "mul", "mod", "abs", "least", "greatest", "case"])
    )
    if kind == "base":
        return draw(st.sampled_from(_INT_BASE))
    a = draw(int_exprs(depth=depth + 1))
    if kind == "abs":
        return f"ABS({a})"
    if kind == "mod":
        m = draw(st.integers(min_value=2, max_value=13))
        return f"(({a}) % {m})"
    b = draw(int_exprs(depth=depth + 1))
    if kind == "add":
        return f"(({a}) + ({b}))"
    if kind == "mul":
        # bound both factors so the product stays far inside BIGINT
        return f"((({a}) % 1000) * (({b}) % 1000))"
    if kind == "case":
        return f"(CASE WHEN ({a}) > ({b}) THEN ({a}) ELSE ({b}) END)"
    return f"{kind.upper()}({a}, {b})"


@pytest.fixture(scope="module")
def customer_view(spark, sf_dir):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_fzs_cust")
    return "_fzs_cust"


@given(expr=string_exprs())
@settings(max_examples=50, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_string_exprs_match(expr, spark, sf_dir, customer_view):
    q = (
        "SELECT CAST(COUNT(DISTINCT e) AS BIGINT) AS d, "
        "CAST(SUM(LENGTH(e)) AS BIGINT) AS sl "
        f"FROM (SELECT {expr} AS e FROM {{t}})"
    )
    got = spark.sql(q.format(t=customer_view)).first()
    want = _oracle_row(sf_dir, q.format(t="customer"))
    if want is None:
        return
    assert got.d == int(want.d), expr
    assert got.sl == int(want.sl), expr


@given(expr=int_exprs())
@settings(max_examples=50, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_int_exprs_match(expr, spark, sf_dir, customer_view):
    q = (
        "SELECT CAST(SUM(e) AS BIGINT) AS s, "
        "CAST(COUNT(DISTINCT e) AS BIGINT) AS d, "
        "CAST(MIN(e) AS BIGINT) AS lo, CAST(MAX(e) AS BIGINT) AS hi "
        f"FROM (SELECT CAST({expr} AS BIGINT) AS e FROM {{t}})"
    )
    got = spark.sql(q.format(t=customer_view)).first()
    want = _oracle_row(sf_dir, q.format(t="customer"))
    if want is None:
        return
    for col in ["s", "d", "lo", "hi"]:
        assert getattr(got, col) == int(want[col]), (expr, col)


# --- RANGE frames: tie-insensitive value-based windows --------------------


@st.composite
def range_window_specs(draw):
    """Random RANGE-frame window aggregates. RANGE frames include all
    PEERS of the boundary rows, so they are deterministic under ties by
    construction — no total-order crutch needed (the contrast with the
    ROWS family above is the point of covering both)."""
    fn = draw(st.sampled_from(["SUM", "COUNT", "MIN", "MAX"]))
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey % 10"]))
    key = draw(st.sampled_from(["l_quantity", "l_orderkey % 1000"]))
    lo = draw(st.sampled_from(["UNBOUNDED PRECEDING", "5 PRECEDING", "2 PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(["CURRENT ROW", "3 FOLLOWING", "10 FOLLOWING"]))
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        lo = "2 PRECEDING"
    return (
        f"{fn}(l_quantity) OVER (PARTITION BY {part} "
        f"ORDER BY {key} RANGE BETWEEN {lo} AND {hi})"
    )


@given(wexpr=range_window_specs())
@settings(max_examples=30, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_range_frames_match(wexpr, spark, sf_dir, lineitem_view):
    q = (
        "SELECT CAST(SUM(w * (l_orderkey % 97)) AS BIGINT) AS chk, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM ("
        f"SELECT l_orderkey, {wexpr} AS w FROM {{t}})"
    )
    got = spark.sql(q.format(t=lineitem_view)).first()
    want = _oracle_row(sf_dir, q.format(t="lineitem"))
    if want is None:
        return
    assert got.n == int(want.n), wexpr
    assert got.chk == int(want.chk), wexpr


# --- GIF LZW entropy coder property fuzz ----------------------------------


@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.binary(max_size=5000),
)
@settings(max_examples=60, deadline=None, derandomize=True)
def test_lzw_roundtrip_any_bytes(mcs, data):
    """Property: for ANY byte string over the alphabet [0, 2^mcs) the
    hand-written GIF LZW coder round-trips exactly — width bumps, the
    KwKwK self-reference, and the 4096-entry table freeze all land
    wherever hypothesis puts them, not where a fixed fixture does."""
    from hyperloglog_pyspark_spark.functions.mediacodec import (
        lzw_decode,
        lzw_encode,
    )

    clamped = bytes(b % (1 << mcs) for b in data)
    assert lzw_decode(lzw_encode(clamped, mcs), mcs, len(clamped)) == clamped


@given(data=st.binary(min_size=1, max_size=300))
@settings(max_examples=60, deadline=None, derandomize=True)
def test_lzw_decoder_rejects_or_bounds_garbage(data):
    """Property: feeding arbitrary bytes to the decoder either raises
    ValueError or yields output within the declared bound — it must
    never hang, over-produce, or crash with a non-contract error."""
    from hyperloglog_pyspark_spark.functions.mediacodec import lzw_decode

    try:
        out = lzw_decode(data, 8, 4096)
    except ValueError:
        return
    assert len(out) <= 4096


# --- map-side run-length term frequency vs naive explode+groupBy ----------


def test_runlength_tf_matches_groupby_on_random_docs(spark):
    """Differential check for _tf_table's shuffle-free form: the
    sort + run-boundary + explode expression must produce exactly the
    (doc_id, token, tf) set that explode+groupBy does, over adversarial
    token arrays — empty strings, single tokens, all-duplicates,
    unicode, tokens differing only by a trailing space, and long runs.
    Guards the ANSI-mode boundary probe (try_element_at at i=0) and the
    0-based subscript arithmetic in the transform."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    # entries with embedded/trailing spaces re-split after join — they
    # inject extra empty-string tokens, a deliberate edge
    vocab = ["a", "b", "ab", "a ", "", "é", "z" * 50, "tok ", "tok", "0"]
    docs = []
    for doc_id in range(200):
        n = rng.choice([1, 2, 3, 5, 20, 200])
        docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
    # targeted edge shapes
    docs += [(1000, ""), (1001, "x"), (1002, "x x x x"), (1003, " "), (1004, "  ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    naive = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    runlen = (
        df.select("doc_id", F.array_sort(F.split("text", " ")).alias("s"))
        .select(
            "doc_id",
            "s",
            F.expr(
                "concat(filter(sequence(0, size(s) - 1),"
                "              i -> i = 0 OR s[i] != try_element_at(s, i)),"
                "       array(size(s)))"
            ).alias("b"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(b) - 2),"
                    "          k -> struct(s[b[k]] AS token, b[k + 1] - b[k] AS tf))"
                )
            ).alias("e"),
        )
        .select("doc_id", "e.token", F.col("e.tf").cast("long").alias("tf"))
    )
    a = sorted(map(tuple, naive.collect()))
    b = sorted(map(tuple, runlen.collect()))
    assert a == b


# --- streaming funnel state: order-independence property ------------------


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


@given(
    events=st.lists(
        st.tuples(st.sampled_from(["view", "click", "purchase"]),
                  st.integers(min_value=0, max_value=30)),
        max_size=25,
    ),
    order_seed=st.integers(min_value=0, max_value=2**31),
    n_batches=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=120, deadline=None, derandomize=True)
def test_funnel_state_order_independent(events, order_seed, n_batches):
    """Property behind funnel_stream's exactness claim: for ANY event
    multiset, ANY shuffle, and ANY batch split, the final (tv, tc, tp)
    equals the batch recompute — including the adversarial case a naive
    tracker loses, where a later batch delivers an earlier view that
    re-qualifies an already-seen click."""
    import random

    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import _funnel_state_fn

    # batch-semantics reference
    views = [t for e, t in events if e == "view"]
    tv = min(views) if views else None
    clicks = [t for e, t in events if e == "click" and tv is not None and t >= tv]
    tc = min(clicks) if clicks else None
    purchases = [t for e, t in events if e == "purchase" and tc is not None and t >= tc]
    tp = min(purchases) if purchases else None

    shuffled = list(events)
    random.Random(order_seed).shuffle(shuffled)
    state = _FakeGroupState()
    out = None
    bounds = sorted(
        random.Random(order_seed + 1).sample(range(len(shuffled) + 1), min(n_batches - 1, len(shuffled)))
    ) if shuffled else []
    chunks, prev = [], 0
    for b in bounds:
        chunks.append(shuffled[prev:b]); prev = b
    chunks.append(shuffled[prev:])
    for chunk in chunks:
        pdf = pd.DataFrame(
            {"event_type": [e for e, _ in chunk], "ts_us": [t for _, t in chunk]}
        )
        out = list(_funnel_state_fn((7,), iter([pdf]), state))[-1]
    got = out.iloc[0]
    as_py = lambda v: None if pd.isna(v) else int(v)
    assert (as_py(got["tv"]), as_py(got["tc"]), as_py(got["tp"])) == (tv, tc, tp)


# --- streaming CUSUM: exact under micro-batch re-chunking ------------------


class _FakeValueStateF:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandleF:
    def __init__(self):
        self.cells = {}

    def getValueState(self, name, schema):  # noqa: N802
        return self.cells.setdefault(name, _FakeValueStateF())


@given(
    values=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=2000)),
        max_size=30,
    ),
    order_seed=st.integers(min_value=0, max_value=2**31),
    n_batches=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_cusum_monitor_exact_under_rechunking(values, order_seed, n_batches):
    """Property behind CusumMonitor's exactness claim: the recursion is
    ORDER-SENSITIVE, and the processor's contract is to sort WITHIN each
    micro-batch by event time while cross-batch order follows arrival
    (the watermark model: batch k's events all precede batch k+1's). So
    for ANY value sequence (with nulls = missing readings), ANY
    time-contiguous batch split, and ANY within-batch shuffle, the final
    (cusum, max_cusum, n_alerts) must equal the plain in-order replay —
    including empty batches injected mid-stream (timer fires)."""
    import math
    import random

    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        CUSUM_STREAM_H,
        CUSUM_STREAM_TARGET,
        CusumMonitor,
    )

    # in-order replay (the semantics of record)
    s = mx = n_alerts = 0
    h = int(CUSUM_STREAM_H * 1e6)
    for v in values:
        if v is None:
            continue
        d = float(v) - CUSUM_STREAM_TARGET
        du = int((1 if d >= 0 else -1) * math.floor(abs(d) * 1e6 + 0.5))
        s = max(0, s + du)
        mx = max(mx, s)
        n_alerts += s > h

    rng = random.Random(order_seed)
    timed = list(enumerate(values))  # ts = index, strictly increasing
    bounds = sorted(rng.sample(range(len(timed) + 1), min(n_batches - 1, len(timed)))) if timed else []
    chunks, prev = [], 0
    for b in bounds:
        chunks.append(timed[prev:b])
        prev = b
    chunks.append(timed[prev:])

    mon = CusumMonitor()
    mon.init(_FakeHandleF())
    out = None
    for chunk in chunks:
        rng.shuffle(chunk)  # post-shuffle arrival order inside the batch
        pdf = pd.DataFrame(
            {
                "value": [None if v is None else float(v) for _, v in chunk],
                "ts_us": [t for t, _ in chunk],
            }
        )
        out = list(mon.handleInputRows(("m",), iter([pdf]), None))[-1]
        # empty follow-up batch must not perturb state (timer-fire shape)
        out = list(mon.handleInputRows(("m",), iter([]), None))[-1]
    got = out.iloc[0]
    assert got["cusum"] == s / 1e6
    assert got["max_cusum"] == mx / 1e6
    assert got["n_alerts"] == n_alerts
    assert bool(got["alarm"]) == (s > h)


# --- SCD2 intervals: exact under event reordering within a key ------------


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # user_id
            st.sampled_from(["a", "b", "c"]),          # event_type
            st.integers(min_value=0, max_value=6),     # ts (ties likely)
        ),
        max_size=14,
    ),
    order_seed=st.integers(min_value=0, max_value=2**31),
)
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_intervals_exact_under_reordering(events, order_seed, spark):
    """_scd2_intervals (shared by scd2_status_history and
    temporal_point_in_time) must be a pure function of the event SET:
    the (ts, event_id) tie-break totalizes each user's timeline, so ANY
    input row order — including adversarial ts ties across different
    event types — yields the intervals of the canonical sorted replay.
    The reference collapses consecutive same-type events per user after
    sorting by (ts, event_id) and closes each interval at the next
    change row, mirroring the registered oracles' lag-filter-lead."""
    import random
    from collections import defaultdict

    from hyperloglog_pyspark_spark.operators.eventflow import _scd2_intervals

    rows = [(u, t, ts, eid) for eid, (u, t, ts) in enumerate(events)]

    by_user = defaultdict(list)
    for u, t, ts, eid in rows:
        by_user[u].append((ts, eid, t))
    want = []
    for u, evs in by_user.items():
        evs.sort()
        changes, prev = [], None
        for ts, eid, t in evs:
            if prev is None or t != prev:
                changes.append((ts, t))
            prev = t
        for i, (ts, t) in enumerate(changes):
            vto = changes[i + 1][0] if i + 1 < len(changes) else None
            want.append((u, t, ts, vto))
    want.sort(key=lambda r: (r[0], r[2], r[1]))

    shuffled = list(rows)
    random.Random(order_seed).shuffle(shuffled)
    df = spark.createDataFrame(
        shuffled, "user_id long, event_type string, ts long, event_id long"
    )
    got = sorted(
        ((r.user_id, r.event_type, r.valid_from, r.valid_to)
         for r in _scd2_intervals(df).collect()),
        key=lambda r: (r[0], r[2], r[1]),
    )
    assert got == want
