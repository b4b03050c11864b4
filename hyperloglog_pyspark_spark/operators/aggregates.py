"""Aggregation family: hash aggregates (partial+final), exact distinct,
CUBE / ROLLUP / GROUPING SETS, and ordered statistics (SURVEY.md §2.2).

The reference's one real operator IS a partial+final aggregation done by
hand (sketch per partition + associative merge, HLL/examples.py:56-67);
everything here expresses that same pattern declaratively so Catalyst
plans map-side combine automatically: HashAggregate(partial) → Exchange →
HashAggregate(final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.functions.money import (
    avg_money,
    charge,
    dec_price,
    dec_rate,
    disc_price,
    sum_money,
)
from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table, register_views


@register(
    "agg_pricing_summary",
    category="aggregate",
    bench=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical wide hash aggregate.

    Scale: 4 grouping cells regardless of input size — partial aggregation
    reduces 100 TB to a handful of rows before the single tiny shuffle.
    Round-16: spread_scan — the single-row-group testdata plans the scan
    to ONE task, so the whole 600k-row decimal partial aggregate ran
    serially (guide §2.5 input skew; isolated min 2.01 s, the #3 bench
    row). ``spread`` stays a no-op on properly-split files, so nothing
    local-mode-specific ships to production. The plan-identity twin
    sql_pricing registers its view over the same spread frame, keeping
    tests/test_layout.py::test_sql_entry_path_plans_match_dataframe_forms
    byte-identical (the predicate still pushes to the scan: Catalyst
    moves filters through round-robin repartition).
    """
    li = load_table(spark, sf_dir, "lineitem", spread_scan=True).filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_money(dec_price("l_quantity"), "sum_qty"),
        sum_money(dec_price("l_extendedprice"), "sum_base_price"),
        sum_money(disc_price(), "sum_disc_price"),
        sum_money(charge(), "sum_charge"),
        avg_money(dec_price("l_quantity"), "avg_qty"),
        avg_money(dec_price("l_extendedprice"), "avg_price"),
        avg_money(dec_rate("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_stats",
    category="aggregate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/count + exact COUNT(DISTINCT) per group.

    Scale: COUNT(DISTINCT) expands to a two-phase aggregate (distinct on
    (group, key), then count) — exact but shuffle-heavy; the sketch module
    provides the approx alternative for high-cardinality keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        avg_money(dec_price("o_totalprice"), "avg_price"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
    )


@register(
    "agg_distinct_exact",
    category="aggregate",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-users per event type — the engine's analog of the
    reference's exact oracle path (RDD.distinct().count(),
    HLL/examples.py:80)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_cube",
    category="aggregate",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id disambiguation.

    Scale: CUBE(a,b) expands each row 4× before aggregation; for wide cubes
    at 100 TB, pre-aggregate on the finest grain first, then cube the tiny
    intermediate (same trick as the sketch rollup in operators/sketch.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            sum_money(dec_price("l_quantity"), "sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_qty",
        )
    )


@register(
    "agg_rollup",
    category="aggregate",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(n.n_name, 'ALL') AS nation,
           GROUPING(r.r_name, n.n_name) AS gid,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP along the region → nation hierarchy (the relational form of
    the reference's sketch-merge rollup story, HLL/HyperLogLog.py:157-179)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            sum_money(dec_price("c_acctbal"), "total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "gid",
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "agg_grouping_sets",
    category="aggregate",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by-type, by-day, grand total) via Spark SQL."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(CAST(ts AS DATE) AS STRING), 'ALL') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        """
    )


@register(
    "agg_salted_skew",
    category="aggregate",
    bench=True,
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: event_type has a handful of values,
    so at 100 TB every key is a hot key — a single groupBy(event_type)
    funnels the table through a few reducers. Salting fans each key across
    16 partial groups, then a cheap final pass over 16·|keys| rows.

    The salt is hash(user_id) % 16 — NOT random — so COUNT(DISTINCT
    user_id) stays decomposable (a user never straddles salt groups and
    distinct counts add exactly). Sums/counts decompose trivially; the
    same shape with hll_sketch_agg partials gives the approximate variant
    (sketch.py::hll_sketch_rollup).
    """
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("user_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(dec_price("value")).alias("v"),
        F.count_distinct("user_id").alias("d"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.sum("d").alias("n_users"),
    )


@register(
    "agg_stats_moments",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS qty_stddev,
           CAST(round(var_samp(l_quantity), 4) AS DOUBLE) AS qty_var,
           CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS qty_price_corr,
           CAST(round(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: sample stddev/variance,
    correlation and covariance (identical sample definitions on both
    engines; rounded at the edge because moment sums are float-order
    sensitive). All are single-pass partial+final mergeable aggregates —
    the moment vector (n, Σx, Σx², Σxy) merges like any combiner."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).cast("double").alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).cast("double").alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).cast("double").alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).cast("double").alias("qty_price_covar"),
    )


@register(
    "agg_filter_clause",
    category="aggregate",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE value > 50) AS n_high,
           CAST(COUNT(DISTINCT user_id) FILTER (WHERE value > 50) AS BIGINT) AS n_high_users,
           array_to_string(list_sort(list(DISTINCT CAST(user_id % 10 AS VARCHAR))), ',') AS user_mod_set
    FROM events GROUP BY event_type
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation with the SQL FILTER clause plus a grouped
    distinct-set build (sorted, joined to a string so the cross-engine
    hash is order-independent). FILTER aggregates stay single-pass —
    no self-join per condition."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE value > 50) AS n_high,
               COUNT(DISTINCT user_id) FILTER (WHERE value > 50) AS n_high_users,
               array_join(sort_array(collect_set(CAST(user_id % 10 AS STRING))), ',') AS user_mod_set
        FROM events GROUP BY event_type
        """
    )


@register(
    "agg_regression",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(round(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE) AS slope,
           CAST(round(regr_intercept(l_extendedprice, l_quantity), 4) AS DOUBLE) AS intercept,
           CAST(round(regr_r2(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression of price on quantity via the
    SQL-standard REGR_* aggregates (single-pass, mergeable moment sums on
    both engines — same partial/final shape as any combiner)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).cast("double").alias("slope"),
        F.round(F.regr_intercept(y, x), 4).cast("double").alias("intercept"),
        F.round(F.regr_r2(y, x), 6).cast("double").alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "agg_argminmax",
    category="aggregate",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_name, CAST(c_acctbal AS DECIMAL(12,2)) * 1000000 + c_custkey) AS richest_name,
           arg_min(c_name, CAST(c_acctbal AS DECIMAL(12,2)) * 1000000 + c_custkey) AS poorest_name,
           CAST(arg_max(c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) * 1000000 + c_custkey) AS BIGINT) AS richest_key,
           CAST(round(MAX(c_acctbal), 2) AS DOUBLE) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY / MAX_BY (argmin/argmax) aggregates: the row attribute at the
    extremum, without a self-join or window. Ties on balance break
    deterministically via a composite key; Spark compares a struct
    (c_acctbal, c_custkey) lexicographically, while the oracle encodes the
    same ordering as exact decimal arithmetic (DuckDB 1.0 arg_max takes
    only scalar keys).

    Scale: argmin/argmax carry one candidate row per group through the
    partial+final aggregation — O(groups) state, vs the window-rank
    alternative that materializes and sorts every row.
    """
    cust = load_table(spark, sf_dir, "customer")
    key = F.struct("c_acctbal", "c_custkey")
    return cust.groupBy("c_mktsegment").agg(
        F.max_by("c_name", key).alias("richest_name"),
        F.min_by("c_name", key).alias("poorest_name"),
        F.max_by("c_custkey", key).alias("richest_key"),
        F.round(F.max("c_acctbal"), 2).cast("double").alias("max_bal"),
    )


@register(
    "agg_listagg",
    category="aggregate",
    oracle="""
    SELECT n_nationkey,
           string_agg(c_name, ',' ORDER BY c_custkey) AS members,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    GROUP BY n_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with WITHIN GROUP ordering: the SQL:2016
    ordered string-concatenation aggregate (Spark 4 built-in), with an
    explicit deterministic order key.

    Scale: ordered listagg buffers the group's elements for the final
    sort — bounded here by the high-balance filter. For unbounded groups
    the scalable form is collect_list → array_sort → array_join, or a
    window + first aggregation; same output, explicit memory story.
    """
    from hyperloglog_pyspark_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ["customer", "nation"])
    return spark.sql("""
        SELECT n_nationkey,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey) AS members,
               COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_nationkey
    """)


@register(
    "ivm_incremental_agg",
    category="aggregate",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the running aggregate table is stored
    as MERGEABLE PARTIAL STATE (count, decimal sum, user_id HLL sketch +
    exact user set per partial here), and a new data increment is folded in
    by unioning state rows and re-aggregating — never rescanning the base.
    Simulated by splitting events into a base batch (event_id % 5 != 0)
    and a delta batch, aggregating each independently, then merging.

    This is the pattern that keeps a 100 TB rollup fresh: states are
    associative (SUM of sums, SUM of counts, register-max of sketches), so
    every refresh costs O(delta) + O(state), not O(base). Distinct counts
    are kept exact here via a two-level (group, user) aggregation whose
    first level is itself incremental — the sketch-based alternative (KB
    state, approximate) is hll_sketch_rollup's merge path.

    Decimal sums make the merge order-independent bit-for-bit; the final
    cast to DOUBLE happens once at the edge."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "event_id", "value")

    def partial(df: DataFrame) -> DataFrame:
        # Level 1: per (event_type, user) partial — incremental unit.
        return df.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )

    base = partial(ev.filter(F.col("event_id") % 5 != 0))
    delta = partial(ev.filter(F.col("event_id") % 5 == 0))
    # Merge = union of state rows + same aggregation re-applied (associative).
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "user_id")
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )
    return merged.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_value").cast("double").alias("sum_value"),
        (F.sum("sum_value").cast("double") / F.sum("n")).alias("avg_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "ivm_delta_join",
    category="aggregate",
    bench=True,
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the revenue-per-nation
    rollup over orders ⋈ customer ⋈ nation is kept fresh by joining ONLY
    the delta batch of orders against the dimensions (ΔV = ΔO ⋈ C ⋈ N)
    and folding the resulting partial states into the stored view — the
    base fact table is never rescanned. Simulated by splitting orders on
    o_orderkey % 7: the big remainder plays the stored view, the small
    slice plays the incoming delta.

    This is the join analog of ivm_incremental_agg: at 100 TB the delta
    batch is MB-to-GB sized, so its dimension joins broadcast and the
    refresh costs O(delta) + O(state). Decimal sums make the state merge
    order-independent, so incremental == full-recompute bit-for-bit (the
    oracle computes the full join)."""
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def view_partial(orders: DataFrame) -> DataFrame:
        # ΔV = ΔO ⋈ C ⋈ N, pre-aggregated to mergeable per-nation state.
        return (
            orders.join(F.broadcast(cu), orders["o_custkey"] == cu["c_custkey"])
            .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            )
        )

    stored = view_partial(od.filter(F.col("o_orderkey") % 7 != 0))
    delta = view_partial(od.filter(F.col("o_orderkey") % 7 == 0))
    return (
        stored.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue").cast("double").alias("revenue"),
        )
    )
