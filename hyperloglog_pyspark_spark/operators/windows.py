"""Window functions: ranking, analytic (lag/lead), running frames, top-k
per group, and global sort/limit (SURVEY.md §2.2 rows "window functions",
"sorts/limits/top-k"). Absent from the reference entirely.

Determinism discipline: every ORDER BY carries a unique tiebreaker column
(orderkey / event_id) so ranking and frame contents are identical across
engines and across partitionings — the same property that makes these
queries safe to re-run at 100 TB (no nondeterministic output drift between
cluster runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.money import dec_price
from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "window_topk_per_group",
    category="window",
    bench=True,
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer: row_number + filter.

    Scale: this is THE scalable per-group top-k — one shuffle on the
    partition key, a bounded heap per group under AQE; never a global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_sum",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running customer spend over order history (cumulative frame).

    DECIMAL inside the frame keeps the prefix sums exact and engine-
    independent; cast to DOUBLE only at the output edge.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec_price("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.row_number().over(w_seq).alias("order_seq"),
    )


@register(
    "window_lag_lead",
    category="window",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(value - lag(value) OVER w, 2) AS DOUBLE) AS value_delta,
           lead(event_type) OVER w AS next_type,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over each user's event timeline: value deltas,
    next event type, inter-event gap."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).cast("double").alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "window_rank_dense_ntile",
    category="window",
    bench=True,
    oracle="""
    SELECT p_partkey, p_brand,
           rank() OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           ntile(4) OVER w AS price_quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS price_pct_rank
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank in one window."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return part.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).cast("double").alias("price_pct_rank"),
    )


@register(
    "orderby_limit_topk",
    category="relational",
    bench=True,
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — planned as TakeOrderedAndProject (per-
    partition top-25 heaps merged on the driver), so no full global sort
    even at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(25)
    )


@register(
    "window_range_frame",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, day_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY day_no
                      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS day_no
        FROM orders
    )
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a value axis (not row counts): per-customer
    trailing-30-day spend. RANGE frames bound state by the ORDER-BY value
    distance — rows landing on the same day share one frame, which ROWS
    frames cannot express."""
    orders = load_table(spark, sf_dir, "orders")
    with_day = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("day_no"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-29, 0)
    return with_day.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("spend_30d"),
    )


@register(
    "window_distribution",
    category="window",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(round(cume_dist()    OVER w, 6) AS DOUBLE) AS cume,
           first_value(c_custkey) OVER w AS poorest,
           nth_value(c_custkey, 3) OVER w AS third,
           last_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal, c_custkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING) AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + value window functions: percent_rank, cume_dist,
    first_value, nth_value, and last_value over an explicit unbounded frame
    (the default frame stops at CURRENT ROW, which would make last_value a
    self-reference — the classic frame pitfall, done right here).

    Scale: one shuffle on the partition key; all five functions share a
    single sort within each partition (same WINDOW spec), so Catalyst plans
    one Window operator, not five.
    """
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cume"),
        F.first("c_custkey").over(w).alias("poorest"),
        F.nth_value("c_custkey", 3).over(w).alias("third"),
        F.last("c_custkey").over(w_full).alias("richest"),
    )


@register(
    "window_range_interval",
    category="window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the trailing-one-hour event
    count and spend at every event — the sliding-aggregate shape that ROWS
    frames cannot express and tumbling windows approximate. Deterministic
    under timestamp ties by RANGE semantics (equal ORDER BY values share
    one frame), so no tiebreaker column is needed.

    Scale: one user_id shuffle; frame state is bounded by events-per-hour
    per user, not history length."""
    ev = load_table(spark, sf_dir, "events")
    # Interval-typed RANGE bounds exist only in the SQL window syntax
    # (DataFrame rangeBetween takes numeric offsets), so the frame is an
    # expression — still one Catalyst Window operator.
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id",
        "user_id",
        F.expr(f"count(*) {over}").cast("long").alias("n_last_hour"),
        F.expr(f"CAST(sum(CAST(value AS DECIMAL(12,2))) {over} AS DOUBLE)").alias(
            "value_last_hour"
        ),
    )
