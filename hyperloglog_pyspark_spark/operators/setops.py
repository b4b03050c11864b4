"""Set operations: UNION / UNION ALL BY NAME / INTERSECT (ALL) / EXCEPT
(SURVEY.md §2.2 row "set ops"). Absent from the reference.

Scale: Spark plans INTERSECT/EXCEPT as left-semi/anti joins after a
distinct — a shuffle on the full row; at 100 TB prefer keyed semi-joins
(operators/relational.py) when a key exists. These queries exercise the
general row-wise forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table


def _custkeys_by_status(spark, sf_dir, status: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == status).select("o_custkey")


@register(
    "set_union_intersect_except",
    category="setop",
    bench=True,
    oracle="""
    SELECT 'either' AS tag, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    UNION ALL
    SELECT 'both' AS tag, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    UNION ALL
    SELECT 'open_only' AS tag, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    """,
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct), INTERSECT, EXCEPT over customer key sets, tagged
    and stacked into one result. Each side is persisted: all three set
    ops consume both sides, so the unpersisted form re-scans orders six
    times (once per side per op) for two status-pruned key columns."""
    o = tracked_persist(_custkeys_by_status(spark, sf_dir, "O"))
    p = tracked_persist(_custkeys_by_status(spark, sf_dir, "P"))
    either = o.union(p).distinct().select(F.lit("either").alias("tag"), "o_custkey")
    both = o.intersect(p).select(F.lit("both").alias("tag"), "o_custkey")
    only = o.subtract(p).select(F.lit("open_only").alias("tag"), "o_custkey")
    return either.unionByName(both).unionByName(only)


@register(
    "set_intersect_all_counts",
    category="setop",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n
    FROM (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    )
    GROUP BY l_partkey
    """,
)
def set_intersect_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics: per-key multiplicity = min of the
    two sides), aggregated to (partkey, multiplicity)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_union_by_name",
    category="setop",
    oracle="""
    SELECT event_id, user_id, value FROM (
        SELECT event_id, user_id FROM events WHERE event_type = 'click'
        UNION ALL BY NAME
        SELECT user_id, value, event_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-aligned union where the
    click branch lacks `value` (null-filled) and column order differs."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "value", "event_id")
    return clicks.unionByName(purchases, allowMissingColumns=True).select("event_id", "user_id", "value")
