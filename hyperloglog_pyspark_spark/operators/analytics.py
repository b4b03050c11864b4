"""Multi-join analytical queries in the classic TPC-H shapes (Q3 shipping
priority, Q5 local supplier volume) — the end-to-end star-join workloads
that exercise join ordering, broadcast selection, pushdown through joins,
and top-k, all at once.

Scale notes: the fact table (lineitem) is never broadcast and never
shuffled more than its join keys require; dimension chains
(region→nation→customer/supplier) stay broadcast-side so the only big
exchanges are fact-table aggregations. Date filters sit directly on scan
columns (PushedFilters) — at 100 TB with date-partitioned storage they
become partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.functions.money import disc_price
from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))"


@register(
    "tpch_q3_shipping_priority",
    category="analytics",
    bench=True,
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment. Customer (filtered dim) broadcasts; lineitem aggregates on
    its join key; LIMIT after ORDER BY is a TakeOrderedAndProject — no
    global sort materialization."""
    cutoff = "1998-06-01"
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(disc_price())
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    category="analytics",
    bench=True,
    oracle=f"""
    SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from local-supplier orders per Asian
    nation — a 6-way star join where region→nation→supplier/customer all
    broadcast and only lineitem⋈orders shuffles."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(disc_price())
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), (orders.o_custkey == customer.c_custkey) & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )
