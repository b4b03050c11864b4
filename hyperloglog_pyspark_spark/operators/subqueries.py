"""Subquery handling, pivot/unpivot reshaping, and percentile aggregates
(SURVEY.md §2.2 gaps beyond the first relational pass).

Subqueries are authored in SQL on temp views so Catalyst's decorrelation
is exercised (scalar subquery → one extra agg + broadcast; EXISTS/NOT IN →
semi/anti joins), not hand-rewritten into joins by us. That rewrite IS the
scale story: a correlated EXISTS over 100 TB plans as one shuffled
left-semi join, never a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table


def _views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "subquery_scalar_avg",
    category="subquery",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_above
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above global mean balance.

    Plans as a one-row subquery broadcast into the filter — no per-row
    re-evaluation; identical SQL on both engines.
    """
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_above
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        """
    )


@register(
    "subquery_exists_notin",
    category="subquery",
    bench=True,
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'))
          AS n_with_f_order,
      (SELECT COUNT(*) FROM customer c
       WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders))
          AS n_never_ordered
    """,
)
def subquery_exists_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (→ left-semi join) and NOT IN (→ null-aware
    anti join) side by side — Catalyst decorrelates both; neither executes
    as a per-row probe."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'))
              AS n_with_f_order,
          (SELECT COUNT(*) FROM customer c
           WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders))
              AS n_never_ordered
        """
    )


_STATUSES = ["F", "O", "P"]


@register(
    "pivot_order_status",
    category="reshape",
    bench=True,
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(
               f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}"
               for s in _STATUSES
           )}
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: one column per order status.

    Explicit pivot values — never let pivot() run its values-discovery
    scan over a 100 TB table; with values given it is a single-pass
    conditional aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
    )


@register(
    "unpivot_nation_metrics",
    category="reshape",
    oracle="""
    WITH base AS (
        SELECT n.n_name,
               CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM base
    UNION ALL
    SELECT n_name, 'n_suppliers' AS metric, n_suppliers AS value FROM base
    """,
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of per-nation entity counts — the inverse
    reshape, a zero-shuffle Expand over the already-aggregated table."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    base = (
        nation.join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .join(supplier, supplier.s_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
    )
    return base.unpivot(
        ids=["n_name"],
        values=["n_customers", "n_suppliers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "percentile_exact",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
           CAST(round(quantile_cont(l_extendedprice, 0.50), 4) AS DOUBLE) AS p50,
           CAST(round(quantile_cont(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75,
           CAST(round(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (both engines use
    the same linear-interpolation definition).

    Scale note: exact percentiles sort per group; at 100 TB prefer
    approx_percentile (t-digest-style sketch, partial+final mergeable) —
    tolerance-tested against this exact form in tests/test_sketches
    because no cross-engine hash match is possible for sketches.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.99)]))
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("ps"))
        .select(
            "l_returnflag",
            *[
                F.round(F.col("ps")[i], 4).cast("double").alias(n)
                for i, n in enumerate(["p25", "p50", "p75", "p99"])
            ],
        )
    )


_PIVOT_CELLS_SQL = ", ".join(
    f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}, "
    f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN CAST(o_totalprice AS DECIMAL(18,2)) END)"
    f" AS DOUBLE) AS rev_{s}"
    for s in _STATUSES
)


@register(
    "pivot_multi_value",
    category="reshape",
    oracle=f"""
    SELECT o_orderpriority, {_PIVOT_CELLS_SQL}
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_multi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure pivot: one reshape carrying TWO aggregates per pivot
    cell (order count + decimal-exact revenue) — Spark's pivot().agg(a, b)
    names columns {value}_{alias}, re-aliased here to the report layout.
    Pivot values are enumerated explicitly: at scale an unlisted pivot
    triggers a distinct-scan planning pass AND risks a column explosion;
    listing them keeps the plan a single pass with a fixed schema."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"),
        )
    )
    cols = [F.col("o_orderpriority")]
    for s in _STATUSES:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).cast("long").alias(f"n_{s}"))
        cols.append(F.col(f"{s}_rev").alias(f"rev_{s}"))
    return pivoted.select(*cols)
