"""SQL entry path: flagship queries authored as ``spark.sql`` text over
temp views — the surface a SQL user types, not a DataFrame builder.

The reference exposes only a Python object API (HLL/HyperLogLog.py); this
engine's contract is that the same ANSI SQL that defines a query's oracle
runs on Spark unchanged (modulo optimizer hints), with the same plan the
DataFrame form gets — asserted in tests/test_layout.py by comparing
physical operator sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hyperloglog_pyspark_spark.operators import aggregates, analytics  # noqa: F401  (oracle reuse)
from hyperloglog_pyspark_spark.registry import REGISTRY, register
from hyperloglog_pyspark_spark.sources.catalog import load_table, register_views

# The DataFrame form broadcasts the filtered customer dim explicitly; the
# SQL form states the same intent as a hint. Everything else is the oracle
# SQL verbatim — both engines run the same ANSI text.
SQL_Q3 = """
    SELECT /*+ BROADCAST(customer) */ l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

SQL_PRICING = """
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
"""


@register("sql_q3", category="sql", bench=True, oracle=REGISTRY["tpch_q3_shipping_priority"].oracle)
def sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 via the SQL entry path: temp views + spark.sql of the same
    ANSI text as the DuckDB oracle (broadcast stated as a hint instead of
    the DataFrame API's F.broadcast)."""
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(SQL_Q3)


@register("sql_pricing", category="sql", oracle=REGISTRY["agg_pricing_summary"].oracle)
def sql_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary via the SQL entry path — oracle SQL
    verbatim; Catalyst plans the identical partial+final hash aggregate
    the DataFrame form gets (asserted in tests/test_layout.py). The view
    rides the same spread_scan frame as agg_pricing_summary (r16): the
    catalog layer decides physical fan-out, the SQL text is unchanged."""
    load_table(spark, sf_dir, "lineitem", spread_scan=True).createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(SQL_PRICING)


@register(
    "sql_scalar_udf",
    category="sql",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS total_charge
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 SQL UDF — CREATE FUNCTION ...
    RETURNS ... RETURN <expr>): the charge formula is declared once as a
    catalog function and reused by name. Unlike a Python UDF, a SQL UDF
    is INLINED by the analyzer — the plan is identical to writing the
    expression by hand (whole-stage codegen, pushdown, no serialization
    boundary), which is why it is the right tool for shared business
    formulas at 100 TB. The oracle states the expanded expression."""
    register_views(spark, sf_dir, ["lineitem"])
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION line_charge(
            price DOUBLE, discount DOUBLE, tax DOUBLE)
        RETURNS DECIMAL(18,6)
        RETURN CAST(price AS DECIMAL(12,2))
               * (1 - CAST(discount AS DECIMAL(4,2)))
               * (1 + CAST(tax AS DECIMAL(4,2)))
    """)
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(line_charge(l_extendedprice, l_discount, l_tax)) AS DOUBLE)
                   AS total_charge
        FROM lineitem
        WHERE l_quantity >= 30
        GROUP BY l_returnflag
    """)


@register(
    "sql_parameterized",
    category="sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized spark.sql: named :placeholders bound server-side
    (spark.sql(text, args={...})) — the injection-safe form for
    user-supplied constants; the literals land in the plan exactly as
    typed values, so pushdown and constant folding see them the same as
    inline literals. The oracle states the bound query."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 150000.0},
    )
