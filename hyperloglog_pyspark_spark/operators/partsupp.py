"""TPC-H Q2/Q9/Q11/Q16/Q20 over a DERIVED partsupp dimension.

The driver testdata has no partsupp table, which is the only reason these
five TPC-H shapes were missing. partsupp is a pure function of
part × supplier, so it is derived deterministically with integer
arithmetic both engines compute bit-identically (keys are contiguous
0-based, verified per sf): 4 suppliers per part via modular hashing,
availqty and supplycost from modular polynomials, money as
DECIMAL(14,0) × 0.01 so no division or float rounding exists anywhere.
The DuckDB oracles derive the SAME table in a CTE — the hash comparison
checks derivation + query on both engines. With these five, all 22 TPC-H
query shapes are covered (COVERAGE.md).

Scale: partsupp is 4×|part| rows — a dimension, not a fact. It broadcasts
at testdata scale; at 100 TB it would be a materialized bucketed table
joined on (partkey, suppkey), and every query below already joins it only
on those keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.functions.money import disc_price
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

PS_FANOUT = 4

PARTSUPP_SQL = f"""
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey*131 + i.i*2971) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
         1 + (p_partkey*7 + i.i*13) % 999 AS ps_availqty,
         CAST(1000 + (p_partkey*31 + i.i*17) % 90000 AS DECIMAL(14,0))
             * CAST(0.01 AS DECIMAL(4,2)) AS ps_supplycost
  FROM part CROSS JOIN (SELECT unnest(range(0, {PS_FANOUT})) AS i) i
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of PARTSUPP_SQL (same integer arithmetic)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_supp = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    fan = spark.range(PS_FANOUT).select(F.col("id").alias("i"))
    pk, i = F.col("p_partkey"), F.col("i")
    return (
        part.crossJoin(F.broadcast(fan))
        .crossJoin(F.broadcast(n_supp))
        .select(
            pk.alias("ps_partkey"),
            ((pk * 131 + i * 2971) % F.col("n_supp")).alias("ps_suppkey"),
            (F.lit(1) + (pk * 7 + i * 13) % 999).alias("ps_availqty"),
            (
                (F.lit(1000) + (pk * 31 + i * 17) % 90000).cast("decimal(14,0)")
                * F.lit("0.01").cast("decimal(4,2)")
            ).alias("ps_supplycost"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    category="analytics",
    oracle=f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey AND p_size <= 12
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT min(ps_supplycost)
          FROM partsupp ps2, supplier s2, nation n2, region r2
          WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: the cheapest European supplier for each small part — the
    correlated-min subquery decorrelated into a per-part minimum joined
    back on exact DECIMAL equality (no float compare anywhere).

    Scale: the europe-side partsupp subset aggregates per partkey (one
    shuffle bounded by |part|); dims broadcast; the min join-back is an
    equi-join on (partkey, cost)."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 12)
    ps = derived_partsupp(spark, sf_dir)
    # Consumed twice (per-part minimum + equality join-back): persist the
    # dimension-sized Europe subset so the partsupp derivation and its
    # broadcast chain run once.
    europe = tracked_persist(
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_cost = europe.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        europe.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    category="analytics",
    bench=True,
    oracle=f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1.00 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_quantity AS DECIMAL(12,2)) * ps_supplycost)
                AS DOUBLE) AS profit
    FROM part, supplier, lineitem, partsupp, orders, nation
    WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
      AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus supply cost) on promo parts by
    supplier nation and order year — the widest star join in the suite,
    with all money math in exact DECIMAL through the subtraction.

    Scale: lineitem shuffles once on orderkey for the orders join;
    part/partsupp/supplier/nation all broadcast (4×|part| rows is a
    dimension); profit folds in the partial aggregate."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    profit = F.sum(
        disc_price()
        - F.col("l_quantity").cast("decimal(12,2)") * F.col("ps_supplycost")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(profit.cast("double").alias("profit"))
    )


_Q11_NATIONS = "'NATION_1','NATION_2','NATION_3'"
_Q11_VALUE = "SUM(ps_supplycost * CAST(ps_availqty AS DECIMAL(12,0)))"


@register(
    "tpch_q11_inventory_value",
    category="analytics",
    oracle=f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT ps_partkey, CAST({_Q11_VALUE} AS DOUBLE) AS value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name IN ({_Q11_NATIONS})
    GROUP BY ps_partkey
    HAVING {_Q11_VALUE} > (
        SELECT {_Q11_VALUE} * CAST(0.001 AS DECIMAL(4,3))
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name IN ({_Q11_NATIONS}))
    """,
)
def tpch_q11_inventory_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value in a nation group exceeds a
    fraction of the group total — HAVING against a scalar subquery, with
    the cut computed in exact DECIMAL on both engines.

    Scale: one partkey aggregation + a one-row broadcast of the total;
    the filtered partsupp subset is scanned once and reused for both."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    ps = derived_partsupp(spark, sf_dir)
    value = F.sum(
        F.col("ps_supplycost") * F.col("ps_availqty").cast("decimal(12,0)")
    )
    # Consumed twice (per-part values + the group total): one persisted pass.
    in_group = tracked_persist(
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost", "ps_availqty")
    )
    per_part = in_group.groupBy("ps_partkey").agg(value.alias("v"))
    total = in_group.agg(
        (value * F.lit("0.001").cast("decimal(4,3)")).alias("cut")
    )
    return (
        per_part.join(F.broadcast(total), per_part.v > F.col("cut"))
        .select("ps_partkey", F.col("v").cast("double").alias("value"))
    )


@register(
    "tpch_q16_supplier_cnt",
    category="analytics",
    oracle=f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size) for
    non-excluded parts, minus suppliers on the exclusion list (negative
    balance standing in for the absent comment column) — NOT IN realized
    as a left-anti join (keys are non-null, so the semantics coincide).

    Scale: the anti join broadcasts the small exclusion set; the distinct
    count shuffles (brand, type, size, suppkey) once."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = derived_partsupp(spark, sf_dir)
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_stock",
    category="analytics",
    oracle=f"""
    WITH {PARTSUPP_SQL.strip()}
    SELECT s_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > (
              SELECT 0.5 * SUM(l_quantity) FROM lineitem
              WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'))
      AND s_nationkey = n_nationkey AND n_name IN ({_Q11_NATIONS})
    """,
)
def tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding more than half a year's shipped
    quantity of any small part — nested IN chains decorrelated into a
    per-(part, supplier) shipment aggregate inner-joined to partsupp
    (the inner join drops pairs with no shipments, matching the NULL
    comparison semantics of the correlated subquery).

    Scale: the only fact-table work is one (partkey, suppkey) aggregate
    over the year's lines; everything after is dimension-sized.
    l_quantity is integer-valued so 0.5·SUM is exact in doubles."""
    part_small = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sk_part"), F.col("l_suppkey").alias("sk_supp")
    ).agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    ps = derived_partsupp(spark, sf_dir)
    excess = (
        ps.join(F.broadcast(part_small), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == F.col("sk_part")) & (ps.ps_suppkey == F.col("sk_supp")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(excess), supplier.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name")
    )
