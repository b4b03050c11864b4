"""Scans, projections, filters and the join family (SURVEY.md §2.2 rows
"scans/sources", "projections/filters/predicates", "joins", "semi/anti",
"range/as-of").

The reference has none of these (its only relational op is RDD.distinct in
HLL/examples.py:80); each query here is the idiomatic Catalyst-planned
form, with the physical strategy we'd want at 100 TB noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.money import disc_price, sum_money
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "scan_project_filter",
    category="relational",
    bench=True,
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
      AND l_returnflag = 'R'
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with predicate pushdown + column pruning.

    Scale: the two filters and the 5-column projection reach the parquet
    reader (`PushedFilters`/`ReadSchema` in explain), so a 100 TB scan
    touches only matching row groups and 5 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            disc_price().cast("double").alias("revenue"),
        )
    )


@register(
    "filter_in_like_between",
    category="relational",
    bench=True,
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#13', 'Brand#25')
      AND p_type LIKE 'ECO%'
      AND p_size BETWEEN 5 AND 25
      AND p_name NOT LIKE '%bolt%'
    """,
)
def filter_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin / LIKE / BETWEEN / NOT LIKE predicate coverage; all four are
    pushdown-eligible (in/like-prefix become parquet filters)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#13", "Brand#25")
        & F.col("p_type").like("ECO%")
        & F.col("p_size").between(5, 25)
        & ~F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "expr_case_arith",
    category="relational",
    bench=True,
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS price_class,
           CAST(round(o_totalprice / 1000.0, 2) AS DOUBLE) AS price_k,
           (o_orderkey % 7) + 1 AS bucket
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def expr_case_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + arithmetic + modulo in one codegen'd projection."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("price_class"),
        F.round(F.col("o_totalprice") / 1000.0, 2).cast("double").alias("price_k"),
        ((F.col("o_orderkey") % 7) + 1).alias("bucket"),
    )


@register(
    "join_broadcast_dim",
    category="join",
    bench=True,
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ three dimension tables, all broadcast.

    Scale: supplier/nation/region are tiny relative to lineitem at any SF —
    broadcasting them eliminates every shuffle except the final partial+
    final aggregation on (r_name, n_name).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            sum_money(disc_price(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_shuffle_agg",
    category="join",
    bench=True,
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderpriority
    """,
)
def join_shuffle_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join (orders ⋈ lineitem) + aggregation.

    Scale: both sides shuffle on orderkey (sort-merge or shuffled-hash via
    AQE); the orderdate filter is pushed to the orders scan first, shrinking
    the build side before the shuffle. With bucketed storage on l_orderkey/
    o_orderkey this becomes a zero-shuffle co-located join.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            sum_money(disc_price(), "revenue"),
        )
    )


@register(
    "join_semi",
    category="join",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one open order.

    Scale: semi-join only ships the join key of the right side and
    short-circuits on first match — far cheaper than join+distinct.
    """
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti",
    category="join",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c.c_nationkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers without pending orders."""
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_outer_histogram",
    category="join",
    oracle="""
    SELECT n_items, COUNT(*) AS n_orders
    FROM (
        SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_items
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    )
    GROUP BY n_items
    """,
)
def join_outer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving orders with zero lineitems, then a
    lineitems-per-order histogram (COUNT(col) skips the null-extended rows,
    so empty orders count as 0)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(li, li.l_orderkey == orders.o_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )
    return per_order.groupBy("n_items").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "join_full_outer",
    category="join",
    oracle="""
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS custkey,
           (a.c_custkey IS NOT NULL) AS in_debt,
           (b.c_custkey IS NOT NULL) AS in_building
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal < 0) a
    FULL OUTER JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') b
      ON a.c_custkey = b.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two overlapping customer subsets."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("a_key"))
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("b_key"))
    return a.join(b, a.a_key == b.b_key, "full_outer").select(
        F.coalesce("a_key", "b_key").alias("custkey"),
        F.col("a_key").isNotNull().alias("in_debt"),
        F.col("b_key").isNotNull().alias("in_building"),
    )


@register(
    "join_range",
    category="join",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks in the hour preceding each purchase.

    Scale: the equi-key (user_id) makes this a hash join with a range
    residual — NOT a nested-loop. For pure range joins without an equi-key,
    bucketize time into epochs and join on the bucket ± 1 (documented
    pattern; see streaming_batch for the windowed forms).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (c.c_user == p.p_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts < p.p_ts)
    )
    return (
        p.join(c, cond, "left")
        .groupBy(F.col("p_id").alias("event_id"))
        .agg(F.count("c_id").alias("n_clicks"))
    )


@register(
    "join_asof",
    category="join",
    bench=True,
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ), c AS (SELECT user_id, ts, event_id FROM clicks WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id,
           c.event_id AS click_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: most recent click at-or-before each purchase, per user.

    Spark has no ASOF join operator; the scalable relational form is the
    union + ordered-window trick: interleave both event sets on (user, ts),
    carry the last click forward with last(..., ignoreNulls=True), then
    keep only purchase rows. One shuffle on user_id, no per-row subquery —
    this holds at 100 TB because the window is partitioned by user.
    (Oracle uses DuckDB's native ASOF JOIN as an independent check.)
    """
    ev = load_table(spark, sf_dir, "events")
    # ASOF's ON clause is NULL-REJECTING on both user_id and ts: a
    # NULL-keyed click can never be anyone's as-of match. The window
    # form instead groups NULL users into one partition and sorts
    # NULL-ts rows first, so without this filter a NULL-keyed purchase
    # would inherit a NULL-keyed click the oracle never pairs.
    # (Purchases stay unfiltered — the LEFT side keeps its rows with a
    # NULL click on both engines.)
    clicks = ev.filter(
        (F.col("event_type") == "click")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    # Dedupe clicks at identical (user, ts) — keeps the as-of target unique
    # so both engines pick the same row.
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        clicks.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
        .withColumn("is_purchase", F.lit(0))
        .withColumn("event_id", F.lit(None).cast("long"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("click_id", F.lit(None).cast("long"))
        .withColumn("is_purchase", F.lit(1))
    )
    merged = clicks.select("user_id", "ts", "event_id", "click_id", "is_purchase").unionByName(
        purchases.select("user_id", "ts", "event_id", "click_id", "is_purchase")
    )
    # clicks sort before purchases at equal ts (is_purchase asc) → inclusive
    # "at-or-before" semantics, matching ASOF's p.ts >= c.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("last_click", F.last("click_id", ignorenulls=True).over(w)).withColumn(
        "last_click_ts", F.last(F.when(F.col("is_purchase") == 0, F.col("ts")), ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_purchase") == 1).select(
        "event_id",
        F.col("last_click").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias("gap_us"),
    )


@register(
    "cdc_upsert_merge",
    category="join",
    oracle="""
    WITH snapshot AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
    ),
    changes AS (
        SELECT c_custkey,
               upper(c_name) AS c_name,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100.00 AS DOUBLE) AS c_acctbal,
               CASE WHEN c_custkey % 5 = 0 THEN 'D' ELSE 'U' END AS op
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(s.c_custkey, c.c_custkey) AS c_custkey,
           COALESCE(c.c_name, s.c_name) AS c_name,
           COALESCE(c.c_acctbal, s.c_acctbal) AS c_acctbal
    FROM snapshot s FULL OUTER JOIN changes c USING (c_custkey)
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE without a table format: apply a changeset (upserts +
    deletes) to a snapshot via one full-outer join — insert when only the
    change side exists, update when both, delete drops the row.

    Scale: this is exactly what Delta/Iceberg MERGE plans underneath; as a
    plain join it shuffles both sides on the key once. Derived here from
    customer (snapshot = keys not divisible by 3; changes = even keys,
    +100 balance, deletes at multiples of 5) so the oracle is pure SQL.
    """
    cust = load_table(spark, sf_dir, "customer")
    snapshot = cust.filter(F.col("c_custkey") % 3 != 0).select("c_custkey", "c_name", "c_acctbal")
    changes = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        (F.col("c_acctbal").cast("decimal(18,2)") + F.lit(100.00).cast("decimal(18,2)"))
        .cast("double")
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 5 == 0, "D").otherwise("U").alias("op"),
    )
    s, c = snapshot.alias("s"), changes.alias("c")
    merged = s.join(c, on="c_custkey", how="full_outer")
    return (
        merged.filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            "c_custkey",
            F.coalesce(F.col("c.c_name"), F.col("s.c_name")).alias("c_name"),
            F.coalesce(F.col("c.c_acctbal"), F.col("s.c_acctbal")).alias("c_acctbal"),
        )
    )


@register(
    "join_null_safe",
    category="join",
    oracle="""
    WITH a AS (SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp FROM customer WHERE c_custkey % 7 = 0),
         b AS (SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS grp FROM supplier)
    SELECT a.grp AS grp, COUNT(*) AS n_pairs,
           CAST(COUNT(DISTINCT a.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT b.s_suppkey) AS BIGINT) AS n_suppliers
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY a.grp
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension tables
    with unknown members need.

    Scale: <=> is still an equi-join condition (hash-joinable: NULL hashes
    to its own bucket), not a degenerate theta join; but a hot NULL key is
    the canonical skew cell — salt it or split NULLs into a separate union
    branch when the null fraction is large.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    sup = load_table(spark, sf_dir, "supplier")
    a = cust.select("c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("a_grp"))
    b = sup.select("s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("b_grp"))
    return (
        a.join(b, a.a_grp.eqNullSafe(b.b_grp))
        .groupBy(F.col("a_grp").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
    )


@register(
    "recursive_cte_spine",
    category="analytics",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < date_trunc('month', (SELECT MAX(o_orderdate) FROM orders))
    )
    SELECT CAST(m AS DATE) AS month,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
)
def recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate a gap-free monthly calendar spine
    from the data's own min/max bounds, then left-join order totals so
    empty months surface as zero rows — the gap-filling pattern behind
    every time-series report.

    Scale: the recursion materializes one row per month (trivial); the
    left join broadcasts the spine against the fact table. sequence() +
    explode is the non-recursive equivalent (used in
    timeseries_resample_ffill); this form exercises the recursive-union
    operator itself.
    """
    from hyperloglog_pyspark_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
            SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months
            WHERE m < date_trunc('month', (SELECT MAX(o_orderdate) FROM orders))
        )
        SELECT CAST(m AS DATE) AS month,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m
    """)


@register(
    "cross_join_dense_matrix",
    category="join",
    oracle="""
    WITH grid AS (
        SELECT r_name, seg FROM region
        CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    ),
    actual AS (
        SELECT r.r_name, c.c_mktsegment AS seg,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY r.r_name, c.c_mktsegment
    )
    SELECT g.r_name, g.seg,
           CAST(COALESCE(a.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(a.revenue, 0.0) AS DOUBLE) AS revenue
    FROM grid g LEFT JOIN actual a ON g.r_name = a.r_name AND g.seg = a.seg
    """,
)
def cross_join_dense_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN: build the dense (region × market-segment) grid,
    then left-join actual revenue so empty cells report zero — the
    dense-matrix report pattern (a GROUP BY alone silently drops empty
    combinations).

    Scale: the cartesian product is dimension × dimension (25 rows) — never
    fact × anything; both sides of the final join broadcast. Cross joins of
    two large inputs are the one shape that cannot scale; the engine's
    near-dup and similarity operators use LSH bucketing precisely to avoid
    them.
    """
    region = load_table(spark, sf_dir, "region")
    segs = load_table(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("seg")).distinct()
    grid = region.select("r_name").crossJoin(segs)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    actual = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(region), nat.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("a_rname"), F.col("c_mktsegment").alias("a_seg"))
        .agg(
            F.count(F.lit(1)).alias("a_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("a_rev"),
        )
    )
    return grid.join(
        F.broadcast(actual),
        (grid.r_name == actual.a_rname) & (grid.seg == actual.a_seg),
        "left",
    ).select(
        "r_name",
        "seg",
        F.coalesce("a_n", F.lit(0)).alias("n_orders"),
        F.coalesce("a_rev", F.lit(0.0)).alias("revenue"),
    )


SKEW_SALT_N = 16


@register(
    "join_salted_skew",
    category="join",
    oracle="""
    WITH dim AS (
        SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6)) * d.type_n) AS DOUBLE)
               AS weighted_value
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated shuffle join on a pathologically skewed key: the
    events stream joins a per-type rate table on event_type — an alphabet
    of a handful of values, so a plain shuffle join lands each key's
    entire volume in ONE task. The fix demonstrated here: the fact side
    adds salt = hash(row id) mod S, the dim side replicates each row S
    times (explode of a sequence), and the join key becomes
    (event_type, salt) — spreading every hot key across S tasks while
    keeping the join exact.

    The shuffle_hash hint pins the shuffle path (the S×|alphabet| dim
    would otherwise broadcast, which at this size is the even better plan
    — salting is the technique for when BOTH sides are too big to
    broadcast but one key dominates; AQE skew-join handles moderate skew,
    salting handles the single-key-dominates-everything case). Decimal
    weighting keeps the merged result bit-equal to the unsalted oracle
    join."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_n"))
    salted_dim = dim.select(
        "event_type",
        "type_n",
        F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT_N - 1))).alias("salt"),
    )
    salted_fact = ev.select(
        "event_type",
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(SKEW_SALT_N)).cast("int").alias("salt"),
    )
    joined = salted_fact.join(
        salted_dim.hint("shuffle_hash"), ["event_type", "salt"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)") * F.col("type_n"))
        .cast("double")
        .alias("weighted_value"),
    )


INCIDENT_ERRORS_PER_HOUR = 7  # error burst threshold defining an incident


@register(
    "join_interval_overlap",
    category="join",
    oracle=f"""
    WITH activity AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MIN(ts) AS a_start, MAX(ts) AS a_end
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    incidents AS (
        SELECT date_trunc('hour', ts) AS i_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS i_end,
               COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY date_trunc('hour', ts)
        HAVING COUNT(*) >= {INCIDENT_ERRORS_PER_HOUR}
    )
    SELECT CAST(epoch_ms(i.i_start) AS BIGINT) AS incident_start_ms,
           CAST(i.n_errors AS BIGINT) AS n_errors,
           CAST(COUNT(a.user_id) AS BIGINT) AS n_affected_users
    FROM incidents i
    LEFT JOIN activity a
      ON a.day = CAST(i.i_start AS DATE)
     AND a.a_start < i.i_end AND i.i_start <= a.a_end
    GROUP BY i.i_start, i.n_errors
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per-user daily activity intervals
    [first event, last event] matched against error-burst incident hours
    (≥ {INCIDENT_ERRORS_PER_HOUR} errors/hour) on the standard half-open overlap predicate
    a.start < i.end AND i.start <= a.end — "which users were active
    during the outage", the blast-radius query of every incident review.

    Scale posture: the overlap predicate alone would be a cross product,
    so the join is BANDED by the calendar day (activity intervals are
    day-scoped by construction, incidents are hour-grained) — an
    equi-join on day with the overlap as a residual filter; same
    banding discipline as join_range. Both sides are aggregates of one
    fact scan; the incident side is tiny and broadcasts — as the BUILD
    side of an INNER count join (an outer join cannot broadcast its
    preserved side: LeftOuter only builds right, so the old
    incidents-LEFT-JOIN-activity form silently broadcast the
    user×day-cardinality ACTIVITY aggregate instead), with the
    zero-affected incidents restored by a broadcast left join of the
    incident-sized count table back onto incidents."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    hour = F.date_trunc("hour", "ts")
    # persisted: referenced twice (the overlap probe and the final
    # zero-restoring left join) — without the cache the incident
    # subplan's events scan re-embeds at both sites
    incidents = tracked_persist(
        ev.filter(F.col("event_type") == "error")
        .groupBy(hour.alias("i_start"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= INCIDENT_ERRORS_PER_HOUR)
        .withColumn("i_end", F.col("i_start") + F.expr("INTERVAL 1 HOUR"))
    )
    overlaps = (
        activity.join(
            F.broadcast(incidents),
            (activity["day"] == incidents["i_start"].cast("date"))
            & (activity["a_start"] < incidents["i_end"])
            & (incidents["i_start"] <= activity["a_end"]),
        )
        .groupBy("i_start")
        # COUNT(activity.user_id), not COUNT(*): the oracle's
        # COUNT(a.user_id) skips NULL-keyed activity rows, and a NULL
        # user_id group survives the groupBy above (grouping keys keep
        # NULLs) — count the joined side's key to match on dirty data.
        .agg(F.count(activity["user_id"]).alias("n_affected_users"))
    )
    return (
        incidents.join(F.broadcast(overlaps), "i_start", "left")
        .select(
            F.unix_millis("i_start").alias("incident_start_ms"),
            F.col("n_errors").cast("long").alias("n_errors"),
            F.coalesce("n_affected_users", F.lit(0))
            .cast("long")
            .alias("n_affected_users"),
        )
    )


@register(
    "join_asof_nearest",
    category="join",
    bench=True,
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
        SELECT p.event_id, c.click_id,
               epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gap_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                   ORDER BY ABS(epoch_us(p.p_ts) - epoch_us(c.c_ts)) ASC,
                            c.click_id ASC) AS rn
        FROM p JOIN c ON c.user_id = p.user_id
    )
    SELECT p.event_id,
           r.click_id,
           CAST(r.gap_us AS BIGINT) AS gap_us
    FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each purchase pairs with the click closest in
    time EITHER side, signed gap reported, ties broken on the smaller
    click id — the completion of the as-of family beside the backward
    form (``join_asof``) and the banded range join.

    Relationally: a LEFT equi-join on the user key fans each purchase
    out to that user's clicks only (bounded per-key work, never a
    time-only cross join; clickless purchases keep one null row), then a
    per-purchase argmin window picks the nearest — the null row ranks
    first exactly when it is the only row, so no join-back against the
    purchase side is needed (the join-back form scanned events a third
    time). Both sides shuffle once — co-located under user bucketing; a
    time-banded pre-filter (join only ±N days) bounds per-key fan-out
    when keys are hot.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    w = Window.partitionBy("event_id").orderBy(F.abs(gap).asc(), F.asc("click_id"))
    return (
        p.join(c, p["user_id"] == c["c_user"], "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "click_id", gap.alias("gap_us"))
    )


# cdc_snapshot_diff's deterministic "version B" mutation rules — the
# simulated drift between two snapshots of the same table. Derived
# IDENTICALLY in both engines, so every diff count is exact.
CDC_DEL_MOD = 41  # keys removed in B
CDC_PRICE_MOD = 37  # surviving keys whose totalprice moved (+1.00)
CDC_PRIO_MOD = 39  # surviving keys whose orderpriority was reclassed
CDC_INS_MOD = 43  # keys whose clone (key + 1e9) was inserted in B


@register(
    "cdc_snapshot_diff",
    category="relational",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               o_orderpriority AS prio
        FROM orders
    ),
    b AS (
        SELECT k, status,
               CASE WHEN k % {CDC_PRICE_MOD} = 0 THEN cents + 100
                    ELSE cents END AS cents,
               CASE WHEN k % {CDC_PRIO_MOD} = 0 THEN '9-RECLASS'
                    ELSE prio END AS prio
        FROM a WHERE k % {CDC_DEL_MOD} != 0
        UNION ALL
        SELECT k + 1000000000, status, cents, prio
        FROM a WHERE k % {CDC_INS_MOD} = 0
    ),
    d AS (
        SELECT COALESCE(a.status, b.status) AS status,
               CASE WHEN a.k IS NULL THEN 'added'
                    WHEN b.k IS NULL THEN 'removed'
                    WHEN a.cents != b.cents OR a.prio != b.prio
                        THEN 'changed'
                    ELSE 'unchanged' END AS verdict,
               CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND a.cents != b.cents THEN 1 ELSE 0 END AS pc,
               CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND a.prio != b.prio THEN 1 ELSE 0 END AS rc
        FROM a FULL OUTER JOIN b USING (k)
    )
    SELECT status,
           CAST(SUM(CASE WHEN verdict != 'added' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN verdict != 'removed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END)
                AS BIGINT) AS added,
           CAST(SUM(CASE WHEN verdict = 'removed' THEN 1 ELSE 0 END)
                AS BIGINT) AS removed,
           CAST(SUM(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END)
                AS BIGINT) AS changed,
           CAST(SUM(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END)
                AS BIGINT) AS unchanged,
           CAST(SUM(pc) AS BIGINT) AS price_changes,
           CAST(SUM(rc) AS BIGINT) AS priority_changes,
           CAST(SUM(pc * rc) AS BIGINT) AS both_changes
    FROM d GROUP BY status
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the "data diff" audit): given two
    versions of a keyed table, classify every key as
    added/removed/changed/unchanged and attribute CHANGED rows to the
    columns that moved — the report a CDC pipeline or a migration
    cutover writes before declaring two tables equivalent.
    cdc_upsert_merge implements the MERGE that applies a delta; this is
    the inverse direction — derive the delta (and catch unintended
    drift) from two materialized snapshots when no change log exists.

    Version B is a deterministic mutation of version A (deletes /
    price bumps / priority reclasses / key-shifted inserts on disjoint
    modular classes — constants frozen in the oracle f-string), so
    every count is exact. Money compares in exact cents; column
    attribution is explicit per-column comparison, never an engine-
    specific row hash (cross-engine hashes can't match).

    Scale: ONE shuffle — the full outer join co-partitions both
    snapshots on the key; every verdict and per-column comparison is a
    map-side expression on the joined row, and the output collapses to
    #status rows. At 100 TB: diff cost = one co-partitioned pass, the
    same join a MERGE would pay anyway; no row ever leaves the executor
    un-aggregated.
    """
    o = load_table(spark, sf_dir, "orders")
    # persisted: version B is DERIVED from A here (three consumers — the
    # A side, B's mutation branch, B's insert branch), so one scan feeds
    # all of them; with two real physical snapshots each side is one scan
    a = tracked_persist(
        o.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    survivors = a.filter(F.col("k") % CDC_DEL_MOD != 0)
    b = survivors.select(
        "k",
        "status",
        F.when(F.col("k") % CDC_PRICE_MOD == 0, F.col("cents") + 100)
        .otherwise(F.col("cents"))
        .alias("cents"),
        F.when(F.col("k") % CDC_PRIO_MOD == 0, F.lit("9-RECLASS"))
        .otherwise(F.col("prio"))
        .alias("prio"),
    ).unionByName(
        a.filter(F.col("k") % CDC_INS_MOD == 0).select(
            (F.col("k") + F.lit(1_000_000_000)).alias("k"),
            "status", "cents", "prio",
        )
    )
    ak = a.select(
        "k",
        F.col("status").alias("a_status"),
        F.col("cents").alias("a_cents"),
        F.col("prio").alias("a_prio"),
    )
    bk = b.select(
        "k",
        F.col("status").alias("b_status"),
        F.col("cents").alias("b_cents"),
        F.col("prio").alias("b_prio"),
    )
    both = F.col("a_status").isNotNull() & F.col("b_status").isNotNull()
    d = ak.join(bk, "k", "full_outer").select(
        F.coalesce("a_status", "b_status").alias("status"),
        F.when(F.col("a_status").isNull(), "added")
        .when(F.col("b_status").isNull(), "removed")
        .when(
            (F.col("a_cents") != F.col("b_cents"))
            | (F.col("a_prio") != F.col("b_prio")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("verdict"),
        F.when(both & (F.col("a_cents") != F.col("b_cents")), 1)
        .otherwise(0)
        .alias("pc"),
        F.when(both & (F.col("a_prio") != F.col("b_prio")), 1)
        .otherwise(0)
        .alias("rc"),
    )
    v = F.col("verdict")
    return d.groupBy("status").agg(
        F.sum(F.when(v != "added", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(v != "removed", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(v == "added", 1).otherwise(0)).cast("long").alias("added"),
        F.sum(F.when(v == "removed", 1).otherwise(0)).cast("long")
        .alias("removed"),
        F.sum(F.when(v == "changed", 1).otherwise(0)).cast("long")
        .alias("changed"),
        F.sum(F.when(v == "unchanged", 1).otherwise(0)).cast("long")
        .alias("unchanged"),
        F.sum("pc").cast("long").alias("price_changes"),
        F.sum("rc").cast("long").alias("priority_changes"),
        F.sum(F.col("pc") * F.col("rc")).cast("long").alias("both_changes"),
    )
