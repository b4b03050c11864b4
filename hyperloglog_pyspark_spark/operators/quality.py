"""Data-quality and governance operators: declarative constraint audits,
referential-integrity checks, k-anonymity risk scoring, snapshot diffing
(CDC), freshness watermarks, and histogram profiling.

This is the "expectations" layer a 100 TB ingestion pipeline runs on
every batch before data is allowed downstream (the role Deequ/Great
Expectations play): each operator emits a small audit TABLE — one row per
rule / relation / class / change-type — that a scheduler can assert on.
The reference at /root/reference/ has no counterpart (it is an HLL sketch
library, HLL/HyperLogLog.py); this extends the SURVEY.md §2.2 north-star
pipeline surface.

Scale posture (100 TB):
- Constraint audits are ONE conditional-aggregation pass per table
  (violations counted with `sum(case when ...)`) — never one scan per
  rule; rule rows are exploded from the single wide agg row, the same
  one-scan trick as ``profile_table``.
- Referential checks broadcast the parent key set when the parent is a
  dimension (part/supplier/customer) and fall back to a shuffled
  left-anti join when both sides are fact-scale (lineitem→orders) —
  the planner's sort-merge anti join, the only shape that works when
  neither side fits in memory.
- The snapshot diff is a single full-outer join on the snapshot key with
  column-level null-safe comparison; money deltas are summed in DECIMAL
  (exact, order-independent) so the audit hash-matches any engine.
- Nothing here collects to the driver; every output is bounded by
  #rules / #relations / #classes / #bins, not by data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import literal_frame, load_table

# ---------------------------------------------------------------------------
# Constraint audit: (table, rule, violation predicate). The predicate is
# authored ONCE as an ANSI boolean expression string valid in both Spark
# SQL and DuckDB — the Spark side wraps it in expr(), the oracle inlines
# it — so the two engines cannot drift on what a "violation" means.
# ---------------------------------------------------------------------------

_RULES: dict[str, list[tuple[str, str]]] = {
    "lineitem": [
        ("quantity_in_1_50", "l_quantity < 1 OR l_quantity > 50"),
        ("discount_le_5pct", "l_discount > 0.05"),
        ("price_positive", "l_extendedprice IS NULL OR l_extendedprice <= 0"),
    ],
    "orders": [
        ("status_in_domain", "o_orderstatus NOT IN ('O', 'F', 'P')"),
        ("totalprice_le_100k", "o_totalprice > 100000"),
        ("custkey_present", "o_custkey IS NULL"),
    ],
    "customer": [
        ("acctbal_nonnegative", "c_acctbal < 0"),
        ("name_present", "c_name IS NULL OR c_name = ''"),
    ],
    "events": [
        ("value_positive", "value IS NULL OR value <= 0"),
        ("props_has_k", "get_json_object(props, '$.k') IS NULL"),
    ],
}

# get_json_object is Spark's spelling; DuckDB's is json_extract. Same
# null-on-missing semantics, translated only in the oracle text.
_DUCK_REWRITES = {"get_json_object(props, '$.k')": "json_extract(props, '$.k')"}


def _duck_pred(pred: str) -> str:
    for spark_form, duck_form in _DUCK_REWRITES.items():
        pred = pred.replace(spark_form, duck_form)
    return pred


def _audit_oracle() -> str:
    parts = []
    for tbl, rules in _RULES.items():
        for rule, pred in rules:
            parts.append(f"""
    SELECT '{tbl}' AS tbl, '{rule}' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN {_duck_pred(pred)} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_viol,
           ROUND(COALESCE(SUM(CASE WHEN {_duck_pred(pred)} THEN 1 ELSE 0 END), 0) * 1.0 / COUNT(*), 6) AS viol_rate,
           COALESCE(SUM(CASE WHEN {_duck_pred(pred)} THEN 1 ELSE 0 END), 0) = 0 AS passed
    FROM {tbl}""")
    return " UNION ALL ".join(parts)


@register("quality_constraint_audit", category="quality", bench=True, oracle=_audit_oracle())
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit: one row per (table, rule) with checked
    count, violation count/rate, and a pass verdict — the per-batch data
    contract every ingestion pipeline asserts before publishing.

    One conditional-aggregation scan per table (all of that table's rules
    counted in a single wide agg row, exploded to rule rows) — rule count
    adds columns to one pass, never extra scans. Predicates are shared
    strings compiled into BOTH engines, so the audit itself can't drift.
    """
    frames = []
    for tbl, rules in _RULES.items():
        t = load_table(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for rule, pred in rules:
            aggs.append(
                F.coalesce(
                    F.sum(F.when(F.expr(pred), 1).otherwise(0)), F.lit(0)
                ).alias(f"v__{rule}")
            )
        wide = t.agg(*aggs)
        rows = [
            F.struct(
                F.lit(tbl).alias("tbl"),
                F.lit(rule).alias("rule"),
                F.col("n_rows"),
                F.col(f"v__{rule}").alias("n_viol"),
                F.round(F.col(f"v__{rule}") / F.col("n_rows"), 6).alias("viol_rate"),
                (F.col(f"v__{rule}") == 0).alias("passed"),
            )
            for rule, _ in rules
        ]
        frames.append(
            wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# Referential integrity: orphaned foreign keys + coverage gaps.
# ---------------------------------------------------------------------------

# (relation label, child table, child key, parent table, parent key,
#  parent is broadcastable dimension)
_FKS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey", True),
]


def _orphans_oracle() -> str:
    parts = [
        f"""
    SELECT '{label}' AS relation, 'integrity' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_orphans,
           COUNT(*) = 0 AS intact
    FROM {child} c
    WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey})"""
        for label, child, ckey, parent, pkey, _ in _FKS
    ]
    parts.append("""
    SELECT 'customer_without_orders' AS relation, 'coverage' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_orphans,
           COUNT(*) = 0 AS intact
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")
    return " UNION ALL ".join(parts)


@register(
    "quality_referential_orphans", category="quality", bench=True,
    oracle=_orphans_oracle(),
)
def quality_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit: orphan count per declared relation
    (child keys with no parent), plus a coverage row (parents with no
    children — not a violation, but the metric that catches a silently
    empty join feed).

    The FK checks are grouped BY CHILD TABLE so each child is scanned
    once: all of a child's parent key sets are chained as left outer
    joins onto the one scan (dimension parents broadcast; the fact-fact
    edge lineitem→orders left to the planner's shuffled join — the only
    shape that survives when neither side fits in memory), then every
    relation's orphan count falls out of one conditional aggregation
    over the join markers — sum(parent key IS NULL) — and the per-rule
    rows are exploded from that single wide agg row, the same one-scan
    trick as the constraint audit above. An anti-join-per-FK would scan
    the 100 TB lineitem three times; this scans it once. A left join on
    a DISTINCT parent key set counts exactly what the anti join counts
    (no fan-out, NULL child keys match nothing on either form).
    """
    by_child: dict[str, list[tuple[str, str, str, bool]]] = {}
    for label, child, ckey, parent, pkey, small_parent in _FKS:
        by_child.setdefault(child, []).append((label, ckey, parent, pkey, small_parent))

    frames = []
    for child, checks in by_child.items():
        joined = load_table(spark, sf_dir, child)
        for i, (_, ckey, parent, pkey, small_parent) in enumerate(checks):
            marker = f"__pk_{i}"
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pkey).alias(marker))
                .distinct()
            )
            if small_parent:
                p = F.broadcast(p)
            joined = joined.join(p, joined[ckey] == p[marker], "left_outer")
        # coalesce: sum over an EMPTY child is NULL, but an empty feed has
        # zero orphans (and the oracle's COUNT(*) says 0) — the exact
        # "silently empty join feed" case this audit exists to surface
        wide = joined.agg(*[
            F.coalesce(
                F.sum(F.when(F.col(f"__pk_{i}").isNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n_{i}")
            for i in range(len(checks))
        ])
        rows = [
            F.struct(
                F.lit(label).alias("relation"),
                F.lit("integrity").alias("kind"),
                F.col(f"n_{i}").alias("n_orphans"),
                (F.col(f"n_{i}") == 0).alias("intact"),
            )
            for i, (label, _, _, _, _) in enumerate(checks)
        ]
        frames.append(
            wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    childless = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    frames.append(
        childless.agg(F.count(F.lit(1)).alias("n_orphans")).select(
            F.lit("customer_without_orders").alias("relation"),
            F.lit("coverage").alias("kind"),
            F.col("n_orphans"),
            (F.col("n_orphans") == 0).alias("intact"),
        )
    )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# k-anonymity over quasi-identifiers.
# ---------------------------------------------------------------------------

K_ANON = 10  # minimum safe equivalence-class size


@register(
    "quality_k_anonymity",
    category="quality",
    oracle=f"""
    SELECT CAST(c_nationkey AS INTEGER) AS nationkey, c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) < {K_ANON} AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk audit over the (nation, market-segment) quasi-
    identifier pair: every equivalence class with fewer than K members is
    re-identifiable and flagged ``at_risk`` — the table a privacy review
    uses to decide suppression/generalization before a dataset ships.

    One groupBy on the QI columns (output bounded by the QI domain
    product, 25×5 here — never by row count); the flag is a map-side
    comparison on the aggregated size.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
    ).withColumn("at_risk", F.col("class_size") < K_ANON)


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions).
# ---------------------------------------------------------------------------

_V1_CUT = "1999-01-01"
_V2_CUT = "2000-01-01"
_DEL_MOD = 97  # o_orderkey % 97 == 13 → deleted in v2
_UPD_MOD = 89  # o_orderkey % 89 == 7  → price bumped in v2
_UPD_DELTA = 1000.0


def _snapshot_sql(version: int) -> str:
    """v1 = orders before _V1_CUT; v2 = v1 minus deterministic deletes,
    with deterministic price updates, plus the next date range (inserts)."""
    if version == 1:
        return f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderdate < TIMESTAMP '{_V1_CUT}'"""
    return f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % {_UPD_MOD} = 7
                    AND o_orderdate < TIMESTAMP '{_V1_CUT}'
                    THEN o_totalprice + {_UPD_DELTA}
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderdate < TIMESTAMP '{_V2_CUT}'
          AND NOT (o_orderkey % {_DEL_MOD} = 13
                   AND o_orderdate < TIMESTAMP '{_V1_CUT}')"""


@register(
    "snapshot_diff_cdc",
    category="quality",
    oracle=f"""
    WITH v1 AS ({_snapshot_sql(1)}),
    v2 AS ({_snapshot_sql(2)}),
    d AS (
        SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS okey,
               CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                    WHEN v2.o_orderkey IS NULL THEN 'delete'
                    WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
                      OR v1.o_custkey IS DISTINCT FROM v2.o_custkey
                      OR v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
                    THEN 'update' ELSE 'unchanged' END AS change_type,
               CAST(COALESCE(v2.o_totalprice, 0) AS DECIMAL(18, 2))
                 - CAST(COALESCE(v1.o_totalprice, 0) AS DECIMAL(18, 2)) AS delta
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(okey) AS BIGINT) AS min_key, CAST(MAX(okey) AS BIGINT) AS max_key,
           CAST(SUM(delta) AS DOUBLE) AS price_delta
    FROM d GROUP BY change_type
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-capture audit: given two versions of a
    table (v2 derived from v1 by deterministic inserts, deletes, and price
    updates), classify every key as insert/delete/update/unchanged via ONE
    full-outer join on the snapshot key with null-safe column comparison,
    and report per-class row counts, key range, and the exact DECIMAL
    money delta — the reconciliation table a lakehouse CDC feed publishes
    with every commit.

    One co-partitioned full-outer join (both sides shuffle on the same
    key — at 100 TB, bucketed snapshot storage makes this exchange-free);
    the money delta is summed in DECIMAL so it is order-independent and
    hash-matches any engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderdate") < F.lit(_V1_CUT).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    v2 = (
        orders.filter(
            (F.col("o_orderdate") < F.lit(_V2_CUT).cast("timestamp"))
            & ~(
                (F.pmod("o_orderkey", F.lit(_DEL_MOD)) == 13)
                & (F.col("o_orderdate") < F.lit(_V1_CUT).cast("timestamp"))
            )
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.when(
                (F.pmod("o_orderkey", F.lit(_UPD_MOD)) == 7)
                & (F.col("o_orderdate") < F.lit(_V1_CUT).cast("timestamp")),
                F.col("o_totalprice") + F.lit(_UPD_DELTA),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    a = v1.select(*[F.col(c).alias(f"a_{c}") for c in v1.columns])
    b = v2.select(*[F.col(c).alias(f"b_{c}") for c in v2.columns])
    joined = a.join(b, a["a_o_orderkey"] == b["b_o_orderkey"], "full_outer")

    def differs(col: str) -> Column:
        return ~F.col(f"a_{col}").eqNullSafe(F.col(f"b_{col}"))

    d = joined.select(
        F.coalesce("a_o_orderkey", "b_o_orderkey").alias("okey"),
        F.when(F.col("a_o_orderkey").isNull(), "insert")
        .when(F.col("b_o_orderkey").isNull(), "delete")
        .when(
            differs("o_totalprice") | differs("o_custkey") | differs("o_orderstatus"),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("b_o_totalprice", F.lit(0)).cast("decimal(18,2)")
            - F.coalesce("a_o_totalprice", F.lit(0)).cast("decimal(18,2)")
        ).alias("delta"),
    )
    return d.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("okey").alias("min_key"),
        F.max("okey").alias("max_key"),
        F.sum("delta").cast("double").alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# Freshness watermarks.
# ---------------------------------------------------------------------------


@register(
    "quality_freshness_watermark",
    category="quality",
    bench=True,
    oracle="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS last_seen_ms,
           CAST((epoch_ms((SELECT gmax FROM g)) - epoch_ms(MAX(ts))) // 60000 AS BIGINT)
               AS lag_minutes,
           CAST(COALESCE(SUM(CASE WHEN ts >= (SELECT gmax FROM g) - INTERVAL 24 HOURS
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_last_24h
    FROM events
    GROUP BY event_type
    """,
)
def quality_freshness_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: for every event type, the last-seen
    watermark (epoch millis), its lag behind the most recent event in the
    whole feed (whole minutes), and the last-24h volume — the staleness
    table an on-call dashboard alerts on when one upstream stops emitting.

    One pass computes the per-type aggregates (persisted at |types|
    size); the global max is an agg over THAT tiny frame — not a second
    fact scan — broadcast back. Only the exact last-24h count pays a
    second scan of the stream (its cutoff needs gmax, which no single
    pass can know); total: two fact scans, was three.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = tracked_persist(
        ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("max_ts"),
            F.max(F.unix_millis("ts")).alias("last_seen_ms"),
        )
    )
    gmax = per_type.agg(F.max("max_ts").alias("gmax"))
    last24 = (
        ev.join(F.broadcast(gmax))
        .filter(F.col("ts") >= F.col("gmax") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(F.col("event_type").alias("et24"))
        .agg(F.count(F.lit(1)).alias("n_last_24h"))
    )
    base = per_type.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        "n_events",
        "last_seen_ms",
        F.expr("(unix_millis(gmax) - last_seen_ms) div 60000").alias("lag_minutes"),
    )
    return (
        # null-SAFE key match: a NULL event_type group exists on both
        # sides (the oracle's GROUP BY keeps it as one group and counts
        # its 24h rows); a plain equi-join can never match NULL = NULL
        # and would zero that group's n_last_24h
        base.join(last24, base["event_type"].eqNullSafe(last24["et24"]), "left")
        .select(
            "event_type",
            "n_events",
            "last_seen_ms",
            "lag_minutes",
            F.coalesce("n_last_24h", F.lit(0)).alias("n_last_24h"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram profiling.
# ---------------------------------------------------------------------------

_HIST_LO = 900.0
_HIST_HI = 105000.0
_HIST_NB = 20


@register(
    "agg_histogram_equiwidth",
    category="aggregate",
    bench=True,
    oracle=f"""
    SELECT CAST(LEAST(FLOOR((l_extendedprice - {_HIST_LO}) * {_HIST_NB}
                            / ({_HIST_HI} - {_HIST_LO})), {_HIST_NB - 1}) AS BIGINT) AS bin,
           ROUND({_HIST_LO} + LEAST(FLOOR((l_extendedprice - {_HIST_LO}) * {_HIST_NB}
                 / ({_HIST_HI} - {_HIST_LO})), {_HIST_NB - 1})
                 * ({_HIST_HI} - {_HIST_LO}) / {_HIST_NB}, 2) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of line-item price (20 fixed bins with a
    clamped top bin): per-bin row count and exact DECIMAL quantity mass —
    the numeric-profile building block for drift detection between data
    batches (compare two runs' bin vectors).

    Bin assignment is pure map-side arithmetic (identical IEEE ops in
    both engines — no rounding ambiguity), so the histogram is ONE
    aggregation over #bins groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    width_expr = f"(l_extendedprice - {_HIST_LO}) * {_HIST_NB} / ({_HIST_HI} - {_HIST_LO})"
    binc = F.least(F.floor(F.expr(width_expr)), F.lit(_HIST_NB - 1)).cast("long")
    return (
        li.select(
            binc.alias("bin"),
            F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").cast("double").alias("sum_qty"),
        )
        .withColumn(
            "bin_lo",
            F.round(
                F.lit(_HIST_LO)
                + F.col("bin") * (_HIST_HI - _HIST_LO) / _HIST_NB,
                2,
            ),
        )
        .select("bin", "bin_lo", "n_rows", "sum_qty")
    )


# ---------------------------------------------------------------------------
# Population Stability Index (distribution drift between two periods).
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16"  # period A = before, period B = from this date on
_PSI_NB = 10
_PSI_BIN_CENTS = 5000  # equi-width bins over value cents [0, 50000)


@register(
    "quality_psi_drift",
    category="quality",
    bench=True,
    oracle=f"""
    WITH obs AS (
        SELECT LEAST(CAST(ROUND(value * 100, 0) AS BIGINT) // {_PSI_BIN_CENTS},
                     {_PSI_NB - 1}) AS bin,
               CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'a' ELSE 'b' END AS period
        FROM events
    ),
    counts AS (
        SELECT bin,
               SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS n_b
        FROM obs GROUP BY bin
    ),
    tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM counts),
    frac AS (
        SELECT bin, n_a, n_b,
               (n_a + 1.0) / ((SELECT t_a FROM tot) + {_PSI_NB}) AS p,
               (n_b + 1.0) / ((SELECT t_b FROM tot) + {_PSI_NB}) AS q
        FROM counts
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND((p - q) * LN(p / q), 6) AS psi_term,
           ROUND(SUM((p - q) * LN(p / q)) OVER (), 6) AS psi_total
    FROM frac
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two time periods of the event
    value distribution: per-bin (p−q)·ln(p/q) terms plus the summed PSI —
    the standard ML-monitoring drift score (rule of thumb: PSI < 0.1
    stable, > 0.25 action required). Laplace-smoothed (+1 per bin) so an
    empty bin can't produce ±inf.

    Bin assignment is integer arithmetic on exact cents; counting both
    periods is ONE conditional aggregation over #bins groups (never two
    scans); the period totals, smoothed fractions, and summed PSI are
    all window sums over the same {_PSI_NB}-row bin table (a separate
    totals agg + broadcast-back re-embedded the fact scan a second
    time). At 100 TB the scan dominates and everything after it is
    constant-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        F.least(
            F.expr(f"cast(round(value * 100, 0) as bigint) div {_PSI_BIN_CENTS}"),
            F.lit(_PSI_NB - 1),
        ).alias("bin"),
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("in_a"),
    )
    counts = obs.groupBy("bin").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        # otherwise(1), NOT when(~in_a): a NULL ts makes in_a NULL, and
        # ~NULL is NULL — the row would land in NEITHER period while the
        # oracle's CASE ... ELSE 'b' assigns it to b
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("n_b"),
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    frac = counts.select(
        "bin",
        "n_a",
        "n_b",
        ((F.col("n_a") + 1.0) / (F.sum("n_a").over(w_all) + _PSI_NB)).alias("p"),
        ((F.col("n_b") + 1.0) / (F.sum("n_b").over(w_all) + _PSI_NB)).alias("q"),
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return frac.select(
        F.col("bin").cast("long").alias("bin"),
        "n_a",
        "n_b",
        F.round(term, 6).alias("psi_term"),
        F.round(
            F.sum(term).over(Window.partitionBy()), 6
        ).alias("psi_total"),
    )


# Two-sample KS critical factor at alpha = 0.05: c² = −ln(α/2)/2 =
# 1.844439…, held as an exact micro-unit integer so the significance
# compare is pure integer arithmetic (no sqrt at decision time).
KS_CRIT_SQ_MICRO = 1_844_440


@register(
    "quality_ks_drift",
    category="quality",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
               CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS in_a
        FROM events WHERE value IS NOT NULL
    ),
    counts AS (
        SELECT event_type, c,
               SUM(in_a) AS n_a, SUM(1 - in_a) AS n_b
        FROM obs GROUP BY event_type, c
    ),
    stepped AS (
        SELECT event_type,
               CAST(SUM(n_a) OVER (PARTITION BY event_type ORDER BY c
                    ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cc_a,
               CAST(SUM(n_b) OVER (PARTITION BY event_type ORDER BY c
                    ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cc_b,
               CAST(SUM(n_a) OVER (PARTITION BY event_type) AS HUGEINT) AS t_a,
               CAST(SUM(n_b) OVER (PARTITION BY event_type) AS HUGEINT) AS t_b
        FROM counts
    ),
    agg AS (
        SELECT event_type, MAX(t_a) AS t_a, MAX(t_b) AS t_b,
               CAST(MAX(ABS(cc_a * t_b - cc_b * t_a)) AS HUGEINT) AS d_num
        FROM stepped GROUP BY event_type
    ),
    ksd AS (
        SELECT event_type, t_a, t_b,
               CAST((2 * d_num * 1000000 + t_a * t_b)
                    // (2 * NULLIF(t_a * t_b, 0)) AS BIGINT) AS ks_micro
        FROM agg
    )
    SELECT event_type,
           CAST(t_a AS BIGINT) AS n_a, CAST(t_b AS BIGINT) AS n_b,
           ks_micro,
           CAST(ks_micro AS DOUBLE) / 1000000 AS ks,
           CAST(ks_micro AS HUGEINT) * ks_micro * (t_a * t_b)
               > {KS_CRIT_SQ_MICRO} * (t_a + t_b) * CAST(1000000 AS HUGEINT)
               AS significant
    FROM ksd
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test per event type between
    the same two periods quality_psi_drift monitors — the exact
    nonparametric complement to PSI's binned, Laplace-smoothed score:
    KS = max |ECDF_a − ECDF_b| sees shape changes PSI's coarse bins
    blur, needs no bin or smoothing knobs, and carries a proper
    significance threshold (α = 0.05 asymptotic:
    D > c(α)·√((n_a+n_b)/(n_a·n_b)), c² = −ln(α/2)/2).

    Determinism: the ECDF difference is computed as the exact integer
    cross-multiplication |cc_a·t_b − cc_b·t_a| in decimal(38,0)/HUGEINT
    (counts to 1e12 rows per side stay exact), its max half-up
    micro-rounded in exact integer division, and the significance
    verdict compares ks_micro²·n_a·n_b against c²·(n_a+n_b) in pure
    integers — no sqrt, no double anywhere before the reported ks
    value (an exact small-int cast). A type absent from one period
    yields NULL ks/verdict on both engines (NULLIF), never a
    divide-by-zero. NULL values are not observations (filtered
    identically); NULL timestamps land in period b, matching PSI.

    Scale: one conditional count per (event_type, cents value) —
    map-side combine — then cumulative windows over the per-type
    DISTINCT-VALUE frame (2-dp cents on a bounded domain: ~1e5-1e6
    rows per type, domain-bounded, never row-scale) and a per-type
    max. At 100 TB the scan is the cost; the ECDF frames are
    metadata."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    obs = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("cast(round(value * 100, 0) as bigint)").alias("c"),
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("in_a"),
    )
    counts = obs.groupBy("event_type", "c").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("n_b"),
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = counts.select(
        "event_type",
        F.sum("n_a").over(wc).cast(dec).alias("cc_a"),
        F.sum("n_b").over(wc).cast(dec).alias("cc_b"),
        F.sum("n_a").over(wt).cast(dec).alias("t_a"),
        F.sum("n_b").over(wt).cast(dec).alias("t_b"),
    )
    diff = F.abs(F.col("cc_a") * F.col("t_b") - F.col("cc_b") * F.col("t_a"))
    agg = stepped.groupBy("event_type").agg(
        F.max("t_a").alias("t_a"),
        F.max("t_b").alias("t_b"),
        F.max(diff).cast(dec).alias("d_num"),
    )
    ksd = agg.select(
        "event_type", "t_a", "t_b",
        F.expr(
            "(2 * d_num * 1000000 + t_a * t_b) div "
            "(2 * nullif(t_a * t_b, 0))"
        ).cast("long").alias("ks_micro"),
    )
    return ksd.select(
        "event_type",
        F.col("t_a").cast("long").alias("n_a"),
        F.col("t_b").cast("long").alias("n_b"),
        "ks_micro",
        (F.col("ks_micro").cast("double") / F.lit(1_000_000.0)).alias("ks"),
        (
            F.col("ks_micro").cast(dec) * F.col("ks_micro")
            * (F.col("t_a") * F.col("t_b"))
            > F.lit(KS_CRIT_SQ_MICRO).cast(dec)
            * (F.col("t_a") + F.col("t_b")) * F.lit(1_000_000)
        ).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Join-explosion pre-audit (cardinality forecast from per-key counts).
# ---------------------------------------------------------------------------


@register(
    "join_explosion_audit",
    category="quality",
    oracle="""
    WITH ca AS (SELECT o_custkey AS k, COUNT(*) AS n_a FROM orders GROUP BY o_custkey),
    cb AS (SELECT user_id AS k, COUNT(*) AS n_b FROM events GROUP BY user_id),
    j AS (SELECT ca.k, ca.n_a * cb.n_b AS contrib FROM ca JOIN cb USING (k)),
    actual AS (
        SELECT COUNT(*) AS n FROM orders o JOIN events e ON o.o_custkey = e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_keys,
           CAST(SUM(contrib) AS BIGINT) AS predicted_rows,
           CAST((SELECT n FROM actual) AS BIGINT) AS actual_rows,
           SUM(contrib) = (SELECT n FROM actual) AS prediction_exact,
           ROUND(MAX(contrib) * 1.0 / SUM(contrib), 6) AS max_key_share
    FROM j
    """,
)
def join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-audit: forecast |A ⋈ B| from per-key counts
    (Σ nₐ·n_b over shared keys) BEFORE running the join, plus the hottest
    key's share of the output — the guard a pipeline runs to catch an
    explosive many-to-many join while it still costs two cheap group-bys
    instead of a cluster-filling shuffle. The actual join count is
    computed alongside to prove the forecast exact (with per-key counts
    it is an identity; swap in CMS/HLL per-key summaries for a sketched
    forecast at vocabulary scale).

    Scale: the forecast side is two key group-bys + a key-sized join —
    orders of magnitude cheaper than materializing a blown-up join; a
    max_key_share near 1.0 says 'salt this key before joining'.
    """
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("n_a"))
    cb = ev.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("n_b"))
    j = ca.join(cb, "k").select("k", (F.col("n_a") * F.col("n_b")).alias("contrib"))
    forecast = j.agg(
        F.count(F.lit(1)).alias("n_shared_keys"),
        F.sum("contrib").alias("predicted_rows"),
        F.max("contrib").alias("max_contrib"),
    )
    actual = (
        orders.join(ev, orders["o_custkey"] == ev["user_id"])
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return forecast.crossJoin(F.broadcast(actual)).select(
        "n_shared_keys",
        "predicted_rows",
        "actual_rows",
        (F.col("predicted_rows") == F.col("actual_rows")).alias("prediction_exact"),
        F.round(F.col("max_contrib") / F.col("predicted_rows"), 6).alias("max_key_share"),
    )


# ---------------------------------------------------------------------------
# Metadata drift between two periods (schema-level statistics).
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"
_DRIFT_COLS = ["event_type", "value", "props", "user_id"]
_DRIFT_RATE_EPS = 0.05  # null-rate change that counts as drift
_DRIFT_DISTINCT_LO, _DRIFT_DISTINCT_HI = 0.5, 2.0  # distinct-count ratio band


def _drift_oracle() -> str:
    parts = []
    for c in _DRIFT_COLS:
        parts.append(f"""
    SELECT '{c}' AS col,
           CAST(COUNT(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS n_a,
           CAST(COUNT(*) FILTER (ts >= TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS n_b,
           ROUND(SUM(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' AND {c} IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}'), 6) AS null_rate_a,
           ROUND(SUM(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' AND {c} IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) FILTER (ts >= TIMESTAMP '{_DRIFT_SPLIT}'), 6) AS null_rate_b,
           CAST(COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN {c} END) AS BIGINT)
               AS n_distinct_a,
           CAST(COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' THEN {c} END) AS BIGINT)
               AS n_distinct_b,
           (ABS(SUM(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' AND {c} IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}')
               - SUM(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' AND {c} IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) FILTER (ts >= TIMESTAMP '{_DRIFT_SPLIT}')) > {_DRIFT_RATE_EPS})
           OR (COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' THEN {c} END) * 1.0
               / COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN {c} END)
               NOT BETWEEN {_DRIFT_DISTINCT_LO} AND {_DRIFT_DISTINCT_HI}) AS drifted
    FROM events""")
    return " UNION ALL ".join(parts)


@register("quality_schema_drift", category="quality", oracle=_drift_oracle())
def quality_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata drift audit between two periods: per column, the null
    rate and distinct count in each period plus a drift verdict (null
    rate moved more than 5 points, or the distinct count halved/doubled)
    — the cheap schema-level complement to ``quality_psi_drift``'s
    value-distribution score, and the first alarm when an upstream field
    goes silently null or an enum explodes.

    One conditional-aggregation scan computes BOTH periods' statistics
    for every audited column (period membership is a predicate inside
    each aggregate, never two scans); output is #columns rows.
    """
    ev = load_table(spark, sf_dir, "events")
    in_a = F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")
    aggs = [
        F.sum(F.when(in_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~in_a, 1).otherwise(0)).alias("n_b"),
    ]
    for c in _DRIFT_COLS:
        aggs += [
            F.sum(F.when(in_a & F.col(c).isNull(), 1).otherwise(0)).alias(f"null_a__{c}"),
            F.sum(F.when(~in_a & F.col(c).isNull(), 1).otherwise(0)).alias(f"null_b__{c}"),
            F.count_distinct(F.when(in_a, F.col(c))).alias(f"nd_a__{c}"),
            F.count_distinct(F.when(~in_a, F.col(c))).alias(f"nd_b__{c}"),
        ]
    wide = ev.agg(*aggs)
    rows = []
    for c in _DRIFT_COLS:
        ra = F.col(f"null_a__{c}") * 1.0 / F.col("n_a")
        rb = F.col(f"null_b__{c}") * 1.0 / F.col("n_b")
        ratio = F.col(f"nd_b__{c}") * 1.0 / F.col(f"nd_a__{c}")
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                F.col("n_a"),
                F.col("n_b"),
                F.round(ra, 6).alias("null_rate_a"),
                F.round(rb, 6).alias("null_rate_b"),
                F.col(f"nd_a__{c}").alias("n_distinct_a"),
                F.col(f"nd_b__{c}").alias("n_distinct_b"),
                (
                    (F.abs(ra - rb) > _DRIFT_RATE_EPS)
                    | ~ratio.between(_DRIFT_DISTINCT_LO, _DRIFT_DISTINCT_HI)
                ).alias("drifted"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Candidate-key discovery (uniqueness audit over column combinations).
# ---------------------------------------------------------------------------

_KEY_CANDIDATES: list[tuple[str, ...]] = [
    ("event_id",),
    ("user_id", "ts"),
    ("user_id", "ts", "event_type"),
    ("user_id", "event_type"),
    ("ts",),
]


def _keys_oracle() -> str:
    parts = []
    for combo in _KEY_CANDIDATES:
        label = "+".join(combo)
        # ROW(...) forces struct distinct-semantics for 1-column combos
        # too: COUNT(DISTINCT (event_id)) parses as a PLAIN column and
        # drops NULLs, while Spark's count_distinct(struct(col)) counts
        # a NULL tuple as a value — verified: over (1, 2, NULL, NULL)
        # the bare form counts 2, ROW counts 3 like struct
        tup = "ROW(" + ", ".join(combo) + ")"
        parts.append(f"""
    SELECT '{label}' AS candidate,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {tup}) AS BIGINT) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT {tup}) AS is_key,
           CAST(COUNT(*) - COUNT(DISTINCT {tup}) AS BIGINT) AS n_dup_rows
    FROM events""")
    return " UNION ALL ".join(parts)


@register("quality_key_discovery", category="quality", oracle=_keys_oracle())
def quality_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: for each declared column combination, row
    count vs distinct count and a uniqueness verdict — the audit that
    finds (or refutes) a usable primary/dedup/merge key before anyone
    joins or upserts on it. A combination that LOOKS unique at one batch
    and isn't at the next is the classic silent-upsert corruption; this
    table is the guard.

    ONE scan computes every candidate's distinct count (all
    count_distincts live in a single wide aggregation, exploded to rows
    — the module's one-pass audit discipline); each distinct is over the
    column STRUCT, so a tuple containing NULLs counts as a value exactly
    like the oracle's COUNT(DISTINCT (a, b)) — plain multi-arg
    count_distinct would silently drop NULL-bearing rows and diverge on
    dirty data. Swap approx_count_distinct at 100 TB for a first pass
    and verify only the survivors exactly. Output is #candidates rows.
    """
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for combo in _KEY_CANDIDATES:
        label = "+".join(combo)
        aggs.append(
            F.count_distinct(F.struct(*[F.col(c) for c in combo])).alias(f"nd__{label}")
        )
    wide = ev.agg(*aggs)
    rows = [
        F.struct(
            F.lit("+".join(combo)).alias("candidate"),
            F.col("n_rows"),
            F.col(f"nd__{'+'.join(combo)}").alias("n_distinct"),
            (F.col("n_rows") == F.col(f"nd__{'+'.join(combo)}")).alias("is_key"),
            (F.col("n_rows") - F.col(f"nd__{'+'.join(combo)}")).alias("n_dup_rows"),
        )
        for combo in _KEY_CANDIDATES
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


GOV_K_ANON = 5  # groups smaller than this re-identify their members
# Generalization ladder: balance-bucket grains from finest to coarsest,
# each derived by re-flooring the FINEST bucket (floor(bal/100) — floor
# composes: floor(b100/10) = floor(bal/1000)), so every level reads the
# one persisted finest-grain count frame, never the corpus again.
_GKA_LEVELS = [
    ("nation+segment+bal_100", 1),
    ("nation+segment+bal_1000", 10),
    ("nation+segment+bal_10000", 100),
    ("nation+segment", None),
]


def _gka_level_sql(level: str, div: int | None) -> str:
    key = ("c_nationkey, c_mktsegment"
           if div is None else
           f"c_nationkey, c_mktsegment, CAST(FLOOR(b100 / {div}.0) AS BIGINT)")
    return f"""
        SELECT '{level}' AS level,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(cs) AS BIGINT) AS k_level,
               CAST(SUM(CASE WHEN cs < {GOV_K_ANON} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_risky_groups,
               CAST(SUM(CASE WHEN cs < {GOV_K_ANON} THEN cs ELSE 0 END)
                    AS BIGINT) AS rows_at_risk,
               CAST(round(SUM(CASE WHEN cs < {GOV_K_ANON} THEN cs ELSE 0 END)
                          * 1.0 / SUM(cs), 6) AS DOUBLE) AS risk_rate,
               MIN(cs) >= {GOV_K_ANON} AS satisfies_k
        FROM (SELECT CAST(SUM(cs) AS BIGINT) AS cs FROM finest GROUP BY {key})
    """


@register(
    "governance_k_anonymity",
    category="quality",
    oracle=f"""
    WITH finest AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS b100,
               CAST(COUNT(*) AS BIGINT) AS cs
        FROM customer GROUP BY 1, 2, 3
    )
    {" UNION ALL ".join(_gka_level_sql(lv, dv) for lv, dv in _GKA_LEVELS)}
    """,
)
def governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity GENERALIZATION LADDER (Sweeney 2002) — the decision
    layer over quality_k_anonymity's flat class-size audit: that
    operator reports which (nation, segment) classes are small; this
    one answers the question the privacy review actually asks — WHICH
    generalization grain of the continuous quasi-identifier first
    satisfies k. Four levels, finest to coarsest ($100 / $1000 /
    $10000 balance buckets, then dropping the balance entirely), each
    with its realized k (min class size), risky-class and at-risk-row
    counts at k = GOV_K_ANON (currently 5), and a satisfies_k verdict: release at
    the finest level whose verdict is true, or suppress.

    Determinism: counts are exact BIGINTs; the only doubles are the
    bucket floors (2-dp balances over 100.0/10.0 divisors — correctly
    rounded and floor'd identically on both engines, negatives
    included: floor(−0.99999) = −1, never a truncate-toward-zero
    integer `div` — both engines truncate identically, but truncation
    would misbucket small negatives into bucket 0 with the small
    positives, corrupting the class structure)
    and the final rounded rate of two exact integers.

    Scale: ONE partial+final count at the FINEST QI grain (map-side
    combine; the frame is domain-bounded — |nations| × |segments| ×
    |$100 buckets| — never row-scale, and persisted); every coarser
    level re-aggregates THAT frame by re-flooring the finest bucket
    (floor composes), so the ladder costs one corpus scan total plus
    metadata-sized arithmetic. At 100 TB nothing but the scan grows."""
    cust = load_table(spark, sf_dir, "customer")
    finest = tracked_persist(
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 100.0).cast("long").alias("b100"),
        ).agg(F.count(F.lit(1)).cast("long").alias("cs"))
    )
    out = None
    for level, div in _GKA_LEVELS:
        keys = ["c_nationkey", "c_mktsegment"]
        if div is not None:
            keys.append(
                F.floor(F.col("b100") / float(div)).cast("long").alias("bb")
            )
        classes = finest.groupBy(*keys).agg(
            F.sum("cs").cast("long").alias("cs")
        )
        risky = F.col("cs") < GOV_K_ANON
        row = classes.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("cs").cast("long").alias("k_level"),
            F.sum(F.when(risky, 1).otherwise(0)).cast("long")
            .alias("n_risky_groups"),
            F.sum(F.when(risky, F.col("cs")).otherwise(0)).cast("long")
            .alias("rows_at_risk"),
            F.sum("cs").cast("long").alias("n_total"),
        ).select(
            F.lit(level).alias("level"),
            "n_groups", "k_level", "n_risky_groups", "rows_at_risk",
            F.round(F.col("rows_at_risk") * 1.0 / F.col("n_total"), 6)
            .cast("double").alias("risk_rate"),
            (F.col("k_level") >= GOV_K_ANON).alias("satisfies_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out


ERASE_MOD = 97  # c_custkey % 97 == 0 → simulated right-to-be-forgotten set


@register(
    "governance_erasure_sweep",
    category="quality",
    bench=True,
    oracle=f"""
    WITH erased AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    ),
    eo AS (
        SELECT o.o_orderkey, e.c_custkey AS hit
        FROM orders o LEFT JOIN erased e ON o.o_custkey = e.c_custkey
    ),
    rows_per AS (
        SELECT 'customer' AS table_name,
               SUM(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS n_purged,
               COUNT(*) AS n_total
        FROM customer
        UNION ALL
        SELECT 'orders', SUM(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END), COUNT(*)
        FROM eo
        UNION ALL
        SELECT 'lineitem', SUM(CASE WHEN eo.hit IS NOT NULL THEN 1 ELSE 0 END), COUNT(*)
        FROM lineitem l JOIN eo ON l.l_orderkey = eo.o_orderkey
        UNION ALL
        SELECT 'events', SUM(CASE WHEN e.c_custkey IS NOT NULL THEN 1 ELSE 0 END), COUNT(*)
        FROM events ev LEFT JOIN erased e ON ev.user_id = e.c_custkey
    )
    SELECT table_name,
           CAST(n_purged AS BIGINT) AS n_purged,
           CAST(n_total - n_purged AS BIGINT) AS n_retained,
           CAST(round(n_purged * 1.0 / n_total, 6) AS DOUBLE) AS purge_fraction
    FROM rows_per
    """,
)
def governance_erasure_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact sweep: given an erasure-request set
    (here a deterministic ~1% of customers, modulus 97), count the rows
    each table would purge — directly keyed rows (customer, orders,
    events) and rows reached through a key chain (lineitem via the erased
    customers' orders). The audit every GDPR/CCPA deletion pipeline runs
    BEFORE rewriting data files, and the source of the purge manifest.

    Scale: the request set is persisted once (tiny — erasure queues are
    operationally bounded) and joined without a forced broadcast hint, so
    the planner broadcasts while it fits and degrades to a shuffle
    semi-join when a key fan-out outgrows memory — the hint-free form is
    what makes that degradation real. The directly-keyed tables pay one
    probe-folded scan each (customer's own row is a pure conditional
    aggregate, zero joins); the lineitem chain reuses the persisted
    (o_orderkey, hit) projection so orders is scanned once, not twice.
    Output is #tables rows."""
    erased = tracked_persist(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % ERASE_MOD == 0)
        .select("c_custkey")
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        hit = df.join(
            erased.withColumnRenamed("c_custkey", key).withColumn("hit", F.lit(1)),
            key,
            "left",
        )
        return hit.agg(
            F.lit(name).alias("table_name"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_purged"),
            F.count(F.lit(1)).alias("n_total"),
        )

    # Customer: the request predicate is on the table itself — one
    # conditional-aggregate scan, no join (mirrors the oracle exactly).
    cust_row = load_table(spark, sf_dir, "customer").agg(
        F.lit("customer").alias("table_name"),
        F.sum((F.col("c_custkey") % ERASE_MOD == 0).cast("long")).alias("n_purged"),
        F.count(F.lit(1)).alias("n_total"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # (o_orderkey, hit): one orders scan feeds the orders row AND the
    # lineitem chain (the oracle's eo CTE); thin 2-column persist.
    orders_flag = tracked_persist(
        orders.join(
            erased.withColumnRenamed("c_custkey", "o_custkey").withColumn(
                "hit", F.lit(1)
            ),
            "o_custkey",
            "left",
        ).select("o_orderkey", "hit")
    )
    orders_row = orders_flag.agg(
        F.lit("orders").alias("table_name"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_purged"),
        F.count(F.lit(1)).alias("n_total"),
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    # INNER join against ALL flagged orders, mirroring the oracle's
    # `lineitem JOIN eo`: n_total counts lineitems whose parent order
    # exists — a referential-orphan lineitem belongs to no erasure chain
    # and must not count (a left join against just the erased orders
    # kept orphans in n_total and diverged on dirty data)
    li_hit = li.join(
        orders_flag, li["l_orderkey"] == orders_flag["o_orderkey"]
    ).agg(
        F.lit("lineitem").alias("table_name"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_purged"),
        F.count(F.lit(1)).alias("n_total"),
    )
    ev = load_table(spark, sf_dir, "events").select("user_id")
    out = (
        cust_row
        .unionByName(orders_row)
        .unionByName(li_hit)
        .unionByName(audit(ev, "user_id", "events"))
    )
    return out.select(
        "table_name",
        F.col("n_purged").cast("long").alias("n_purged"),
        (F.col("n_total") - F.col("n_purged")).cast("long").alias("n_retained"),
        F.round(F.col("n_purged") * 1.0 / F.col("n_total"), 6)
        .cast("double")
        .alias("purge_fraction"),
    )


SAR_MOD = 131  # c_custkey % 131 == 0 → simulated subject-access request set


@register(
    "governance_subject_access",
    category="quality",
    oracle=f"""
    WITH subj AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey % {SAR_MOD} = 0
    ),
    so AS (
        SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o JOIN subj s ON o.o_custkey = s.c_custkey
    ),
    oagg AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_orderdate) AS first_order_date,
               MAX(o_orderdate) AS last_order_date,
               CAST(SUM(cents) AS BIGINT) AS total_spent_cents
        FROM so GROUP BY o_custkey
    ),
    liagg AS (
        SELECT so.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM lineitem l JOIN so ON l.l_orderkey = so.o_orderkey
        GROUP BY so.o_custkey
    ),
    evagg AS (
        SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.event_type) AS BIGINT)
                   AS n_event_types,
               CAST(date_trunc('day', MIN(e.ts)) AS DATE)
                   AS first_event_day,
               CAST(date_trunc('day', MAX(e.ts)) AS DATE)
                   AS last_event_day
        FROM events e JOIN subj s ON e.user_id = s.c_custkey
        GROUP BY e.user_id
    )
    SELECT s.c_custkey AS custkey, s.c_mktsegment AS mktsegment,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.first_order_date, DATE '1900-01-01')
               AS first_order_date,
           COALESCE(o.last_order_date, DATE '1900-01-01')
               AS last_order_date,
           COALESCE(o.total_spent_cents, 0) AS total_spent_cents,
           COALESCE(li.n_lineitems, 0) AS n_lineitems,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(e.n_event_types, 0) AS n_event_types,
           COALESCE(e.first_event_day, DATE '1900-01-01')
               AS first_event_day,
           COALESCE(e.last_event_day, DATE '1900-01-01')
               AS last_event_day
    FROM subj s
    LEFT JOIN oagg o ON o.o_custkey = s.c_custkey
    LEFT JOIN liagg li ON li.o_custkey = s.c_custkey
    LEFT JOIN evagg e ON e.user_id = s.c_custkey
    """,
)
def governance_subject_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject-access-request manifest (GDPR Art. 15 / CCPA "right to
    know") — the read twin of governance_erasure_sweep's delete audit:
    for each requesting subject (deterministic ~0.8 % of customers,
    modulus {SAR_MOD}), one row enumerating every place the platform
    holds their data: order count + date range + monetary footprint in
    exact cents, lineitem rows reached through the order chain, event
    count / distinct event types / activity day range. Subjects with no
    activity in a table keep the row, with zero counts and the epoch
    sentinel DATE 1900-01-01 in date fields (an explicit non-NULL
    "nothing held" — NULL dates canonicalize engine-dependently, and an
    access request must answer absence explicitly anyway), so the spine
    is the request set, never an inner join.

    Scale: the request set is tiny by construction (DSAR queues are
    operationally bounded) and persisted once; each fact table pays ONE
    scan — the subjects' orders are persisted as a thin
    (custkey, orderkey, date, cents) projection that feeds both the
    order aggregate and the lineitem chain, so orders is not scanned
    twice. Joins carry no forced broadcast hint: the planner broadcasts
    the subject set while it fits and degrades to shuffle semi-joins
    beyond that (the erasure-sweep posture). Output is #subjects rows —
    the export manifest a DSAR pipeline feeds to the document
    generator.
    """
    subj = tracked_persist(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % SAR_MOD == 0)
        .select("c_custkey", "c_mktsegment")
    )
    so = tracked_persist(
        load_table(spark, sf_dir, "orders")
        .join(subj.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    oagg = so.groupBy(
        F.col("o_custkey").alias("ok_o")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("o_orderdate").alias("first_order_date"),
        F.max("o_orderdate").alias("last_order_date"),
        F.sum("cents").cast("long").alias("total_spent_cents"),
    )
    liagg = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .join(so.select("o_custkey", "o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("ok_li"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"))
    )
    evagg = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .join(subj.select(F.col("c_custkey").alias("user_id")), "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("event_type").cast("long")
            .alias("n_event_types"),
            F.to_date(F.date_trunc("day", F.min("ts")))
            .alias("first_event_day"),
            F.to_date(F.date_trunc("day", F.max("ts")))
            .alias("last_event_day"),
        )
    )
    return (
        subj.join(oagg, subj["c_custkey"] == oagg["ok_o"], "left")
        .join(liagg, subj["c_custkey"] == liagg["ok_li"], "left")
        .join(evagg, subj["c_custkey"] == evagg["user_id"], "left")
        .select(
            subj["c_custkey"].alias("custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("first_order_date", F.lit("1900-01-01").cast("date"))
            .alias("first_order_date"),
            F.coalesce("last_order_date", F.lit("1900-01-01").cast("date"))
            .alias("last_order_date"),
            F.coalesce("total_spent_cents", F.lit(0)).cast("long")
            .alias("total_spent_cents"),
            F.coalesce("n_lineitems", F.lit(0)).cast("long")
            .alias("n_lineitems"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_event_types", F.lit(0)).cast("long")
            .alias("n_event_types"),
            F.coalesce("first_event_day", F.lit("1900-01-01").cast("date"))
            .alias("first_event_day"),
            F.coalesce("last_event_day", F.lit("1900-01-01").cast("date"))
            .alias("last_event_day"),
        )
    )


CRAMER_PAIRS = (  # (pair label, table, row-category col, col-category col)
    ("orders:priority_x_status", "orders", "o_orderpriority", "o_orderstatus"),
    ("customer:segment_x_nation", "customer", "c_mktsegment", "c_nationkey"),
    ("lineitem:returnflag_x_linestatus", "lineitem", "l_returnflag",
     "l_linestatus"),
)


@register(
    "quality_cramers_v",
    category="quality",
    oracle="""
    WITH pairs AS (
        SELECT 'orders:priority_x_status' AS pair,
               CAST(o_orderpriority AS VARCHAR) AS x,
               CAST(o_orderstatus AS VARCHAR) AS y
        FROM orders
        UNION ALL
        SELECT 'customer:segment_x_nation',
               CAST(c_mktsegment AS VARCHAR), CAST(c_nationkey AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'lineitem:returnflag_x_linestatus',
               CAST(l_returnflag AS VARCHAR), CAST(l_linestatus AS VARCHAR)
        FROM lineitem
    ),
    cells AS (
        SELECT pair, x, y, CAST(COUNT(*) AS BIGINT) AS o
        FROM pairs GROUP BY pair, x, y
    ),
    rt AS (SELECT pair, x, CAST(SUM(o) AS BIGINT) AS r
           FROM cells GROUP BY pair, x),
    ct AS (SELECT pair, y, CAST(SUM(o) AS BIGINT) AS c
           FROM cells GROUP BY pair, y),
    terms AS (
        SELECT cells.pair,
               (1000000000000 * CAST(o AS HUGEINT) * o
                + (CAST(r AS HUGEINT) * c) // 2)
               // (CAST(r AS HUGEINT) * c) AS t
        FROM cells
        JOIN rt ON rt.pair = cells.pair AND rt.x = cells.x
        JOIN ct ON ct.pair = cells.pair AND ct.y = cells.y
    ),
    dims AS (
        SELECT pair, CAST(COUNT(DISTINCT x) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT y) AS BIGINT) AS nc,
               CAST(SUM(o) AS BIGINT) AS n
        FROM cells GROUP BY pair
    ),
    phi AS (
        SELECT pair,
               CAST(GREATEST(SUM(t) - 1000000000000, 0) AS BIGINT)
                   AS phi2_x1e12
        FROM terms GROUP BY pair
    )
    SELECT d.pair, d.n, d.nr, d.nc,
           CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS dof,
           p.phi2_x1e12,
           SQRT(CAST(p.phi2_x1e12 AS DOUBLE)
                / CAST(1000000000000 * LEAST(d.nr - 1, d.nc - 1)
                       AS BIGINT)) AS cramers_v
    FROM dims d JOIN phi p ON p.pair = d.pair
    """,
)
def quality_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V categorical-association audit over three
    (table, column-pair) contingency grids — the categorical sibling of
    agg_regression's numeric correlation: does order priority predict
    order status, market segment predict nation, return flag predict
    line status? The audit a feature-engineering pipeline runs to drop
    redundant categorical features and a drift monitor runs to catch a
    dependence structure appearing where none belongs.

    Exactness discipline: the textbook χ² = Σ(O−E)²/E needs
    10⁶·(O·N−r·c)², which passes 38 digits near 10⁸ rows — so the
    algebra is restated as φ² = χ²/N = Σ_cells O²/(r·c) − 1, whose
    per-cell term 10¹²·O² stays inside DECIMAL(38,0)/HUGEINT through
    ~10¹³ rows. Each term is half-up-rounded in pico-units and summed
    as integers (clamped at 0: exact φ² is non-negative, per-cell
    rounding can dip a hair under); the ONLY float steps are one
    division by the integer 10¹²·min(nr−1, nc−1) and one square root —
    both IEEE-754 correctly-rounded operations, so the double is
    bit-identical cross-engine (exp/ln are libm-dependent and banned;
    sqrt is not).

    Scale: one scan per audited table collapsing straight to its
    contingency grid (partial aggregation map-side — the shuffle moves
    #cells rows, ≤ 125 here); row/column totals re-aggregate the GRID,
    not the table. Everything after the three grid aggregations is
    metadata-sized. Output: one row per pair.
    """
    out = None
    for pair, table, xcol, ycol in CRAMER_PAIRS:
        base = load_table(spark, sf_dir, table).select(
            F.col(xcol).cast("string").alias("x"),
            F.col(ycol).cast("string").alias("y"),
        )
        cells = tracked_persist(
            base.groupBy("x", "y").agg(
                F.count(F.lit(1)).cast("long").alias("o")
            )
        )
        rt = cells.groupBy("x").agg(F.sum("o").cast("long").alias("r"))
        ct = cells.groupBy("y").agg(F.sum("o").cast("long").alias("c"))
        terms = (
            cells.join(F.broadcast(rt), "x")
            .join(F.broadcast(ct), "y")
            .select(
                F.expr(
                    "(1000000000000 * cast(o as decimal(38,0)) * o"
                    " + (cast(r as decimal(38,0)) * c) div 2)"
                    " div (cast(r as decimal(38,0)) * c)"
                ).alias("t"),
                "o", "x", "y",
            )
        )
        row = terms.agg(
            F.lit(pair).alias("pair"),
            F.sum("o").cast("long").alias("n"),
            F.count_distinct("x").cast("long").alias("nr"),
            F.count_distinct("y").cast("long").alias("nc"),
            F.greatest(
                F.sum("t") - F.lit(10**12), F.lit(0)
            ).cast("long").alias("phi2_x1e12"),
        ).select(
            "pair", "n", "nr", "nc",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long")
            .alias("dof"),
            "phi2_x1e12",
            F.sqrt(
                F.col("phi2_x1e12").cast("double")
                / (F.lit(10**12) * F.least(F.col("nr") - 1, F.col("nc") - 1))
                .cast("long")
            ).alias("cramers_v"),
        )
        out = row if out is None else out.unionByName(row)
    return out


WINSOR_PCT = 100  # clamp below rank n/100 and above rank n - n/100 (≈ p1/p99)


@register(
    "quality_winsorize_clamp",
    category="quality",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS grp, o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    ranked AS (
        SELECT grp, cents,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM base
    ),
    th AS (
        SELECT grp, MAX(n) AS n,
               MAX(CASE WHEN rn = (n + {WINSOR_PCT - 1}) // {WINSOR_PCT} THEN cents END) AS lo_cents,
               MAX(CASE WHEN rn = n - (n + {WINSOR_PCT - 1}) // {WINSOR_PCT} + 1 THEN cents END) AS hi_cents
        FROM ranked GROUP BY grp
    )
    SELECT b.grp,
           CAST(t.n AS BIGINT) AS n_rows,
           CAST(t.lo_cents AS BIGINT) AS lo_cents,
           CAST(t.hi_cents AS BIGINT) AS hi_cents,
           CAST(SUM(CASE WHEN b.cents < t.lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
           CAST(SUM(CASE WHEN b.cents > t.hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
           CAST(SUM(b.cents) // t.n AS BIGINT) AS mean_cents_raw,
           CAST(SUM(LEAST(GREATEST(b.cents, t.lo_cents), t.hi_cents)) // t.n AS BIGINT)
               AS mean_cents_winsorized
    FROM base b JOIN th t ON b.grp = t.grp
    GROUP BY b.grp, t.n, t.lo_cents, t.hi_cents
    """,
)
def quality_winsorize_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit: per order-priority group, find the exact
    rank-based ~p1/p99 thresholds (kth smallest with k = ceil(n/100) —
    pure integer ranks, no interpolation, so cross-engine exact), count
    the rows each tail clamps, and report the mean before/after — the
    outlier-robust normalization step quantified before it is applied.

    Scale: the fact table is never rank-sorted. grp has only 5 distinct
    values, so a Window.partitionBy(grp) rank (the naive form) caps
    parallelism at 5 tasks each sorting 20% of the corpus. Instead the
    kth smallest is read off a (grp, cents) HISTOGRAM: one
    full-parallelism shuffle builds value counts, a cumulative sum over
    the histogram yields min{cents : cum >= k} — identical thresholds
    (ties share a value, so the kth row_number always lands on the
    minimal value whose cumulative count reaches k). The cumulative
    window is per-group over DISTINCT money values — bounded by the
    price domain, not the row count, the same histogram-not-sort
    construction as pipeline_curation_v2's median and
    event_rfm_segmentation's quintiles. The clamp aggregation itself
    also runs on the persisted histogram (counts as weights), so the
    fact table is scanned exactly once. All arithmetic in exact BIGINT
    cents; means are floor-divided, never averaged in floating point."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    from pyspark.sql import Window

    hist = tracked_persist(
        base.groupBy("grp", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    )
    # asc_nulls_last matches DuckDB's default NULL ordering — Spark's
    # bare asc sorts a NULL-cents histogram row FIRST, inflating every
    # real value's cum by the null count and shifting both thresholds
    wcum = Window.partitionBy("grp").orderBy(
        F.col("cents").asc_nulls_last()
    )  # histogram-sized
    cum = hist.select(
        "grp",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("n"),
    )
    k = F.floor((F.col("n") + F.lit(WINSOR_PCT - 1)) / WINSOR_PCT)
    th = cum.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= k, F.col("cents"))).alias("lo_cents"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - k + 1, F.col("cents"))
        ).alias("hi_cents"),
    )
    return (
        hist.join(F.broadcast(th), "grp")
        .groupBy("grp", "n", "lo_cents", "hi_cents")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("lo_cents"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("cents") > F.col("hi_cents"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_clamped_hi"),
            # BIGINT `div`: exact at any scale (a double mean would lose
            # integer precision past 2^53 — the 100 TB sum territory)
            F.expr("sum(cents * cnt) div max(n)")
            .cast("long")
            .alias("mean_cents_raw"),
            F.expr(
                "sum(least(greatest(cents, lo_cents), hi_cents) * cnt) div max(n)"
            )
            .cast("long")
            .alias("mean_cents_winsorized"),
        )
        .select(
            "grp",
            F.col("n").cast("long").alias("n_rows"),
            "lo_cents",
            "hi_cents",
            "n_clamped_lo",
            "n_clamped_hi",
            "mean_cents_raw",
            "mean_cents_winsorized",
        )
    )


SPIKE_Z = 2.0  # |z| at or above this flags the day


@register(
    "quality_anomaly_volume_spike",
    category="quality",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
    ),
    stats AS (
        SELECT COUNT(*) AS n, SUM(CAST(c AS HUGEINT)) AS sc,
               SUM(CAST(c AS HUGEINT) * c) AS sc2 FROM daily
    ),
    scored AS (
        SELECT day, c,
               CAST(sc AS DOUBLE) / n AS mean,
               sqrt(greatest(CAST(sc2 AS DOUBLE) / n - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n), 0)) AS std
        FROM daily CROSS JOIN stats
    )
    SELECT day, CAST(c AS BIGINT) AS n_events,
           CAST(round(CASE WHEN std = 0 THEN 0 ELSE (c - mean) / std END, 4) AS DOUBLE) AS z,
           CASE WHEN std = 0 THEN FALSE
                ELSE abs(round((c - mean) / std, 4)) >= {SPIKE_Z} END AS is_spike
    FROM scored
    """,
)
def quality_anomaly_volume_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-volume anomaly detection: daily event counts z-scored
    against the stream's own mean/std — the pager alert for a stuck
    producer (z ≪ 0) or a replay/bot flood (z ≫ 0), complementing
    quality_freshness_watermark (lag) with a volume signal.

    Determinism: counts are exact BIGINTs; mean/variance come from the
    one-pass integer moments (Σc, Σc²) so the doubles on both engines are
    built from identical integers with an identical operation order —
    IEEE-exact — and z is rounded to 4dp before the threshold. The
    one-pass variance is clamped at zero on BOTH engines: near-flat
    high-volume streams can cancel to a tiny negative, which would make
    Spark's sqrt return NaN (flagging every day) while DuckDB errors.

    Scale: one partial+final count per day (persisted — it feeds the
    moment row AND the output frame), then a broadcast of the 3-number
    moment row back onto the #days-sized frame. Output is #days rows;
    the fact table is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    daily = tracked_persist(
        ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal moments: a 100 TB day is ~1e9-1e10 events, so Σc²
        # blows int64 within a thousand days (r13 moment-sizing sweep)
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"),
    )
    mean = F.col("sc").cast("double") / F.col("n")
    std = F.sqrt(
        F.greatest(
            F.col("sc2").cast("double") / F.col("n") - mean * mean, F.lit(0.0)
        )
    )
    z = F.round((F.col("c") - mean) / std, 4)
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        F.col("c").cast("long").alias("n_events"),
        F.when(std == 0, F.lit(0.0)).otherwise(z).cast("double").alias("z"),
        F.when(std == 0, F.lit(False)).otherwise(F.abs(z) >= SPIKE_Z).alias("is_spike"),
    )


# Benford first-significant-digit expectation, log10(1 + 1/d), rounded to
# 10 dp so the nine literals sum to exactly 1.0 and both engines inline
# the identical doubles.
_BENFORD_P = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366, 4: 0.096910013,
    5: 0.079181246, 6: 0.0669467896, 7: 0.057991947, 8: 0.0511525224,
    9: 0.0457574906,
}
_BENFORD_DEV = 0.02  # flag digits drifting more than 2 points from Benford


@register(
    "quality_benford_audit",
    category="quality",
    bench=True,
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
        WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0
    ),
    counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS t FROM counts),
    bp(digit, p) AS (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_P.items())})
    SELECT bp.digit,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           CAST(round(COALESCE(c.n, 0) * 1.0 / NULLIF(tot.t, 0), 6) AS DOUBLE) AS share,
           CAST(bp.p AS DOUBLE) AS benford_p,
           CAST(round(abs(COALESCE(c.n, 0) * 1.0 / NULLIF(tot.t, 0) - bp.p), 6) AS DOUBLE) AS abs_dev,
           round(abs(COALESCE(c.n, 0) * 1.0 / NULLIF(tot.t, 0) - bp.p), 6) > {_BENFORD_DEV} AS flagged
    FROM bp LEFT JOIN counts c USING (digit) CROSS JOIN tot
    """,
)
def quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order amounts —
    the classic fabricated/synthetic-data detector a warehouse QA suite
    runs on money columns: per digit 1-9, the observed share vs the
    Benford expectation log10(1 + 1/d) and a >2-point deviation flag.
    (This synthetic corpus deliberately FAILS Benford — uniform price
    generation front-loads nothing — which is exactly the signal the
    audit exists to raise; the flags are data, not a test failure.)

    Determinism: the first digit is taken from the DECIMAL's exact cent
    integer rendered as a string (never float formatting), shares are
    single-rounded doubles, and the nine Benford literals are inlined
    identically on both engines (they sum to exactly 1.0). Non-positive
    amounts are excluded on BOTH engines before digit extraction — a
    '0'/'-' first char has no Benford digit, and CAST('-' AS INT)
    raises on DuckDB where Spark returns NULL, so dirty input would
    otherwise diverge cross-engine.

    Scale: one conditional-agg pass collapses the fact table to at most
    nine (digit, n) rows; the digit spine joins and the expectation
    table broadcast at constant size — audit cost is the scan, state is
    O(9) and mergeable map-side."""
    od = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    # non-positive amounts have no first significant digit (and '-'
    # casts divergently across engines): exclude them from both the
    # digit counts AND the share denominator, on both engines
    counts = (
        od.select(cents.alias("cents"))
        .where(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int").alias("digit")
        )
        .groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    )
    # the expectation table IS the 1-9 spine (single place the domain
    # is encoded; mirrors the oracle's bp VALUES list)
    bp = literal_frame(
        spark, [(d, p) for d, p in _BENFORD_P.items()], "digit int, benford_p double"
    )
    from pyspark.sql import Window

    # the share denominator is a window sum over the 9-row joined frame
    # (constant size) — one job instead of a separate total agg +
    # broadcast cross join
    share = F.col("n") / F.nullif(
        F.sum("n").over(Window.partitionBy()), F.lit(0)
    )
    dev = F.round(F.abs(share - F.col("benford_p")), 6)
    return (
        bp.join(counts, "digit", "left")
        .na.fill({"n": 0})
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(share, 6).cast("double").alias("share"),
            F.col("benford_p").cast("double").alias("benford_p"),
            dev.cast("double").alias("abs_dev"),
            (dev > F.lit(_BENFORD_DEV)).alias("flagged"),
        )
    )


L_DIVERSITY = 3  # classes with fewer distinct sensitive values leak


@register(
    "governance_l_diversity",
    category="quality",
    oracle=f"""
    WITH sens AS (
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
               c_mktsegment AS segment,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
                          / 100000.0) AS BIGINT) AS s
        FROM customer
    ),
    cell AS (
        SELECT nationkey, segment, s, COUNT(*) AS n
        FROM sens GROUP BY nationkey, segment, s
    )
    SELECT nationkey, segment,
           CAST(SUM(n) AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(MAX(n) AS BIGINT) AS top_sensitive_n,
           COUNT(*) < {L_DIVERSITY} AS at_risk,
           MAX(n) = SUM(n) AS homogeneous
    FROM cell GROUP BY nationkey, segment
    """,
)
def governance_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure complement of the
    k-anonymity family (quality_k_anonymity / governance_k_anonymity):
    a class can be large enough to satisfy k yet still leak if every
    member shares the SAME sensitive value (the homogeneity attack).
    Per quasi-identifier class (nation, segment), the sensitive
    attribute is the $1000 account-balance bucket (true FLOOR on exact
    cents, so negative balances bucket correctly on both engines);
    reported: class_size, l_distinct (distinct sensitive values — the
    "l"), top_sensitive_n (the modal bucket's count, the adversary's
    best single guess), at_risk (l < L_DIVERSITY, value frozen in the
    oracle f-string), and homogeneous (modal = all — certain
    disclosure).

    All counts are exact BIGINTs; the only double op is the bucket
    floor on exact sub-2^53 cents — identical on both engines.

    Scale: one dimension-table scan collapsing map-side to
    #(nation, segment, bucket) cells, then a metadata-sized re-group
    to #(nation, segment) classes — the same one-scan-two-thin-aggs
    posture as the k-anonymity ladder; at 100 TB the class frame is
    what travels, never rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    cell = (
        cust.select(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(cents / F.lit(100000.0)).cast("long").alias("s"),
        )
        .groupBy("nationkey", "segment", "s")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cell.groupBy("nationkey", "segment").agg(
        F.sum("n").cast("long").alias("class_size"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.max("n").cast("long").alias("top_sensitive_n"),
        (F.count(F.lit(1)) < F.lit(L_DIVERSITY)).alias("at_risk"),
        (F.max("n") == F.sum("n")).alias("homogeneous"),
    )


DP_CLIP_PCT = 99  # clip per-(user, day) contributions at this exact-rank pct


@register(
    "governance_dp_sensitivity",
    category="quality",
    bench=True,
    oracle=f"""
    WITH g AS (
        SELECT event_type, user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, user_id, day
    ),
    per_type AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MAX(c) AS BIGINT) AS max_user_day
        FROM g GROUP BY event_type
    ),
    user_days AS (
        SELECT event_type, CAST(MAX(nd) AS BIGINT) AS max_days_per_user
        FROM (SELECT event_type, user_id, COUNT(*) AS nd
              FROM g GROUP BY event_type, user_id)
        GROUP BY event_type
    ),
    cdist AS (
        SELECT event_type, c, COUNT(*) AS nc FROM g GROUP BY event_type, c
    ),
    cum AS (
        SELECT event_type, c, nc,
               SUM(nc) OVER (PARTITION BY event_type ORDER BY c) AS cum_c,
               SUM(nc) OVER (PARTITION BY event_type) AS tot_c
        FROM cdist
    ),
    thr AS (
        SELECT event_type, CAST(MIN(c) AS BIGINT) AS clip_threshold
        FROM cum
        WHERE cum_c >= CAST(ceil({DP_CLIP_PCT} / 100.0 * tot_c) AS BIGINT)
        GROUP BY event_type
    ),
    loss AS (
        SELECT g.event_type,
               CAST(SUM(CASE WHEN c > clip_threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS clipped_cells,
               CAST(SUM(CASE WHEN c > clip_threshold
                             THEN c - clip_threshold ELSE 0 END)
                    AS BIGINT) AS clipped_events
        FROM g JOIN thr ON g.event_type = thr.event_type
        GROUP BY g.event_type
    )
    SELECT event_type, n_users, n_cells, max_user_day, max_days_per_user,
           clip_threshold, clipped_cells, clipped_events
    FROM per_type
    JOIN user_days USING (event_type)
    JOIN thr USING (event_type)
    JOIN loss USING (event_type)
    """,
)
def governance_dp_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy sensitivity audit — the numbers a DP release
    needs BEFORE any noise is drawn (noise itself is deliberately out of
    scope: nondeterminism can't be oracle-checked, and calibrating the
    clip is the data-engineering half of the job anyway). Per
    event_type: the worst-case single-user single-day contribution
    (max_user_day — the L-infinity sensitivity of a daily count
    release), the worst-case number of days one user touches
    (max_days_per_user — the L0 factor a user-level guarantee must
    multiply in), and the recommended clipping threshold = the exact
    integer rank-DP_CLIP_PCT percentile of per-(user, day)
    contributions, with its utility price (clipped_cells /
    clipped_events = how much signal the clip discards). All exact
    BIGINTs — no interpolated percentile, no doubles anywhere.

    Scale: ONE events scan collapsing map-side to the (type, user, day)
    contribution frame; everything downstream aggregates that frame or
    its (type, count)-distinct distribution (the percentile window
    orders #distinct contribution VALUES per type — dozens of rows, not
    cells). The clip-loss join broadcasts the #types-row threshold
    table. At 100 TB the contribution frame is the only shuffle.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    g = tracked_persist(
        ev.groupBy(
            "event_type",
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_type = g.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("c").cast("long").alias("max_user_day"),
    )
    user_days = (
        g.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("nd"))
        .groupBy("event_type")
        .agg(F.max("nd").cast("long").alias("max_days_per_user"))
    )
    cdist = g.groupBy("event_type", "c").agg(F.count(F.lit(1)).alias("nc"))
    wcum = Window.partitionBy("event_type").orderBy("c")
    wtot = Window.partitionBy("event_type")
    thr = (
        cdist.select(
            "event_type", "c",
            F.sum("nc").over(wcum).alias("cum_c"),
            F.sum("nc").over(wtot).alias("tot_c"),
        )
        .filter(
            F.col("cum_c")
            >= F.ceil(F.lit(DP_CLIP_PCT) / F.lit(100.0) * F.col("tot_c"))
        )
        .groupBy("event_type")
        .agg(F.min("c").cast("long").alias("clip_threshold"))
    )
    loss = (
        g.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("c") > F.col("clip_threshold"), 1).otherwise(0)
            ).cast("long").alias("clipped_cells"),
            F.sum(
                F.when(
                    F.col("c") > F.col("clip_threshold"),
                    F.col("c") - F.col("clip_threshold"),
                ).otherwise(0)
            ).cast("long").alias("clipped_events"),
        )
    )
    return (
        per_type.join(user_days, "event_type")
        .join(F.broadcast(thr), "event_type")
        .join(F.broadcast(loss), "event_type")
        .select(
            "event_type", "n_users", "n_cells", "max_user_day",
            "max_days_per_user", "clip_threshold", "clipped_cells",
            "clipped_events",
        )
    )


T_CLOSE_PPM = 200_000  # flag classes whose EMD from the global dist > 0.2


@register(
    "governance_t_closeness",
    category="quality",
    oracle=f"""
    WITH sens AS (
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
               c_mktsegment AS segment,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
                          / 100000.0) AS BIGINT) AS s
        FROM customer
    ),
    dom AS (SELECT DISTINCT s FROM sens),
    gdist AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS g FROM sens GROUP BY s),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_buckets
            FROM sens),
    cls AS (SELECT nationkey, segment, CAST(COUNT(*) AS BIGINT) AS n_class
            FROM sens GROUP BY nationkey, segment),
    cell AS (SELECT nationkey, segment, s, CAST(COUNT(*) AS BIGINT) AS c
             FROM sens GROUP BY nationkey, segment, s),
    grid AS (
        SELECT cls.nationkey, cls.segment, cls.n_class, dom.s,
               COALESCE(cell.c, 0) AS c, gdist.g, tot.n_total, tot.n_buckets
        FROM cls CROSS JOIN dom
        JOIN gdist ON gdist.s = dom.s
        CROSS JOIN tot
        LEFT JOIN cell ON cell.nationkey = cls.nationkey
                      AND cell.segment = cls.segment AND cell.s = dom.s
    ),
    run AS (
        SELECT nationkey, segment, n_class, n_total, n_buckets, s,
               SUM(CAST(c AS HUGEINT) * n_total - CAST(g AS HUGEINT) * n_class)
                   OVER (PARTITION BY nationkey, segment ORDER BY s) AS r
        FROM grid
    ),
    emd AS (
        SELECT nationkey, segment, n_class, n_total, n_buckets,
               CAST(SUM(ABS(r)) AS HUGEINT) AS sum_abs_r
        FROM run GROUP BY nationkey, segment, n_class, n_total, n_buckets
    )
    SELECT nationkey, segment, n_class,
           CAST((1000000 * sum_abs_r
                 + (CAST(n_class AS HUGEINT) * n_total * (n_buckets - 1)) // 2)
                // (CAST(n_class AS HUGEINT) * n_total * (n_buckets - 1))
                AS BIGINT) AS emd_ppm,
           (1000000 * sum_abs_r)
               > {T_CLOSE_PPM} * CAST(n_class AS HUGEINT) * n_total
                 * (n_buckets - 1) AS exceeds_t
    FROM emd
    """,
)
def governance_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the classic privacy triad
    (quality_k_anonymity / governance_k_anonymity count class sizes,
    governance_l_diversity counts distinct sensitive values; this
    measures DISTRIBUTIONAL skew): a class can be big AND diverse yet
    still leak if its sensitive-value distribution differs sharply from
    the global one (the adversary updates a prior). Per quasi-identifier
    class (nation, segment), the Earth Mover's Distance between the
    class's $1000-balance-bucket distribution and the global
    distribution under the ordered equal-step ground metric — for a 1-D
    ordered domain EMD = Σ|running (p−q)| / (B−1), computed ENTIRELY in
    exact integer arithmetic over a common denominator n_class·n_total:
    the running term is Σ(c·N − g·n), folded in decimal(38,0)/HUGEINT
    (widened BEFORE the multiply, the r14 discipline), and the final
    ppm is one half-up integer division. exceeds_t compares
    cross-multiplied integers — no division at all on the verdict path.

    Scale: one dimension-table scan to the (class, bucket) cell frame;
    the dense grid is #classes × #buckets (metadata-sized — the
    balance-bucket domain is bounded), the running-sum window is
    per-class over that grid. At 100 TB the cell frame is what
    shuffles, never rows.
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    sens = tracked_persist(
        cust.select(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(cents / F.lit(100000.0)).cast("long").alias("s"),
        )
    )
    dom = sens.select("s").distinct()
    gdist = sens.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("g"))
    tot = sens.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_distinct("s").cast("long").alias("n_buckets"),
    )
    cls = sens.groupBy("nationkey", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_class")
    )
    cell = sens.groupBy("nationkey", "segment", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    grid = (
        cls.crossJoin(F.broadcast(dom))
        .join(F.broadcast(gdist), "s")
        .crossJoin(F.broadcast(tot))
        .join(cell, ["nationkey", "segment", "s"], "left")
        .select(
            "nationkey", "segment", "n_class", "s", "g",
            "n_total", "n_buckets",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wrun = Window.partitionBy("nationkey", "segment").orderBy("s")
    run = grid.select(
        "nationkey", "segment", "n_class", "n_total", "n_buckets",
        F.sum(
            F.col("c").cast(dec) * F.col("n_total")
            - F.col("g").cast(dec) * F.col("n_class")
        ).over(wrun).alias("r"),
    )
    emd = run.groupBy(
        "nationkey", "segment", "n_class", "n_total", "n_buckets"
    ).agg(F.sum(F.abs(F.col("r"))).cast(dec).alias("sum_abs_r"))
    denom = (
        F.col("n_class").cast(dec)
        * F.col("n_total")
        * (F.col("n_buckets") - 1)
    )
    return emd.select(
        "nationkey", "segment", "n_class",
        F.expr(
            "(1000000 * sum_abs_r + (cast(n_class as decimal(38,0)) "
            "* n_total * (n_buckets - 1)) div 2) "
            "div (cast(n_class as decimal(38,0)) * n_total * (n_buckets - 1))"
        ).cast("long").alias("emd_ppm"),
        (
            F.lit(1_000_000).cast(dec) * F.col("sum_abs_r")
            > F.lit(T_CLOSE_PPM).cast(dec) * denom
        ).alias("exceeds_t"),
    )
