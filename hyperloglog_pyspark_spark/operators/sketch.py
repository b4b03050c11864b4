"""The sketch layer — the reference's actual capability surface, made
first-class and relational.

Reference mapping (SURVEY.md §2.1):
- O1-O7 (init/insert/estimate): `approx_count_distinct(col, rsd)` — Spark's
  built-in HLL++ (same Heule et al. algorithm the reference implements in
  HLL/HyperLogLog.py:182-255, including linear-counting + bias correction).
- O8 (merge, HLL/HyperLogLog.py:157-179): `hll_union_agg` over BinaryType
  DataSketches columns — the relational form of passing `hmap` register
  arrays between machines (HLL/examples.py:64-66).
- O11 (distributed estimate, HLL/examples.py:56-67): one `agg()` —
  Catalyst plans partial sketches per partition + merge automatically.
- O12 (exact oracle, HLL/examples.py:70-83): COUNT(DISTINCT ...), and the
  `within_tol` pattern below.

Correctness pattern: approximate estimates can never hash-match a DuckDB
oracle (different hash functions), so tolerance queries emit the EXACT
value plus a boolean `approx_ok` = |est − exact| / exact ≤ 3·rsd; the
oracle emits the exact value plus literal TRUE. The hash comparison then
*verifies the accuracy contract itself* — the same oracle pattern the
reference uses (calculate_empirical_accuracy, HLL/examples.py:70-83).

Scale: HLL state is a fixed 2^p-register buffer regardless of input size —
a 100 TB scan reduces to KB-scale partial states, and sketch columns are
re-aggregatable (store daily sketches once, roll up to any coarser grain
without rescanning raw data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

# 3-sigma acceptance per the reference's observed envelope (BASELINE.md):
# |rel err| ≤ 3 × stderr, stderr = 1.04/√m.
RSD = 0.02  # approx_count_distinct accuracy knob
LG_K = 14  # DataSketches lgConfigK → stderr ≈ 1.04/√2^14 ≈ 0.81%


def _tol(est: F.Column, exact: F.Column, stderr: float) -> F.Column:
    return (F.abs(est.cast("double") - exact) / exact) <= (3 * stderr)


@register(
    "approx_distinct_users_daily",
    category="sketch",
    bench=True,
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           TRUE AS approx_ok
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: distinct users per day — approximate (HLL++) next to its
    exact oracle, mirroring estimate_distinct_elements_parallel +
    calculate_empirical_accuracy (HLL/examples.py:56-83)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", RSD).alias("approx_users"),
    )
    return agg.select(
        "day", "n_users", "n_events", _tol(F.col("approx_users"), F.col("n_users"), RSD).alias("approx_ok")
    )


@register(
    "hll_sketch_rollup",
    category="sketch",
    bench=True,
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch column rollup: build per-(event_type, day) HLL sketches, then
    merge day-sketches up to event_type with hll_union_agg and estimate.

    This is the reference's merge story (HLL/HyperLogLog.py:157-179 — the
    elementwise register max) done relationally over BinaryType sketch
    values: aggregate once at fine grain, re-aggregate the sketches — never
    the raw data — for every coarser grain.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(LG_K)).alias("sketch")
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    stderr = 1.04 / (2 ** (LG_K / 2.0))
    return exact.join(rolled, "event_type").select(
        "event_type",
        "n_users",
        _tol(F.col("approx_users"), F.col("n_users"), stderr).alias("approx_ok"),
    )


@register(
    "hll64_parity",
    category="sketch",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def hll64_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via the clean-room sha1 HLL64 UDAF
    (functions/hll64_spark.py) — the reference's own estimator run as a
    two-phase distributed aggregate, tolerance-checked against exact.

    p=12 ⇒ stderr 1.04/√4096 ≈ 1.63%; acceptance 3σ, the envelope the
    reference itself demonstrates (−1.14% at p=12, BASELINE.md).
    """
    from hyperloglog_pyspark_spark.functions.hll64_spark import hll64_estimate_col, hll64_sketch

    ev = load_table(spark, sf_dir, "events")
    sketches = hll64_sketch(ev, ["event_type"], "user_id", k=2**12)
    est = hll64_estimate_col(sketches, alias="approx_users")
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    stderr = 1.04 / (2**6.0)
    return exact.join(est.select("event_type", "approx_users"), "event_type").select(
        "event_type",
        "n_users",
        _tol(F.col("approx_users"), F.col("n_users"), stderr).alias("approx_ok"),
    )


MG_K = 256  # Misra-Gries counters per partition summary
TOP_N = 20


@register(
    "heavy_hitters_mg",
    category="sketch",
    bench=True,
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    )
    SELECT token, CAST(freq AS BIGINT) AS freq, TRUE AS sketch_ok
    FROM counts ORDER BY freq DESC, token LIMIT {TOP_N}
    """,
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token frequencies with the Misra-Gries mergeable-summary
    contract checked in-plan: the sketch (functions/mgsketch.py — compressed
    per-partition counters, additive merge) must contain every token whose
    true frequency exceeds n/(k+1), with weight within [freq − n/(k+1),
    freq]. Output rows are the EXACT top-{TOP_N} (deterministic tie-break),
    so the DuckDB oracle hash-verifies the accuracy contract itself — the
    same pattern as the HLL tolerance queries above.

    Scale: the sketch shuffle carries ≤ k rows per partition; the exact
    side is one token aggregate + TakeOrdered — at 100 TB you keep the
    sketch and drop the exact side, which exists here as the oracle."""
    from hyperloglog_pyspark_spark.functions.mgsketch import mg_summary

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    # Exact counts serve double duty: the top-k rows AND the total token
    # count n (sum of freqs over the vocab-sized frame) — two token-table
    # scans total (exact + sketch), not three.
    exact = tracked_persist(toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq")))
    top = exact.orderBy(F.col("freq").desc(), "token").limit(TOP_N)
    n_total = exact.agg(F.sum("freq").alias("n"))
    mg = mg_summary(toks, "token", MG_K).withColumnRenamed("item", "token")
    err = F.col("n") / (MG_K + 1.0)
    ok = (F.col("freq") <= err) | (
        F.col("weight").isNotNull()
        & (F.col("weight") <= F.col("freq"))
        & (F.col("weight") >= F.col("freq") - err)
    )
    return (
        top.join(mg, "token", "left")
        .crossJoin(F.broadcast(n_total))
        .select("token", F.col("freq").cast("long").alias("freq"), ok.alias("sketch_ok"))
    )


PRICE_CUT = 450000.0
YEAR_B = 1997


@register(
    "hll_set_intersection",
    category="sketch",
    oracle=f"""
    WITH flags AS (
        SELECT o_custkey,
               MAX(CASE WHEN o_totalprice > {PRICE_CUT} THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN year(o_orderdate) = {YEAR_B} THEN 1 ELSE 0 END) AS in_b
        FROM orders GROUP BY o_custkey
    )
    SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
           CAST(SUM(in_b) AS BIGINT) AS n_b,
           CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter_exact,
           TRUE AS approx_ok
    FROM flags
    """,
)
def hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on HLL sketches: estimate |A ∩ B| by inclusion-exclusion
    (est(A) + est(B) − est(A ∪ B)), where the union estimate comes from
    merging the two sketches — the register-max merge that is the
    reference's only composition operator (HLL/HyperLogLog.py:157-179)
    used to answer a question HLL cannot answer directly.

    A = customers with an order over {PRICE_CUT}; B = customers ordering in
    {YEAR_B}. The error of the differenced estimate is bounded by the sum
    of the three absolute errors, so acceptance is
    |est − exact| ≤ 3·stderr·(|A| + |B| + |A∪B|) — the 3-sigma envelope
    propagated through the subtraction (exact sizes from the same scan).

    Scale: flags collapse orders to one row per customer (one shuffle);
    the three sketches + three exact counts are a single global aggregate
    over that deduped frame — constant-size state regardless of input.
    """
    od = load_table(spark, sf_dir, "orders")
    flags = od.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_totalprice") > PRICE_CUT, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.year("o_orderdate") == YEAR_B, 1).otherwise(0)).alias("in_b"),
    )
    key = F.col("o_custkey").cast("string")
    agg = flags.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter_exact"),
        F.hll_sketch_agg(F.when(F.col("in_a") == 1, key), F.lit(LG_K)).alias("sk_a"),
        F.hll_sketch_agg(F.when(F.col("in_b") == 1, key), F.lit(LG_K)).alias("sk_b"),
    )
    stderr = 1.04 / (2 ** (LG_K / 2.0))
    est = agg.select(
        "n_a",
        "n_b",
        "n_inter_exact",
        F.hll_sketch_estimate("sk_a").alias("ea"),
        F.hll_sketch_estimate("sk_b").alias("eb"),
        F.hll_sketch_estimate(
            F.hll_union("sk_a", "sk_b")
        ).alias("eu"),
    )
    est_inter = F.col("ea") + F.col("eb") - F.col("eu")
    bound = 3 * stderr * (F.col("ea") + F.col("eb") + F.col("eu"))
    return est.select(
        "n_a",
        "n_b",
        "n_inter_exact",
        (F.abs(est_inter - F.col("n_inter_exact")) <= bound).alias("approx_ok"),
    )


QUANTILE_ACC = 1000  # percentile_approx accuracy: rank error ≤ n/accuracy


@register(
    "approx_quantile_check",
    category="sketch",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with its accuracy contract checked in-plan: exact
    median (interpolated, = DuckDB quantile_cont) next to percentile_approx
    (Greenwald-Khanna style mergeable sketch), accepted iff the approx
    value's true fractional rank is within the sketch's guarantee
    (rank error ≤ n/accuracy, plus one row of discreteness slack).

    The check is rank-space, not value-space — GK bounds rank, and value
    error is unbounded for skewed data, so comparing values would test the
    wrong contract. Ranking the approx answer costs a second broadcast
    pass over the group (3 rows broadcast back to the scan).

    Scale: both aggregates are single partial+final passes; sketch state
    is O(accuracy·log n) per group, mergeable across partitions — the
    same re-aggregation story as the HLL family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50_exact"),
        F.percentile_approx("l_extendedprice", 0.5, QUANTILE_ACC).alias("p50_approx"),
        F.count(F.lit(1)).alias("n"),
    )
    ranked = (
        li.join(F.broadcast(agg), "l_returnflag")
        .groupBy("l_returnflag", "p50_exact", "p50_approx", "n")
        .agg(
            F.sum(F.when(F.col("l_extendedprice") <= F.col("p50_approx"), 1).otherwise(0)).alias(
                "rank_le"
            )
        )
    )
    frac_err = F.abs(F.col("rank_le") / F.col("n") - 0.5)
    slack = 2.0 / QUANTILE_ACC + 1.0 / F.col("n")
    return ranked.select(
        "l_returnflag",
        F.round("p50_exact", 4).alias("p50_exact"),
        (frac_err <= slack).alias("approx_ok"),
    )


@register(
    "hll_merge_compat",
    category="sketch",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users_all, TRUE AS approx_ok
    FROM events
    """,
)
def hll_merge_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merging sketches built at DIFFERENT precisions.

    The reference refuses to merge unless raw k matches exactly
    (HLL/HyperLogLog.py:165-167 — a latent bug: compatibility depends on p,
    not k). DataSketches handles mixed lgConfigK by downgrading to the
    coarser precision (allowDifferentLgConfigK); we surface that behavior
    deliberately: union a lgK=14 sketch with a lgK=12 sketch and check the
    estimate still lands within the COARSER sketch's 3-sigma envelope.
    """
    ev = load_table(spark, sf_dir, "events")
    s_hi = ev.filter(F.col("user_id") % 2 == 0).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(14)).alias("sketch")
    )
    s_lo = ev.filter(F.col("user_id") % 2 == 1).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sketch")
    )
    merged = s_hi.unionByName(s_lo).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True))).alias("approx")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_users_all"))
    stderr = 1.04 / (2 ** 6.0)  # coarser sketch: lgK=12
    return exact.crossJoin(merged).select(
        "n_users_all", _tol(F.col("approx"), F.col("n_users_all"), stderr).alias("approx_ok")
    )
