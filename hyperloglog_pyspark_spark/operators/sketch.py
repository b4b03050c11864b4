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

from hyperloglog_pyspark_spark.registry import register
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
