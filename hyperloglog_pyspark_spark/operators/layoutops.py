"""Physical-layout operations: the diagnostics a team actually runs before
re-partitioning, re-clustering, or salting a 100 TB table — key-skew
audits and multi-dimensional (Z-order) clustering previews.

These are first-class queries (not tests) because layout work is part of
operating an engine at scale: you measure skew BEFORE a job dies at 3am,
and you preview Z-order bucket locality BEFORE rewriting petabytes. The
reference has no storage layer at all (in-memory RDDs only,
HLL/examples.py); Spark-side, both operators are single aggregation
passes whose outputs are key-space-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.texttools import md5_long, md5_long_sql
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

SKEW_TOP = 5


@register(
    "skew_key_audit",
    category="analytics",
    oracle=f"""
    WITH per_key AS (
        SELECT l_suppkey AS key, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey
    ), stats AS (
        SELECT COUNT(*) AS n_keys, SUM(n_rows) AS total, AVG(n_rows) AS mean_rows
        FROM per_key
    )
    SELECT p.key, CAST(p.n_rows AS BIGINT) AS n_rows,
           ROUND(p.n_rows * 1.0 / s.total, 6) AS pct_of_total,
           ROUND(p.n_rows / s.mean_rows, 4) AS skew_factor,
           CAST(s.n_keys AS BIGINT) AS n_keys
    FROM per_key p CROSS JOIN stats s
    ORDER BY p.n_rows DESC, p.key LIMIT {SKEW_TOP}
    """,
)
def skew_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the {SKEW_TOP} hottest l_suppkey values with
    their share of rows and skew factor (rows / mean-rows-per-key) — the
    number that decides between a plain shuffle join, AQE skew splitting,
    and explicit salting (operators/aggregates.py::agg_salted_skew is the
    remedy this measures the need for). One groupBy on the key, then a
    TakeOrdered over the key-space-sized frame."""
    li = load_table(spark, sf_dir, "lineitem")
    # Persisted (tracked): key-space-sized, feeds both the stats aggregate
    # and the output rows — one fact-table aggregation, not two.
    per_key = tracked_persist(
        li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total"),
        F.avg("n_rows").alias("mean_rows"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("total"), 6).alias("pct_of_total"),
            F.round(F.col("n_rows") / F.col("mean_rows"), 4).alias("skew_factor"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(SKEW_TOP)
    )


Z_BITS = 8  # bits per dimension interleaved into the Morton code
Z_BUCKET_SHIFT = 10  # keep the top 2*Z_BITS-10 = 6 bits → 64 buckets


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_morton_buckets",
    category="analytics",
    oracle=f"""
    WITH coded AS (
        SELECT l_partkey % {1 << Z_BITS} AS px, l_suppkey % {1 << Z_BITS} AS sx,
               ({_morton_sql(f"(l_partkey % {1 << Z_BITS})", f"(l_suppkey % {1 << Z_BITS})")})
                   >> {Z_BUCKET_SHIFT} AS bucket
        FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
           CAST(MIN(sx) AS BIGINT) AS min_sx, CAST(MAX(sx) AS BIGINT) AS max_sx
    FROM coded GROUP BY bucket
    """,
)
def zorder_morton_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering preview: interleave the low {Z_BITS} bits of
    (l_partkey, l_suppkey) into a Morton code, bucket by its high bits,
    and report each bucket's rectangle in key space. Tight per-bucket
    min/max ranges on BOTH dimensions are exactly what lets min/max file
    statistics skip data for predicates on either key after a Z-order
    rewrite — this query measures that benefit before paying for the
    rewrite. Pure integer bit arithmetic (bit-identical cross-engine);
    one aggregation, bucket-count-sized output."""
    li = load_table(spark, sf_dir, "lineitem")
    mask = (1 << Z_BITS) - 1
    px = F.col("l_partkey").bitwiseAND(mask)
    sx = F.col("l_suppkey").bitwiseAND(mask)
    morton = None
    for i in range(Z_BITS):
        tx = F.shiftleft(F.shiftright(px, i).bitwiseAND(1), 2 * i)
        ty = F.shiftleft(F.shiftright(sx, i).bitwiseAND(1), 2 * i + 1)
        morton = tx + ty if morton is None else morton + tx + ty
    coded = li.select(
        px.alias("px"), sx.alias("sx"), F.shiftright(morton, Z_BUCKET_SHIFT).alias("bucket")
    )
    return coded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("px").cast("long").alias("min_px"),
        F.max("px").cast("long").alias("max_px"),
        F.min("sx").cast("long").alias("min_sx"),
        F.max("sx").cast("long").alias("max_sx"),
    )


SKIP_N_FILES = 64
SKIP_PRED_LO = "1999-06-01"
SKIP_PRED_HI = "1999-09-01"


@register(
    "layout_skipping_report",
    category="analytics",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderdate,
               epoch_us(o_orderdate) AS od_us,
               o_orderkey % {SKIP_N_FILES} AS hash_file
        FROM orders
    ),
    bounds AS (
        SELECT MIN(od_us) AS lo, MAX(od_us) AS hi, COUNT(*) AS n FROM base
    ),
    laid AS (
        SELECT hash_file,
               LEAST((od_us - (SELECT lo FROM bounds)) * {SKIP_N_FILES}
                     // ((SELECT hi FROM bounds) - (SELECT lo FROM bounds) + 1),
                     {SKIP_N_FILES - 1}) AS clustered_file,
               o_orderdate
        FROM base
    ),
    stats AS (
        SELECT 'hash' AS layout, hash_file AS file_id,
               MIN(o_orderdate) AS dmin, MAX(o_orderdate) AS dmax
        FROM laid GROUP BY hash_file
        UNION ALL
        SELECT 'date_clustered' AS layout, clustered_file AS file_id,
               MIN(o_orderdate) AS dmin, MAX(o_orderdate) AS dmax
        FROM laid GROUP BY clustered_file
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN dmax < TIMESTAMP '{SKIP_PRED_LO}'
                          OR dmin >= TIMESTAMP '{SKIP_PRED_HI}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
           ROUND(SUM(CASE WHEN dmax < TIMESTAMP '{SKIP_PRED_LO}'
                           OR dmin >= TIMESTAMP '{SKIP_PRED_HI}'
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS skip_fraction
    FROM stats GROUP BY layout
    """,
)
def layout_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness report: the same rows laid out two ways
    — hash-scattered (orderkey mod F) vs date-clustered (orderdate range
    partitioned into F contiguous files) — then, for a 3-month date
    predicate, the fraction of files whose [min, max] footer stats let a
    scanner skip them entirely. The quantified version of WHY clustered /
    Z-ordered layouts matter at 100 TB: hash layout skips ~0% (every file
    spans the full date range), clustered layout skips every file outside
    the window. Pairs with ``zorder_morton_buckets`` (multi-column
    clustering preview) and the min/max stats parquet actually stores.

    One scan computes both layouts' per-file min/max (two #files-sized
    aggregations); the verdict is arithmetic on footer-stat-sized data.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderdate",
        F.unix_micros("o_orderdate").alias("od_us"),
        F.pmod("o_orderkey", F.lit(SKIP_N_FILES)).alias("hash_file"),
    )
    bounds = base.agg(
        F.min("od_us").alias("lo"), F.max("od_us").alias("hi")
    )
    laid = base.crossJoin(F.broadcast(bounds)).select(
        "o_orderdate",
        "hash_file",
        F.least(
            F.expr(f"(od_us - lo) * {SKIP_N_FILES} div (hi - lo + 1)"),
            F.lit(SKIP_N_FILES - 1),
        ).alias("clustered_file"),
    )
    def stats_of(col: str, label: str) -> DataFrame:
        return laid.groupBy(F.col(col).alias("file_id")).agg(
            F.min("o_orderdate").alias("dmin"), F.max("o_orderdate").alias("dmax")
        ).select(F.lit(label).alias("layout"), "file_id", "dmin", "dmax")

    stats = stats_of("hash_file", "hash").unionByName(
        stats_of("clustered_file", "date_clustered")
    )
    skippable = F.when(
        (F.col("dmax") < F.lit(SKIP_PRED_LO).cast("timestamp"))
        | (F.col("dmin") >= F.lit(SKIP_PRED_HI).cast("timestamp")),
        1,
    ).otherwise(0)
    return stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(skippable).alias("n_skippable"),
        F.round(F.sum(skippable) / F.count(F.lit(1)), 6).alias("skip_fraction"),
    )


RANGE_K = 16  # range buckets (→ output files / partitions after a rewrite)
RANGE_SAMPLE_MOD = 32  # deterministic 1/32 sample drives the boundaries


@register(
    "layout_range_sort_buckets",
    category="analytics",
    bench=True,
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders
    ),
    samp AS (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn
        FROM base
        WHERE {md5_long_sql("CAST(o_orderkey AS VARCHAR)")} % {RANGE_SAMPLE_MOD} = 0
    ),
    n AS (SELECT COUNT(*) AS n FROM samp),
    bnd AS (
        SELECT list_sort(list(cents)) AS bs
        FROM samp, n, (SELECT unnest(range(1, {RANGE_K})) AS i)
        WHERE rn = (i * n + {RANGE_K - 1}) // {RANGE_K}
    ),
    assigned AS (
        SELECT cents, len(list_filter(bs, x -> x <= cents)) AS bucket
        FROM base CROSS JOIN bnd
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM assigned GROUP BY bucket
    """,
)
def layout_range_sort_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned total sort (the terasort / ORDER-BY-rewrite
    shape) without a single-task global sort: a deterministic 1/32
    hash sample is persisted and sorted (sample-sized work) to pick
    16-quantile boundaries, the boundaries broadcast as one array row, and every row
    is bucketed map-side by counting boundaries ≤ its key. Per-bucket
    (count, min, max) is the proof of order: bucket ranges are disjoint
    and monotone, so concatenating per-bucket sorted output IS the total
    order — exactly what Spark's repartitionByRange + sortWithinPartitions
    does physically, made explicit and cross-engine checkable.

    Exact integer cents throughout; boundary ranks use the integer
    ceil-division identity ((i·n + K−1) div K) so both engines pick
    identical sample rows. At 100 TB the only global sort is over the
    sample (tune the mod so the sample stays driver-safe ~100k rows);
    Spark's own RangePartitioner does precisely this reservoir-style.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    # Persisted: the sample feeds both the rank window and the count —
    # without it each consumer rescans orders computing per-row md5.
    samp = tracked_persist(
        base.filter(
            md5_long(F.col("o_orderkey").cast("string")) % RANGE_SAMPLE_MOD == 0
        )
    )
    w = Window.orderBy("cents", "o_orderkey")  # sample-sized sort only
    ranked = samp.select("cents", F.row_number().over(w).alias("rn"))
    n = samp.agg(F.count(F.lit(1)).alias("n"))
    picks = spark.range(1, RANGE_K).crossJoin(F.broadcast(n))
    bnd = (
        ranked.join(
            F.broadcast(picks),
            F.col("rn") == F.expr(f"(id * n + {RANGE_K - 1}) div {RANGE_K}"),
        )
        .agg(F.sort_array(F.collect_list("cents")).alias("bs"))
    )
    assigned = base.crossJoin(F.broadcast(bnd)).select(
        "cents",
        F.size(F.filter("bs", lambda x: x <= F.col("cents"))).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning — the OPTIMIZE / auto-compaction
# maintenance pass every lakehouse table needs: given a manifest of file
# sizes, leave right-sized files alone and bin-pack the small ones into
# target-sized output groups. Like layout_skipping_report, the file layout
# is DERIVED relationally (a skewed shard assignment over events) so both
# engines see the identical manifest and the plan is pure arithmetic.
# ---------------------------------------------------------------------------

COMPACT_SHARDS = 16  # files per day partition in the derived manifest
COMPACT_ROW_OVERHEAD = 40  # bytes per row beyond the props payload
COMPACT_TARGET_X = 2  # target output size = 2 x mean input file size


@register(
    "layout_compaction_plan",
    category="analytics",
    bench=True,
    oracle=f"""
    WITH manifest AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CASE WHEN event_id % 2 = 0 THEN 0
                    ELSE CAST(event_id % {COMPACT_SHARDS} AS BIGINT) END AS file_id,
               CAST(SUM({COMPACT_ROW_OVERHEAD} + length(props)) AS BIGINT) AS file_bytes
        FROM events GROUP BY 1, 2
    ),
    target AS (
        SELECT CAST({COMPACT_TARGET_X} * (SUM(file_bytes) // COUNT(*)) AS BIGINT) AS tgt
        FROM manifest
    ),
    planned AS (
        SELECT m.day, m.file_id, m.file_bytes, t.tgt,
               m.file_bytes >= t.tgt AS right_sized,
               CASE WHEN m.file_bytes >= t.tgt THEN NULL
                    ELSE (SUM(CASE WHEN m.file_bytes >= t.tgt THEN 0 ELSE m.file_bytes END)
                              OVER (PARTITION BY m.day
                                    ORDER BY m.file_bytes DESC, m.file_id
                                    ROWS UNBOUNDED PRECEDING)
                          - m.file_bytes) // t.tgt END AS bin
        FROM manifest m CROSS JOIN target t
    ),
    bins AS (
        SELECT day, bin, CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes
        FROM planned WHERE NOT right_sized GROUP BY day, bin
    )
    SELECT p.day,
           CAST(COUNT(*) AS BIGINT) AS n_input_files,
           CAST(SUM(CASE WHEN p.right_sized THEN 1 ELSE 0 END) AS BIGINT) AS n_right_sized,
           CAST(SUM(CASE WHEN p.right_sized THEN 0 ELSE 1 END) AS BIGINT) AS n_small_files,
           CAST(COALESCE(b.n_bins, 0) AS BIGINT) AS n_output_bins,
           CAST(SUM(p.file_bytes) AS BIGINT) AS bytes_total,
           CAST(COALESCE(b.max_bin_bytes, 0) AS BIGINT) AS max_bin_bytes,
           CAST(round(COUNT(*) * 1.0 /
                (SUM(CASE WHEN p.right_sized THEN 1 ELSE 0 END)
                 + COALESCE(b.n_bins, 0)), 4)
                AS DOUBLE) AS file_reduction
    FROM planned p
    LEFT JOIN (SELECT day, COUNT(*) AS n_bins, MAX(bin_bytes) AS max_bin_bytes
               FROM bins GROUP BY day) b USING (day)
    GROUP BY p.day, b.n_bins, b.max_bin_bytes
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (OPTIMIZE) planning over a derived file manifest: per
    day partition, files at or above the target size are left alone;
    the small-file tail is packed into output bins by running-total
    division over a size-descending order — the deterministic
    bin-packing Delta/Iceberg compaction uses after sorting. Emits, per
    partition, the input/small/right-sized file counts, planned output
    bins, byte totals, the largest planned bin, and the file-count
    reduction factor.

    The manifest derives a skewed layout on purpose (even event_ids all
    land in file 0 — one whale file per day, ~{COMPACT_SHARDS}/2 x the
    mean; odd ids spread over the remaining shards) so both planner
    legs are exercised: the whale is right-sized and skipped, the tail
    packs ~4:1. The target is corpus-derived ({COMPACT_TARGET_X} x mean
    file size) in exact integer division, so Spark and DuckDB plan
    identical bins.

    Scale: the manifest is #files-sized (metadata, not data — at 100 TB
    a real manifest comes from the table log / ListFiles, millions of
    rows at most); one shuffle builds it from the fact table here, the
    target broadcasts as a scalar frame, and the packing window
    partitions by day — per-partition file counts, never data volume.
    The plan THIS op emits is what the rewrite job executes; planning
    cost is independent of table bytes.
    """
    ev = load_table(spark, sf_dir, "events")
    manifest = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.when(F.pmod("event_id", F.lit(2)) == 0, F.lit(0).cast("long"))
        .otherwise(F.pmod("event_id", F.lit(COMPACT_SHARDS)).cast("long"))
        .alias("file_id"),
    ).agg(
        F.sum(F.lit(COMPACT_ROW_OVERHEAD) + F.length("props"))
        .cast("long")
        .alias("file_bytes")
    )
    manifest = tracked_persist(manifest)
    target = manifest.agg(
        (
            F.lit(COMPACT_TARGET_X)
            * F.expr("sum(file_bytes) div count(*)")
        ).cast("long").alias("tgt")
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("file_bytes").desc(), "file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small_bytes = F.when(F.col("right_sized"), F.lit(0)).otherwise(
        F.col("file_bytes")
    )
    planned = (
        manifest.crossJoin(F.broadcast(target))
        .withColumn("right_sized", F.col("file_bytes") >= F.col("tgt"))
        .withColumn("cum_small", F.sum(small_bytes).over(w))
        .withColumn(
            "bin",
            F.when(F.col("right_sized"), F.lit(None).cast("long")).otherwise(
                F.expr("(cum_small - file_bytes) div tgt")
            ),
        )
    )
    planned = tracked_persist(planned)
    bins = (
        planned.filter(~F.col("right_sized"))
        .groupBy("day", "bin")
        .agg(F.sum("file_bytes").cast("long").alias("bin_bytes"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.max("bin_bytes").cast("long").alias("max_bin_bytes"),
        )
    )
    n_right = F.sum(F.when(F.col("right_sized"), 1).otherwise(0)).cast("long")
    return (
        planned.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_input_files"),
            n_right.alias("n_right_sized"),
            (F.count(F.lit(1)) - n_right).cast("long").alias("n_small_files"),
            F.sum("file_bytes").cast("long").alias("bytes_total"),
        )
        .join(F.broadcast(bins), "day", "left")
        .select(
            "day",
            "n_input_files",
            "n_right_sized",
            "n_small_files",
            F.coalesce(F.col("n_bins"), F.lit(0)).cast("long")
            .alias("n_output_bins"),
            "bytes_total",
            F.coalesce(F.col("max_bin_bytes"), F.lit(0)).cast("long")
            .alias("max_bin_bytes"),
            F.round(
                F.col("n_input_files")
                / (F.col("n_right_sized")
                   + F.coalesce(F.col("n_bins"), F.lit(0))),
                4,
            ).cast("double").alias("file_reduction"),
        )
    )


JCE_BUCKET_W = 16  # user-id histogram bucket width for the estimator


@register(
    "join_cardinality_estimate",
    category="layout",
    oracle=f"""
    WITH g AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('view', 'purchase')
        GROUP BY user_id, event_type
    ),
    v AS (SELECT user_id, user_id // {JCE_BUCKET_W} AS bucket, c
          FROM g WHERE event_type = 'view'),
    p AS (SELECT user_id, user_id // {JCE_BUCKET_W} AS bucket, c
          FROM g WHERE event_type = 'purchase'),
    hv AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_view,
                  CAST(COUNT(*) AS BIGINT) AS v_view
           FROM v GROUP BY bucket),
    hp AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_purch,
                  CAST(COUNT(*) AS BIGINT) AS v_purch
           FROM p GROUP BY bucket),
    act AS (
        SELECT v.bucket, CAST(SUM(CAST(v.c AS HUGEINT) * p.c) AS BIGINT) AS actual
        FROM v JOIN p ON v.user_id = p.user_id
        GROUP BY v.bucket
    )
    SELECT hv.bucket,
           n_view, v_view, n_purch, v_purch,
           CAST((CAST(n_view AS HUGEINT) * n_purch)
                // GREATEST(v_view, v_purch) AS BIGINT) AS est,
           COALESCE(act.actual, 0) AS actual,
           CAST(CASE WHEN COALESCE(act.actual, 0) = 0 THEN -1
                ELSE (1000000 * ABS((CAST(n_view AS HUGEINT) * n_purch)
                          // GREATEST(v_view, v_purch) - act.actual)
                      + act.actual // 2) // act.actual
           END AS BIGINT) AS abs_err_ppm
    FROM hv JOIN hp ON hv.bucket = hp.bucket
    LEFT JOIN act ON act.bucket = hv.bucket
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics audit: the textbook histogram join-size
    estimator |A ⋈ B| ≈ n_A·n_B / max(V(A,key), V(B,key)) evaluated
    per key-range bucket against the TRUE join cardinality — the
    calibration report behind every cost-based join reorder / broadcast
    decision (Spark's own CBO uses exactly these column stats). A = the
    view-event side, B = the purchase-event side, joined on user_id —
    both sides multi-row per key, so the uniformity assumption has real
    error to measure, bucket by bucket.

    The true cardinality needs NO raw join: with per-(user, type)
    counts c_v, c_p, the join size is Σ_user c_v·c_p — a thin join of
    two count frames. Everything is exact BIGINT: the estimator uses
    integer floor division (`//`/`div` truncate identically on these
    non-negative counts), the error is half-up integer ppm, and empty
    actuals report -1 (the estimator's divide-by-zero sentinel).

    Scale: ONE events scan collapsing map-side to the (user, type)
    count frame (persisted; both histogram legs and the actual leg read
    it), then key-bucket aggregations on #users rows and a user-keyed
    thin join. At 100 TB this is how the stats collector itself must
    run — histogram work on digests, never a second corpus pass.
    """
    ev = load_table(spark, sf_dir, "events")
    g = tracked_persist(
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bucket = F.expr(f"user_id div {JCE_BUCKET_W}").alias("bucket")
    v = g.filter(F.col("event_type") == "view").select("user_id", bucket, "c")
    p = g.filter(F.col("event_type") == "purchase").select(
        "user_id", bucket, "c"
    )
    hv = v.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_view"),
        F.count(F.lit(1)).cast("long").alias("v_view"),
    )
    hp = p.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_purch"),
        F.count(F.lit(1)).cast("long").alias("v_purch"),
    )
    act = (
        v.select("user_id", "bucket", F.col("c").alias("cv"))
        .join(p.select("user_id", F.col("c").alias("cp")), "user_id")
        .groupBy("bucket")
        # widen before multiplying: per-key count products can pass int64
        # at corpus scale where the oracle's HUGEINT stays exact
        .agg(
            F.sum(F.col("cv").cast("decimal(38,0)") * F.col("cp"))
            .cast("long").alias("actual")
        )
    )
    # widen before multiplying (same discipline as `actual` above): the
    # bucket-total product n_view * n_purch can pass int64 at corpus
    # scale — decimal(38,0) here, HUGEINT in the oracle
    est = F.expr(
        "(cast(n_view as decimal(38,0)) * n_purch)"
        " div greatest(v_view, v_purch)"
    )
    return (
        hv.join(hp, "bucket")
        .join(act, "bucket", "left")
        .select(
            "bucket", "n_view", "v_view", "n_purch", "v_purch",
            est.cast("long").alias("est"),
            F.coalesce("actual", F.lit(0)).cast("long").alias("actual"),
            F.when(F.coalesce("actual", F.lit(0)) == 0, F.lit(-1))
            .otherwise(
                F.expr(
                    "(1000000 * abs((cast(n_view as decimal(38,0)) "
                    "* n_purch) div greatest(v_view, v_purch) - actual) "
                    "+ actual div 2) div actual"
                )
            )
            .cast("long")
            .alias("abs_err_ppm"),
        )
    )
