"""Event-flow analytics over the events stream table: ordered funnels,
retention cohorts, and transition matrices — the session/user-journey
workloads every event warehouse runs (and the batch twins of the
streaming window operators in streaming_batch.py).

The reference has no event semantics at all (HLL over opaque elements,
HLL/HyperLogLog.py); these extend the engine's analytics surface. All
deterministic integer/date arithmetic — no floats except final rounded
ratios — so DuckDB oracles hash-match exactly.

Scale posture (100 TB of events):
- Every operator is one or two keyed aggregations over user_id — the
  natural partition key of an event store; no self-joins on the raw
  stream, no windows wider than one user's history.
- The funnel is one scan (funnel types pushed to the scan) and one
  shuffle on user_id; stage entry times chain as whole-partition window
  columns that all reuse that partitioning, so adding a stage adds a
  window pass, never a scan or an exchange.
- Transition counting shuffles once on user_id for the lag window, then
  aggregates a #types² matrix — constant-size output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "funnel_conversion",
    category="analytics",
    bench=True,
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS tc
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.tv
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.tc
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           ROUND((SELECT COUNT(*) FROM c) * 1.0 / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
           ROUND((SELECT COUNT(*) FROM p) * 1.0 / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → click → purchase): a user counts
    at each stage only if the stage event happens at-or-after their entry
    into the previous stage (first-touch semantics).

    Single-scan form: filter to the three funnel types (pushed to the
    scan), shuffle ONCE on user_id, then derive each stage's entry time
    as a sequential whole-partition window column — tv = min(view ts),
    tc = min(click ts ≥ tv), tp = min(purchase ts ≥ tc); each window
    reuses the same user partitioning, so the chain adds no exchange.
    Stage populations fall out of one global conditional count. The
    stage-per-scan alternative (3 type-filtered scans + broadcast-back
    joins) re-embeds every earlier stage's subplan in the final count
    legs — 6 event scans in the executed plan; this is 1 scan and 2
    exchanges."""
    w = Window.partitionBy("user_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn("tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("tv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("tc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    users = ev.groupBy("user_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    counts = users.agg(
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_click"),
        F.count("tp").alias("n_purchase"),
    )
    # an empty upstream stage has no conversion RATE — the oracle's
    # x*1.0/0 yields NULL in DuckDB, while an unguarded Spark division
    # is an ANSI DIVIDE_BY_ZERO crash; when() emits the matching null
    return counts.select(
        F.col("n_view").cast("long").alias("n_view"),
        F.col("n_click").cast("long").alias("n_click"),
        F.col("n_purchase").cast("long").alias("n_purchase"),
        F.when(
            F.col("n_view") > 0, F.round(F.col("n_click") / F.col("n_view"), 6)
        ).alias("view_to_click"),
        F.when(
            F.col("n_click") > 0,
            F.round(F.col("n_purchase") / F.col("n_click"), 6),
        ).alias("click_to_purchase"),
    )


@register(
    "retention_cohorts",
    category="analytics",
    bench=True,
    oracle="""
    WITH firstday AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               CAST(FLOOR(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
                   AS week_offset
        FROM events e JOIN firstday f ON f.user_id = e.user_id
    )
    SELECT cohort_day, week_offset, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity GROUP BY cohort_day, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-seen day, counted
    once per (cohort, week-offset) they were active in — the table behind
    every retention curve.

    One scan, one user_id shuffle: the cohort day is a whole-partition
    window min, the per-user distinct piggybacks on the same partitioning
    (grouping keys are a superset of the partition key — no exchange),
    and only the |cohorts|×|weeks| final count shuffles again. The
    agg-then-broadcast-back form scanned the stream twice."""
    w = Window.partitionBy("user_id")
    activity = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .withColumn("cohort_day", F.min("day").over(w))
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff("day", "cohort_day") / 7.0).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "event_transition_matrix",
    category="analytics",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), pairs AS (
        SELECT prev_type, event_type, COUNT(*) AS n
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    ((ts, event_id) total order, so ties are deterministic): transition
    counts and row-normalized probabilities — the journey-model input for
    next-action prediction and bot detection. One user_id shuffle for the
    lag window, then a #types² aggregate; the normalizing window runs on
    the matrix, not the stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


MAD_SCALE = 1.4826  # consistency constant: MAD ≈ sigma for normal data
MAD_K = 3.0


@register(
    "timeseries_anomaly_mad",
    category="analytics",
    oracle=f"""
    WITH m AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT e.user_id, m.med, abs(e.value - m.med) AS dev
        FROM events e JOIN m ON m.user_id = e.user_id
    ), mads AS (
        SELECT user_id, ANY_VALUE(med) AS med, quantile_cont(dev, 0.5) AS mad,
               COUNT(*) AS n_events
        FROM scored GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(ANY_VALUE(d.n_events) AS BIGINT) AS n_events,
           ROUND(ANY_VALUE(d.med), 4) AS med,
           ROUND(ANY_VALUE(d.mad), 4) AS mad,
           CAST(SUM(CASE WHEN d.mad > 0
                          AND s.dev > {MAD_K} * {MAD_SCALE} * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM scored s JOIN mads d ON d.user_id = s.user_id
    GROUP BY d.user_id
    """,
)
def timeseries_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly counts: an event is anomalous when its
    deviation from the user's median exceeds K·1.4826·MAD (the
    median-absolute-deviation robust z-score — outlier detection that a
    single spike cannot poison, unlike mean/stddev). Both engines compute
    interpolated medians with bit-identical IEEE arithmetic, verified
    exact cross-engine, so even the threshold comparison hash-matches.

    Two keyed aggregations (median, then MAD over deviations) joined
    back on the SHARED user_id partitioning (the groupBy outputs arrive
    hash-partitioned on the join key, so the joins add no exchange
    beyond the one event shuffle). Deliberately NOT broadcast: the
    per-user frames' cardinality is the user population — unbounded at
    100 TB, unlike the alphabet-sized rate/threshold broadcasts
    elsewhere in this module."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(F.percentile("value", 0.5).alias("med"))
    # Persisted (tracked): deviations feed both the MAD aggregate and the
    # threshold count — one events pass for scoring, not two.
    scored = tracked_persist(
        ev.join(med, "user_id").select(
            "user_id", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
        )
    )
    mads = scored.groupBy("user_id").agg(
        F.first("med").alias("med"),
        F.percentile("dev", 0.5).alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
    )
    flagged = scored.join(mads.select("user_id", "mad"), "user_id").groupBy(
        "user_id"
    ).agg(
        F.sum(
            F.when(
                (F.col("mad") > 0) & (F.col("dev") > MAD_K * MAD_SCALE * F.col("mad")), 1
            ).otherwise(0)
        ).cast("long").alias("n_anomalies")
    )
    return mads.join(flagged, "user_id").select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        "n_anomalies",
    )


SESSION_GAP_MIN = 30
SESSION_SLICE_SEC = 6 * 3600  # salt granularity; any value > the gap works

_SESSIONIZE_ORACLE = f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL {SESSION_GAP_MIN} MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """


@register(
    "sessionize_gap_ids",
    category="analytics",
    bench=True,
    oracle=_SESSIONIZE_ORACLE,
)
def sessionize_gap_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule sessionization with explicit session ids: a session breaks
    after SESSION_GAP_MIN (30) minutes of inactivity; session_id is the
    running count of breaks (lag → flag → running sum — the standard
    islands construction, assignment-level output that session_window's
    aggregate form doesn't give you). One user_id shuffle serves both
    windows and the final per-session rollup.

    Precision: the gap compares MICROSECOND timestamps — ts has
    sub-second precision, so a cast-to-long (whole-second) difference
    under-measures gaps in the (gap, gap+1s) band and merges sessions
    the oracle's interval comparison splits. Outputs use unix_millis
    (exact), never a double round-trip."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(prev)
            > SESSION_GAP_MIN * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.unix_millis(F.min("ts")).alias("session_start_ms"),
        F.unix_millis(F.max("ts")).alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sessionize_salted_stitch",
    category="analytics",
    oracle=_SESSIONIZE_ORACLE,
)
def sessionize_salted_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe sessionization — identical output (and oracle) to
    sessionize_gap_ids, but no single task ever holds one user's full
    history.

    `sessionize_gap_ids` partitions the window by user_id alone: correct,
    one shuffle, but a whale user (bot, ingestion replay) at 100 TB lands
    an entire timeline in one task. Salt-and-stitch bounds that:

    1. SALT: slice the timeline into fixed SESSION_SLICE_SEC (6-hour)
       blocks (slice = epoch div slice_len — pure arithmetic, any width
       strictly greater than the session gap works). The islands window
       runs per (user_id, slice), so per-task state is one user-slice,
       not one user-lifetime.
    2. LOCAL SESSIONS: reduce each (user, slice, local_id) run to a
       summary row — from here on, data volume is sessions, not events
       (map-side partial aggregation keeps the exchange session-sized).
    3. STITCH: re-run the SAME gap rule over the per-user session
       summaries ordered by start (start − lag(end) > gap): slice-border
       sessions whose inter-slice gap is within the threshold fuse, and
       chains spanning many slices fuse transitively — the window state
       here is bounded by sessions-per-user, orders of magnitude below
       events-per-user (a 6-hour slice emits at most a handful).

    Precision: every ordering and gap comparison runs at MICROSECONDS —
    the oracle's interval arithmetic — so this and gap_ids classify the
    identical session set (a millisecond-truncated compare could merge a
    gap the oracle splits, and ms-tied events could order differently);
    the output ms columns are exact integer div of the us extremes.
    """
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(f"cast(ts as long) div {SESSION_SLICE_SEC}").alias("slice"),
    )
    w_salt = Window.partitionBy("user_id", "slice").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w_salt)
    local_new = F.when(prev.isNull() | (F.col("ts_us") - prev > gap_us), 1).otherwise(0)
    local = (
        ev.withColumn("is_new", local_new)
        .withColumn(
            "local_sid",
            F.sum("is_new").over(w_salt.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "slice", "local_sid")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w_user = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    prev_end = F.lag("end_us").over(w_user)
    stitched_new = F.when(
        prev_end.isNull() | (F.col("start_us") - prev_end > gap_us), 1
    ).otherwise(0)
    stitched = local.withColumn("is_new", stitched_new).withColumn(
        "session_id",
        F.sum("is_new").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return stitched.groupBy("user_id", "session_id").agg(
        F.expr("min(start_us) div 1000").alias("session_start_ms"),
        F.expr("max(end_us) div 1000").alias("session_end_ms"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def _scd2_intervals(ev: DataFrame) -> DataFrame:
    """Lag-filter-lead SCD2 interval construction — the single copy
    shared by scd2_status_history and temporal_point_in_time: collapse
    consecutive same-type events per user into half-open
    [valid_from, valid_to) validity intervals (valid_to NULL = current
    state). The (ts, event_id) tie-break totals each user's timeline;
    LEAD re-evaluates over the FILTERED change rows — exactly the rows
    the oracles' starts/dim CTEs see. Input: (user_id, event_type, ts,
    event_id); output: (user_id, event_type, valid_from, valid_to)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    return changes.withColumn("valid_to", F.lead("ts").over(w)).select(
        "user_id", "event_type", F.col("ts").alias("valid_from"), "valid_to"
    )


@register(
    "scd2_status_history",
    category="analytics",
    bench=True,
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), starts AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           CAST(epoch_ms(valid_from) AS BIGINT) AS valid_from_ms,
           CAST(epoch_ms(valid_to) AS BIGINT) AS valid_to_ms,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM starts
    """,
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history built from an event log:
    collapse consecutive same-type events per user into validity intervals
    [valid_from, valid_to), open-ended on the current state — the
    lag-filter-lead construction every warehouse uses to turn change
    events into point-in-time-queryable dimension history
    (``_scd2_intervals``, shared with temporal_point_in_time). Two
    windows over one user_id shuffle; interval count is bounded by the
    number of actual state changes, not events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return _scd2_intervals(ev).select(
        "user_id",
        "event_type",
        # unix_millis is exact (integer us div 1000); the double
        # round-trip (cast double * 1000) can truncate an exact-ms
        # timestamp to k-1 on unlucky bit patterns
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "event_path_mining",
    category="eventflow",
    bench=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n_paths DESC, path
    LIMIT 20
    """,
)
def event_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, the length-3 extension of the transition
    matrix: the 20 most common consecutive event-type paths (A>B>C) across
    all user timelines, with the distinct-user support count — the
    journey-analysis shape behind funnel discovery.

    Scale: one user_id shuffle powers both lead() windows (same spec);
    paths aggregate with map-side combine on at most |types|³ keys. The
    (ts, event_id) tiebreak makes every user timeline a total order, so
    path counts are deterministic cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            # F.concat propagates NULL like the oracle's || — concat_ws
            # would silently SKIP a null component and group 'b>c' where
            # the oracle groups NULL
            F.concat(
                "event_type", F.lit(">"), "e2", F.lit(">"), "e3"
            ).alias("path"),
            "user_id",
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paths"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(20)
    )


@register(
    "event_cooccurrence_lift",
    category="eventflow",
    bench=True,
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    n_baskets AS (
        SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, day FROM baskets)
    ),
    supports AS (
        SELECT event_type, COUNT(*) AS supp FROM baskets GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               COUNT(*) AS supp_ab
        FROM baskets a
        JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                      AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.item_a, p.item_b,
           CAST(p.supp_ab AS BIGINT) AS supp_ab,
           CAST(sa.supp AS BIGINT) AS supp_a,
           CAST(sb.supp AS BIGINT) AS supp_b,
           ROUND(p.supp_ab * 1.0 / nb.n, 6) AS support,
           ROUND(p.supp_ab * 1.0 / sa.supp, 6) AS confidence_a_b,
           ROUND((p.supp_ab * 1.0 * nb.n) / (sa.supp * 1.0 * sb.supp), 6) AS lift
    FROM pairs p
    JOIN supports sa ON sa.event_type = p.item_a
    JOIN supports sb ON sb.event_type = p.item_b
    CROSS JOIN n_baskets nb
    """,
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence of event types inside a (user, day)
    basket: pair support, confidence, and lift — the association-rule
    table behind "users who X also Y" analyses.

    Scale posture: baskets come from one distinct over (user, day, type)
    — a single shuffle on the stream's natural keys. The pair join is a
    SELF-JOIN ON THE BASKET KEY, so each basket expands to at most
    |vocab|² pairs locally (vocab is the event-type alphabet, a constant
    ~dozens), never a cross-corpus product. Per-item supports and the
    basket total are item-alphabet-sized frames, broadcast back onto the
    pair aggregate. All counting in BIGINT; ratios rounded once at the
    edge, so the oracle hash-matches."""
    ev = load_table(spark, sf_dir, "events")
    baskets = tracked_persist(
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "event_type").distinct()
    )
    n_baskets = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    supports = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("supp"))
    b = baskets.select(
        "user_id", "day", F.col("event_type").alias("item_b")
    )
    pairs = (
        baskets.withColumnRenamed("event_type", "item_a")
        .join(b, ["user_id", "day"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
    )
    sa = supports.select(F.col("event_type").alias("item_a"), F.col("supp").alias("supp_a"))
    sb = supports.select(F.col("event_type").alias("item_b"), F.col("supp").alias("supp_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            F.col("supp_ab").cast("long").alias("supp_ab"),
            F.col("supp_a").cast("long").alias("supp_a"),
            F.col("supp_b").cast("long").alias("supp_b"),
            F.round(F.col("supp_ab") / F.col("n"), 6).alias("support"),
            F.round(F.col("supp_ab") / F.col("supp_a"), 6).alias("confidence_a_b"),
            # Stepwise double products, mirroring the oracle's
            # supp_ab*1.0*n / (supp_a*1.0*supp_b): a BIGINT product here
            # would round differently past 2^53 and wrap past 2^63.
            F.round(
                (F.col("supp_ab").cast("double") * F.col("n"))
                / (F.col("supp_a").cast("double") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )


T_CRIT = 1.96  # two-sided 95% normal critical value


@register(
    "experiment_ab_ttest",
    category="eventflow",
    bench=True,
    oracle=f"""
    WITH obs AS (
        SELECT event_type,
               user_id % 2 AS variant,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        FROM events
    ),
    stats AS (
        SELECT event_type, variant,
               COUNT(c) AS n,
               CAST(SUM(CAST(c AS HUGEINT)) AS HUGEINT) AS s1,
               CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
        FROM obs GROUP BY event_type, variant
    ),
    sides AS (
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b,
               a.s1 / (100.0 * a.n) AS mean_a,
               b.s1 / (100.0 * b.n) AS mean_b,
               (a.s2 - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / ((a.n - 1) * 10000.0) AS var_a,
               (b.s2 - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / ((b.n - 1) * 10000.0) AS var_b
        FROM stats a JOIN stats b
          ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
        WHERE a.n > 1 AND b.n > 1
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
           CASE WHEN var_a / n_a + var_b / n_b > 0
                THEN ROUND((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b), 4)
           END AS t_welch,
           CASE WHEN var_a / n_a + var_b / n_b > 0
                THEN ABS((mean_b - mean_a) / sqrt(var_a / n_a + var_b / n_b)) > {T_CRIT}
           END AS significant
    FROM sides
    """,
)
def experiment_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically split into two
    variants (parity of user_id — the hash-bucket assignment every
    experimentation platform uses), per-metric Welch t-statistic on event
    value, and a significance verdict at the 95% normal threshold.

    Determinism discipline: values become integer cents, so Σx and Σx²
    are EXACT decimal(38,0)/HUGEINT moments (order-independent; int64
    would overflow Σx² at ~1e9 rows per side — the r13 moment-sizing
    sweep upgraded every corpus-scale squared sum) — means and
    variances derive from two exact integers per side and round
    identically everywhere. ONE groupBy
    computes both variants' moments as conditional sums (map-side
    partials) — the split-per-variant-then-rejoin form re-embedded the
    fact scan once per variant.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        F.pmod("user_id", F.lit(2)).alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )

    def side(v: int, suffix: str):
        on = F.col("variant") == v
        return [
            # COUNT over the when-expression skips nulls twice over:
            # other-variant rows AND null metric values. A null reading
            # is not an observation — n, Σc and Σc² must agree on the
            # denominator (and the streaming twin's dropna fold,
            # streaming/pipelines.py, counts exactly the same rows)
            F.count(F.when(on, F.col("c"))).alias(f"n_{suffix}"),
            F.sum(F.when(on, F.col("c").cast("decimal(38,0)")))
            .alias(f"s1_{suffix}"),
            # widen one operand BEFORE the multiply so the square is
            # computed in decimal — long*long wraps above ~3.0e9 cents
            # where the oracle (HUGEINT) stays exact
            F.sum(F.when(on, F.col("c").cast("decimal(38,0)") * F.col("c")))
            .alias(f"s2_{suffix}"),
        ]

    # the oracle's variant inner join + n > 1 guard drops metrics
    # missing a side, a side with only null values, AND a side with a
    # single observation — Welch variance divides by n−1, so n = 1
    # would be an ANSI DIVIDE_BY_ZERO crash, not a statistic (the
    # streaming twin emits t = NULL below the same threshold)
    paired = (
        obs.groupBy("event_type")
        .agg(*side(0, "a"), *side(1, "b"))
        .filter((F.col("n_a") > 1) & (F.col("n_b") > 1))
    )
    mean_a = F.col("s1_a") / (F.col("n_a") * 100.0)
    mean_b = F.col("s1_b") / (F.col("n_b") * 100.0)
    var_a = (F.col("s2_a") - F.col("s1_a").cast("double") * F.col("s1_a") / F.col("n_a")) / (
        (F.col("n_a") - 1) * 10000.0
    )
    var_b = (F.col("s2_b") - F.col("s1_b").cast("double") * F.col("s1_b") / F.col("n_b")) / (
        (F.col("n_b") - 1) * 10000.0
    )
    # zero pooled variance (both sides constant) has no t statistic —
    # without the guard the division is an ANSI DIVIDE_BY_ZERO crash;
    # emit null t/significant like the oracle's CASE (and the streaming
    # twin's den > 0 guard)
    den = var_a / F.col("n_a") + var_b / F.col("n_b")
    t = F.when(den > 0, (mean_b - mean_a) / F.sqrt(den))
    return paired.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(t, 4).alias("t_welch"),
        (F.abs(t) > T_CRIT).alias("significant"),
    )


ACF_MAX_LAG = 7  # autocorrelation horizon: one week of daily lags


@register(
    "timeseries_autocorrelation",
    category="eventflow",
    oracle=f"""
    WITH pe AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM pe),
    days AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                    AS DATE) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM pe),
    cnt AS (
        SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
        FROM pe GROUP BY event_type, day
    ),
    s AS (
        SELECT t.event_type, d.day, COALESCE(c.c, 0) AS x
        FROM types t CROSS JOIN days d
        LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day
    ),
    st AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx
        FROM s GROUP BY event_type
    ),
    dev AS (
        SELECT s.event_type, s.day, st.n, st.sx,
               CAST(st.n AS HUGEINT) * s.x - st.sx AS d
        FROM s JOIN st ON st.event_type = s.event_type
    ),
    den AS (
        SELECT event_type, SUM(d * d) AS den FROM dev
        GROUP BY event_type
    ),
    lagged AS (
        SELECT a.event_type, a.n, a.sx, k.lag, a.d AS da, b.d AS db
        FROM dev a
        CROSS JOIN (SELECT unnest(generate_series(1, {ACF_MAX_LAG}))
                        AS lag) k
        JOIN dev b ON b.event_type = a.event_type
                  AND b.day = a.day + CAST(k.lag AS INTEGER)
    ),
    num AS (
        SELECT event_type, lag, MIN(n) AS n_days, MIN(sx) AS total_events,
               SUM(da * db) AS num
        FROM lagged GROUP BY event_type, lag
    )
    SELECT num.event_type, CAST(num.lag AS BIGINT) AS lag,
           num.n_days, num.total_events,
           CASE WHEN den.den > 0
                THEN CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
           END AS acf
    FROM num JOIN den ON den.event_type = num.event_type
    """,
)
def timeseries_autocorrelation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sample autocorrelation of each event type's daily volume series
    at lags 1..{ACF_MAX_LAG} — the weekly-periodicity detector that
    complements timeseries_seasonal_index (which ASSUMES the weekly
    cycle; the ACF measures whether and how strongly one exists:
    a spike at lag 7 is the signature). ACF_k = Σ(x_t−x̄)(x_{{t+k}}−x̄)
    / Σ(x_t−x̄)² over a DENSE day spine — missing days are real zeros
    of the volume series, not absent observations, so the spine is
    generated (sequence of the corpus day span × event types) and
    left-joined; skipping that inflates every lag's alignment.

    Determinism discipline: deviations are n-scaled to stay integer —
    d_t = n·x_t − Σx (exact decimal(38,0)/HUGEINT; the n² scaling
    cancels in the ratio) — and numerator/denominator are exact integer
    sums of d_t·d_{{t+k}} products; the single float step is one
    IEEE-correctly-rounded division, bit-equal cross-engine. A
    constant series (den = 0) emits NULL acf on both engines rather
    than a fabricated statistic.

    Scale: ONE events scan collapses map-side to the (type, day) count
    grid; everything after — spine join, deviation, ONE window pass
    producing all {ACF_MAX_LAG} leads (stacked, not re-scanned) — is
    #types × #days rows. At 100 TB the series stays metadata-sized
    while the scan does the work; the decimal widening keeps d² exact
    through ~10¹³ events/day.
    """
    ev = load_table(spark, sf_dir, "events")
    pe = tracked_persist(
        ev.select(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
    )
    bounds = pe.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = pe.select("event_type").distinct()
    cnt = pe.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = (
        types.crossJoin(days)
        .join(cnt, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("c", F.lit(0)).alias("x")
        )
    )
    st = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    dev = tracked_persist(
        s.join(F.broadcast(st), "event_type").select(
            "event_type", "day", "n", "sx",
            (F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("sx"))
            .alias("d"),
        )
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).alias("den")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    leads = dev.select(
        "event_type", "n", "sx", "d",
        *[
            F.lead("d", k).over(w).alias(f"d{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    stack_args = ", ".join(f"{k}, d{k}" for k in range(1, ACF_MAX_LAG + 1))
    num = (
        leads.select(
            "event_type", "n", "sx", "d",
            F.expr(f"stack({ACF_MAX_LAG}, {stack_args}) as (lag, dk)"),
        )
        .filter(F.col("dk").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.min("n").cast("long").alias("n_days"),
            F.min("sx").cast("long").alias("total_events"),
            F.sum(F.col("d") * F.col("dk")).alias("num"),
        )
    )
    return num.join(F.broadcast(den), "event_type").select(
        "event_type", F.col("lag").cast("long").alias("lag"),
        "n_days", "total_events",
        F.when(
            F.col("den") > 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("acf"),
    )


@register(
    "experiment_cuped_adjustment",
    category="eventflow",
    oracle="""
    WITH pe AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    cut AS (
        SELECT MIN(day) + CAST(datediff('day', MIN(day), MAX(day)) // 2
                               AS INTEGER) AS cutday
        FROM pe
    ),
    peru AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(SUM(CASE WHEN day < cutday THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN day >= cutday THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM pe CROSS JOIN cut GROUP BY user_id
    ),
    pool AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM peru
    ),
    scal AS (
        SELECT n, sx,
               CASE WHEN n * sxx - sx * sx > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
               END AS theta,
               CASE WHEN (n * sxx - sx * sx > 0)
                         AND (n * syy - sy * sy > 0)
                    THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                          * CAST(n * sxy - sx * sy AS DOUBLE))
                         / (CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
               END AS rho2
        FROM pool
    ),
    pv AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS HUGEINT) AS sx_v,
               CAST(SUM(y) AS HUGEINT) AS sy_v
        FROM peru GROUP BY variant
    )
    SELECT pv.variant, pv.n_users,
           CAST(sx_v AS DOUBLE) / pv.n_users AS mean_x,
           CAST(sy_v AS DOUBLE) / pv.n_users AS mean_y,
           s.theta,
           CAST(sy_v AS DOUBLE) / pv.n_users
               - s.theta * (CAST(sx_v AS DOUBLE) / pv.n_users
                            - CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE))
               AS mean_y_adj,
           s.rho2
    FROM pv CROSS JOIN scal s
    """,
)
def experiment_cuped_adjustment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013 — "Improving the Sensitivity of Online Controlled
    Experiments by Utilizing Pre-Experiment Data"): the covariate
    adjustment every mature experimentation platform applies before
    the t-test that experiment_ab_ttest runs. The corpus day span is
    split at its midpoint; each user's PRE-period activity count x is
    the covariate, the EXPERIMENT-period count y is the metric, the
    pooled θ = cov(x,y)/var(x) is fitted across both variants (fitting
    θ per-variant would bias the contrast — the whole point is a
    common pre-period regression), and each variant's adjusted mean is
    ȳ_v − θ·(x̄_v − x̄). ρ² = cov²/(var(x)·var(y)) is the achieved
    variance-reduction fraction: the adjusted estimator's variance is
    (1 − ρ²) of the raw one, which is why CUPED detects lifts the raw
    test misses at the same sample size.

    Determinism discipline: every sum (n, Σx, Σy, Σx², Σxy, Σy²) is an
    EXACT decimal(38,0)/HUGEINT integer; the n-scaled covariance and
    variances (n·Σxy − ΣxΣy ≈ n²·x·y ≈ 10²⁶ at a 10⁹-user corpus) stay
    inside 38 digits where their SQUARES would not — so ρ² is formed
    by multiplying two exact-integer-derived DOUBLES instead (every
    float step is an IEEE correctly-rounded +,−,×,÷ applied in the
    identical order on both engines, so the emitted doubles are
    bit-equal; no libm transcendentals anywhere). Degenerate pooled
    variance emits NULL θ/ρ² on both engines.

    Scale: ONE events scan (persisted thin projection) feeds the
    midpoint scalar and the per-user conditional aggregation (the
    user-keyed shuffle, sessionize posture); the moment folds are
    map-side partial aggregations to ONE pooled row + two variant
    rows, and the final select is a broadcast of two scalar frames.
    """
    ev = load_table(spark, sf_dir, "events")
    pe = tracked_persist(
        ev.select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
    )
    cut = pe.agg(
        F.date_add(
            F.min("day"),
            F.expr("datediff(max(day), min(day)) div 2").cast("int"),
        ).alias("cutday")
    )
    peru = (
        pe.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("cutday"), 1).otherwise(0))
            .cast("long").alias("x"),
            F.sum(F.when(F.col("day") >= F.col("cutday"), 1).otherwise(0))
            .cast("long").alias("y"),
        )
        .select(
            F.pmod("user_id", F.lit(2)).cast("long").alias("variant"),
            "x", "y",
        )
    )
    peru = tracked_persist(peru)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pool = peru.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    covn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varxn = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    varyn = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    scal = pool.select(
        "n", "sx",
        F.when(
            varxn > 0, covn.cast("double") / varxn.cast("double")
        ).alias("theta"),
        F.when(
            (varxn > 0) & (varyn > 0),
            (covn.cast("double") * covn.cast("double"))
            / (varxn.cast("double") * varyn.cast("double")),
        ).alias("rho2"),
    )
    pv = peru.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(dec("x")).alias("sx_v"),
        F.sum(dec("y")).alias("sy_v"),
    )
    mean_x = F.col("sx_v").cast("double") / F.col("n_users")
    mean_y = F.col("sy_v").cast("double") / F.col("n_users")
    pool_mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    return pv.crossJoin(F.broadcast(scal)).select(
        "variant", "n_users",
        mean_x.alias("mean_x"),
        mean_y.alias("mean_y"),
        "theta",
        (mean_y - F.col("theta") * (mean_x - pool_mean_x))
        .alias("mean_y_adj"),
        "rho2",
    )


@register(
    "timeseries_seasonal_index",
    category="eventflow",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    dows AS (
        SELECT (date_diff('day', DATE '1970-01-01', day) + 4) % 7 AS dow, n
        FROM daily
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND((SUM(n) * 1.0 / COUNT(*))
                 / ((SELECT SUM(n) FROM daily) * 1.0 / (SELECT COUNT(*) FROM daily)),
                 6) AS seasonal_index
    FROM dows GROUP BY dow
    """,
)
def timeseries_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: average daily event volume per
    weekday divided by the overall average daily volume — the index a
    capacity planner or anomaly detector divides out before comparing
    days (an index of 1.3 on Mondays means Mondays run 30% hot).

    Weekday is pure integer arithmetic on the epoch-day number
    ((days_since_1970 + 4) mod 7, anchored to 1970-01-01 = Thursday) —
    no locale/WEEKDAY-convention drift between engines. One fact scan:
    daily rollup, dow rollup of that, and the global mean as window
    sums over the 7-row dow frame — a separate totals agg +
    broadcast-back re-embedded (and re-ran) the fact scan a second
    time.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = daily.select(
        F.pmod(F.datediff("day", F.lit("1970-01-01").cast("date")) + 4, F.lit(7)).alias("dow"),
        "n",
    )
    w_all = Window.partitionBy()  # 7 dow rows
    return (
        daily.groupBy("dow")
        .agg(F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("n_events"))
        .select(
            F.col("dow").cast("long").alias("dow"),
            "n_days",
            "n_events",
            F.round(
                (F.col("n_events") / F.col("n_days"))
                / (F.sum("n_events").over(w_all) / F.sum("n_days").over(w_all)),
                6,
            ).alias("seasonal_index"),
        )
    )


_STATUS_TYPES = "('signup', 'error')"  # the event types that mark a state change


@register(
    "temporal_point_in_time",
    category="eventflow",
    bench=True,
    oracle=f"""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events WHERE event_type IN {_STATUS_TYPES}
    ),
    dim AS (
        SELECT user_id, event_type AS status, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM changes WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    facts AS (
        SELECT user_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(d.status, 'none') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(SUM(f.cents) AS BIGINT) AS revenue_cents
    FROM facts f
    LEFT JOIN dim d
      ON d.user_id = f.user_id AND d.valid_from <= f.ts
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY COALESCE(d.status, 'none')
    """,
)
def temporal_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join: purchases attributed to
    the status the user was in WHEN the purchase happened — the SCD2
    lookup every warehouse does when joining facts to a slowly-changing
    dimension. Status intervals are derived from the change-marker events
    (signup/error) as half-open [valid_from, valid_to) validity ranges;
    each fact matches at most one interval (intervals partition each
    user's timeline), and pre-history facts fall into 'none'.

    Scale: dimension derivation is one user-partitioned window; the
    interval lookup is an equi-join on user_id with the range predicate
    applied inside the matched (small) per-user interval list — both
    sides shuffle once on the same key, so with user-bucketed storage it
    is exchange-free. Never a cross join: the equi-key bounds candidates
    to one user's handful of intervals.
    """
    ev = load_table(spark, sf_dir, "events")
    # the change-marker intervals are the shared SCD2 construction
    # (_scd2_intervals) over the status-event slice
    dim = _scd2_intervals(
        ev.filter(F.expr(f"event_type IN {_STATUS_TYPES}")).select(
            "user_id", "event_type", "ts", "event_id"
        )
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("status"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    joined = facts.join(
        dim,
        (facts["user_id"] == dim["d_user"])
        & (dim["valid_from"] <= facts["ts"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
        "left",
    )
    return joined.groupBy(F.coalesce("status", F.lit("none")).alias("status")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum("cents").alias("revenue_cents"),
    )


_ATTR_WINDOW_DAYS = 7


@register(
    "attribution_multi_touch",
    category="eventflow",
    oracle=f"""
    WITH purch AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, ts, event_id, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    joined AS (
        SELECT p.pid, p.cents, t.channel, t.ts, t.event_id,
               ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY t.ts DESC, t.event_id DESC) AS rn_last,
               ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY t.ts ASC, t.event_id ASC) AS rn_first,
               COUNT(*) OVER (PARTITION BY p.pid) AS n_touches
        FROM purch p
        JOIN touch t ON t.user_id = p.user_id
                    AND t.ts <= p.pts
                    AND t.ts > p.pts - INTERVAL {_ATTR_WINDOW_DAYS} DAYS
    )
    SELECT channel,
           CAST(SUM(CASE WHEN rn_last = 1 THEN cents ELSE 0 END) AS BIGINT) AS last_touch_cents,
           CAST(SUM(CASE WHEN rn_first = 1 THEN cents ELSE 0 END) AS BIGINT) AS first_touch_cents,
           ROUND(SUM(cents * 1000000 // n_touches) / 100000000.0, 2) AS linear_attr_value,
           CAST(COUNT(DISTINCT CASE WHEN rn_last = 1 THEN pid END) AS BIGINT) AS n_last_touch_wins
    FROM joined
    GROUP BY channel
    """,
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, three models in one pass: every purchase's
    revenue is credited to the touch events (non-purchase interactions)
    in its trailing 7-day window — fully to the LAST touch, fully to
    the FIRST touch, and split evenly across all touches (linear) — the
    standard attribution triple a growth team compares. Revenue stays
    exact-integer everywhere: whole-credit models in cents, the linear
    split in floor-divided MICRO-cents per touch — so every sum is
    order-independent BIGINT and the only double is the final rounded
    report value (a float sum of cents/n would be summation-order
    dependent and could flip the rounding between engines).

    Scale: one equi-join on user_id with the time-window predicate
    applied inside each user's matched rows (both sides shuffle once on
    the same key — user-bucketed storage makes it exchange-free), then
    per-purchase window functions over the handful of touches each
    purchase matched. No cross join, no global window; the report is
    #channels rows (the window length is ``_ATTR_WINDOW_DAYS``).
    """
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("channel")
    )
    joined = purch.join(
        touch,
        (touch["user_id"] == purch["p_user"])
        & (touch["ts"] <= purch["pts"])
        & (touch["ts"] > purch["pts"] - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")),
    )
    w_last = Window.partitionBy("pid").orderBy(F.desc("ts"), F.desc("event_id"))
    w_first = Window.partitionBy("pid").orderBy(F.asc("ts"), F.asc("event_id"))
    w_all = Window.partitionBy("pid")
    ranked = joined.select(
        "pid",
        "cents",
        "channel",
        F.row_number().over(w_last).alias("rn_last"),
        F.row_number().over(w_first).alias("rn_first"),
        F.count(F.lit(1)).over(w_all).alias("n_touches"),
    )
    return ranked.groupBy("channel").agg(
        F.sum(F.when(F.col("rn_last") == 1, F.col("cents")).otherwise(0)).alias(
            "last_touch_cents"
        ),
        F.sum(F.when(F.col("rn_first") == 1, F.col("cents")).otherwise(0)).alias(
            "first_touch_cents"
        ),
        F.round(
            F.sum(F.expr("cents * 1000000 div n_touches")) / 100000000.0, 2
        ).alias("linear_attr_value"),
        F.count_distinct(
            F.when(F.col("rn_last") == 1, F.col("pid"))
        ).alias("n_last_touch_wins"),
    )


TTC_QS = (0.25, 0.5, 0.9)


@register(
    "funnel_time_to_convert",
    category="eventflow",
    oracle=f"""
    WITH first_signup AS (
        SELECT user_id, MIN(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase_after AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN first_signup s
          ON s.user_id = e.user_id AND e.ts >= s.s_ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ),
    delays AS (
        SELECT s.user_id,
               (epoch_us(p.p_ts) - epoch_us(s.s_ts)) // 60000000 AS delay_min
        FROM first_signup s
        JOIN first_purchase_after p USING (user_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           {", ".join(f"ROUND(quantile_cont(delay_min, {q}), 4) AS p{int(q * 100)}_min" for q in TTC_QS)}
    FROM delays
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: minutes from each user's FIRST
    signup to their first purchase AT OR AFTER it, summarized as interpolated
    quartile/median/p90 — the latency half of funnel analysis
    (``funnel_conversion`` counts who converts; this measures how fast).
    Delays are exact integer minutes (epoch-difference floor), so the
    only doubles are the interpolated quantiles, rounded identically in
    both engines.

    Scale: one scan (the two funnel types pushed to it) and one user_id
    shuffle — s_ts and the conditional p_ts are sequential
    whole-partition window columns, the per-user reduction reuses the
    same partitioning (the funnel_conversion pattern); the exact
    interpolated percentile sorts only the #converted-users delay list;
    at 100 TB swap in percentile_approx (mergeable sketch,
    tolerance-tested in tests/test_sketches.py) with the same shape.
    """
    w = Window.partitionBy("user_id")
    # First purchase AT OR AFTER the first signup (the funnel_conversion
    # stage rule) — NOT the globally-first purchase, which would silently
    # drop every user whose first purchase predates their signup.
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "s_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("s_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(F.max("s_ts").alias("s_ts"), F.max("p_ts").alias("p_ts"))
    )
    delays = per_user.filter(F.col("p_ts").isNotNull()).select(
        F.expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 60000000").alias(
            "delay_min"
        )
    )
    pct = F.percentile("delay_min", F.array(*[F.lit(q) for q in TTC_QS]))
    agg = delays.agg(
        F.count(F.lit(1)).alias("n_converted"), pct.alias("qs")
    )
    return agg.select(
        "n_converted",
        *[
            F.round(F.col("qs")[i], 4).alias(f"p{int(q * 100)}_min")
            for i, q in enumerate(TTC_QS)
        ],
    )


CEP_SPAN_MIN = 1440  # pattern must complete within this many minutes (24 h)


@register(
    "event_pattern_cep",
    category="eventflow",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, ts,
               LAG(event_type, 1) OVER w AS t1,
               LAG(event_type, 2) OVER w AS t2,
               LAG(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(ts2)) // 60000000 AS span_min
        FROM seq
        WHERE event_type = 'purchase' AND t1 = 'error' AND t2 = 'error'
          AND epoch_us(ts) - epoch_us(ts2) <= {CEP_SPAN_MIN * 60000000}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(span_min) AS BIGINT) AS min_span_min,
           CAST(MAX(span_min) AS BIGINT) AS max_span_min
    FROM matches
    """,
)
def event_pattern_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern matching (the MATCH_RECOGNIZE shape Spark
    lacks natively): find every STRICTLY CONSECUTIVE error→error→purchase
    sequence in a user's timeline that completes within 24 hours — the
    'user hit two failures then converted anyway' incident signature.
    Expressed as lag chains over the per-user total order plus an exact
    epoch-microsecond span predicate; adjacency, ordering, and the time
    bound are all explicit.

    Scale: ONE user-partitioned window pass (two lags share the same
    window frame) and a constant-size report — pattern length extends by
    adding lags, never by self-joining the stream. For patterns with
    gaps ('error then ANY purchase later') see temporal/as-of joins;
    strict contiguity is precisely what the lag chain encodes.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("ts", 2).over(w).alias("ts2"),
    )
    span_us = F.unix_micros("ts") - F.unix_micros("ts2")
    matches = seq.filter(
        (F.col("event_type") == "purchase")
        & (F.col("t1") == "error")
        & (F.col("t2") == "error")
        & (span_us <= CEP_SPAN_MIN * 60000000)
    ).select("user_id", F.expr("(unix_micros(ts) - unix_micros(ts2)) div 60000000").alias("span_min"))
    return matches.agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("span_min").alias("min_span_min"),
        F.max("span_min").alias("max_span_min"),
    )


RFM_Q = 5  # quintile buckets per RFM dimension
RFM_M_BUCKET = 100_000  # monetary histogram grain: $1000 in cents


def _rfm_cust_sql() -> str:
    return f"""
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders)) AS recency,
               COUNT(*) AS freq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   // {RFM_M_BUCKET} AS mb
        FROM orders GROUP BY o_custkey"""


def _rfm_thresholds_sql(metric: str) -> str:
    """4 quintile boundary values of ``metric`` over cust, as one sorted
    list — the bounded-histogram rank pick (cum >= ceil(q·n/5))."""
    return f"""
        SELECT list_sort(list(v)) AS bs FROM (
            SELECT i, MIN(val) AS v FROM (
                SELECT val, SUM(c) OVER (ORDER BY val) AS cum,
                       (SELECT COUNT(*) FROM cust) AS n
                FROM (SELECT {metric} AS val, COUNT(*) AS c FROM cust GROUP BY 1)
            ) h, (SELECT unnest(range(1, {RFM_Q})) AS i)
            WHERE cum >= (i * n + {RFM_Q - 1}) // {RFM_Q}
            GROUP BY i
        )"""


@register(
    "event_rfm_segmentation",
    category="eventflow",
    oracle=f"""
    WITH cust AS ({_rfm_cust_sql()}),
    rb AS ({_rfm_thresholds_sql("recency")}),
    fb AS ({_rfm_thresholds_sql("freq")}),
    mb_t AS ({_rfm_thresholds_sql("mb")})
    SELECT CAST(1 + len(list_filter(rb.bs, t -> t < c.recency)) AS INTEGER) AS r_bucket,
           CAST(1 + len(list_filter(fb.bs, t -> t < c.freq)) AS INTEGER) AS f_bucket,
           CAST(1 + len(list_filter(mb_t.bs, t -> t < c.mb)) AS INTEGER) AS m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(FLOOR(SUM(c.monetary) * 1.0 / COUNT(*)) AS BIGINT) AS avg_monetary_cents
    FROM cust c CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb_t
    GROUP BY 1, 2, 3
    """,
)
def event_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored into quintile buckets of
    recency (days since last order, as of the corpus max date), frequency
    (order count) and monetary value (exact lifetime cents), reported as
    segment cells with size and average value — the behavioral cohort
    table CRM/churn pipelines key on. Buckets are ascending value order
    (1 = lowest recency/freq/monetary); consumers flip recency for
    "best customer" semantics.

    Scale: quintile thresholds come from value HISTOGRAMS, not a global
    sort — recency and frequency are naturally low-cardinality integers
    and monetary is bucketed to $1000 grain, so each histogram (and the
    only ordered windows) is value-range-sized, never customer-sized; the
    4 boundary values per metric broadcast as one array row (the
    layout_range_sort_buckets pattern). One customer-grain aggregation +
    three tiny histogram reductions. All arithmetic exact BIGINT; the
    rank pick uses the integer ceil identity so both engines choose
    identical boundaries."""
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("ref"))
    cust = tracked_persist(
        orders.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("ref"), F.max("o_orderdate")).alias("recency"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary"),
        )
        .withColumn(
            "mb",
            F.floor(F.col("monetary") / RFM_M_BUCKET).cast("long"),
        )
    )

    def thresholds(metric: str, out: str) -> DataFrame:
        hist = cust.groupBy(F.col(metric).alias("val")).agg(
            F.count(F.lit(1)).alias("c")
        )
        wh = Window.orderBy("val")  # histogram-sized, never customer-sized
        n = cust.agg(F.count(F.lit(1)).alias("n"))
        cum = hist.withColumn("cum", F.sum("c").over(wh)).crossJoin(F.broadcast(n))
        qs = spark.range(1, RFM_Q).withColumnRenamed("id", "i")
        return (
            cum.join(
                F.broadcast(qs),
                F.col("cum") >= F.expr(f"(i * n + {RFM_Q - 1}) div {RFM_Q}"),
            )
            .groupBy("i")
            .agg(F.min("val").alias("v"))
            .agg(F.sort_array(F.collect_list("v")).alias(out))
        )

    score = lambda bs, v: (
        F.lit(1) + F.size(F.filter(bs, lambda t: t < F.col(v)))
    ).cast("int")
    return (
        cust.crossJoin(F.broadcast(thresholds("recency", "rbs")))
        .crossJoin(F.broadcast(thresholds("freq", "fbs")))
        .crossJoin(F.broadcast(thresholds("mb", "mbs")))
        .groupBy(
            score("rbs", "recency").alias("r_bucket"),
            score("fbs", "freq").alias("f_bucket"),
            score("mbs", "mb").alias("m_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.floor(F.sum("monetary") * 1.0 / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_monetary_cents"),
        )
    )


@register(
    "survival_km_table",
    category="eventflow",
    bench=True,
    oracle="""
    WITH pe AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type IN ('signup', 'purchase')
    ),
    entries AS (
        SELECT user_id, MIN(ts) AS entry_ts FROM pe
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    maxday AS (
        SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS horizon FROM pe
    ),
    convs AS (
        SELECT e.user_id, MIN(p.ts) AS conv_ts
        FROM entries e JOIN pe p ON p.user_id = e.user_id
        WHERE p.event_type = 'purchase' AND p.ts >= e.entry_ts
        GROUP BY e.user_id
    ),
    dur AS (
        SELECT CAST(date_trunc('week', e.entry_ts) AS DATE) AS cohort_week,
               CASE WHEN c.conv_ts IS NOT NULL
                    THEN datediff('day',
                         CAST(date_trunc('day', e.entry_ts) AS DATE),
                         CAST(date_trunc('day', c.conv_ts) AS DATE))
                    ELSE datediff('day',
                         CAST(date_trunc('day', e.entry_ts) AS DATE),
                         maxday.horizon)
               END AS t,
               CASE WHEN c.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM entries e LEFT JOIN convs c ON e.user_id = c.user_id
        CROSS JOIN maxday
    ),
    km AS (
        SELECT cohort_week, t,
               CAST(SUM(ev) AS BIGINT) AS n_events,
               CAST(SUM(1 - ev) AS BIGINT) AS n_censored
        FROM dur GROUP BY cohort_week, t
    ),
    risk AS (
        SELECT cohort_week, t, n_events, n_censored,
               CAST(SUM(n_events + n_censored)
                        OVER (PARTITION BY cohort_week) -
                    (SUM(n_events + n_censored)
                        OVER (PARTITION BY cohort_week ORDER BY t)
                     - (n_events + n_censored)) AS BIGINT) AS n_risk
        FROM km
    )
    SELECT cohort_week, CAST(t AS BIGINT) AS t, n_risk, n_events,
           n_censored,
           CAST((1000000 * n_events + n_risk // 2) // n_risk AS BIGINT)
               AS hazard_ppm
    FROM risk
    """,
)
def survival_km_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival table for signup → first-purchase
    conversion, per weekly entry cohort. funnel_time_to_convert reports
    delay quantiles over CONVERTERS ONLY — the biased view; survival
    analysis is the unbiased one: users who never purchase are
    RIGHT-CENSORED at the observation horizon (the corpus's last day)
    and stay in the risk set until then. Per (cohort_week, duration day
    t): n_risk (users whose observed time >= t), n_events (conversions
    at exactly t), n_censored (horizon exits at t), and the discrete
    hazard d/n as an EXACT half-up-rounded integer ppm — the classic KM
    estimator's columns, all in exact integer arithmetic (the survival
    product itself is one fold over this table, left to the consumer so
    no cross-engine float-product order can diverge).

    n_risk comes from the textbook identity n(t) = N_cohort − Σ_{s<t}
    (d(s)+c(s)), computed as a cumulative window over the KM frame —
    #distinct duration days per cohort (≤ the corpus day span), never
    user rows.

    Scale: ONE events scan (persisted projection of the two relevant
    types) feeds the entry aggregation, the conversion probe (shuffle
    on user_id — broadcastable only at toy scale, so it is NOT
    broadcast), and the scalar horizon; everything after the per-user
    durations frame is metadata-sized. At 100 TB the user-keyed shuffle
    is the cost, exactly like sessionize.
    """
    ev = load_table(spark, sf_dir, "events")
    pe = tracked_persist(
        ev.filter(F.col("event_type").isin("signup", "purchase")).select(
            "user_id", "event_type", "ts"
        )
    )
    entries = pe.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("entry_ts"))
    horizon = pe.agg(
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("horizon")
    )
    convs = (
        pe.filter(F.col("event_type") == "purchase")
        .join(entries, "user_id")
        .filter(F.col("ts") >= F.col("entry_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    dur = (
        entries.join(convs, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.to_date(F.date_trunc("week", "entry_ts")).alias("cohort_week"),
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(
                    F.to_date(F.date_trunc("day", "conv_ts")),
                    F.to_date(F.date_trunc("day", "entry_ts")),
                ),
            )
            .otherwise(
                F.datediff(
                    F.col("horizon"),
                    F.to_date(F.date_trunc("day", "entry_ts")),
                )
            )
            .alias("t"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    km = dur.groupBy("cohort_week", "t").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("n_censored"),
    )
    wcum = Window.partitionBy("cohort_week").orderBy("t")
    wtot = Window.partitionBy("cohort_week")
    exits = F.col("n_events") + F.col("n_censored")
    risk = km.select(
        "cohort_week", F.col("t").cast("long").alias("t"),
        "n_events", "n_censored",
        (
            F.sum(exits).over(wtot) - (F.sum(exits).over(wcum) - exits)
        ).cast("long").alias("n_risk"),
    )
    return risk.select(
        "cohort_week", "t", "n_risk", "n_events", "n_censored",
        F.expr("(1000000 * n_events + n_risk div 2) div n_risk")
        .cast("long").alias("hazard_ppm"),
    )


@register(
    "survival_nelson_aalen",
    category="eventflow",
    oracle="""
    WITH pe AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type IN ('signup', 'purchase')
    ),
    entries AS (
        SELECT user_id, MIN(ts) AS entry_ts FROM pe
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    maxday AS (
        SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS horizon FROM pe
    ),
    convs AS (
        SELECT e.user_id, MIN(p.ts) AS conv_ts
        FROM entries e JOIN pe p ON p.user_id = e.user_id
        WHERE p.event_type = 'purchase' AND p.ts >= e.entry_ts
        GROUP BY e.user_id
    ),
    dur AS (
        SELECT CAST(date_trunc('week', e.entry_ts) AS DATE) AS cohort_week,
               CASE WHEN c.conv_ts IS NOT NULL
                    THEN datediff('day',
                         CAST(date_trunc('day', e.entry_ts) AS DATE),
                         CAST(date_trunc('day', c.conv_ts) AS DATE))
                    ELSE datediff('day',
                         CAST(date_trunc('day', e.entry_ts) AS DATE),
                         maxday.horizon)
               END AS t,
               CASE WHEN c.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM entries e LEFT JOIN convs c ON e.user_id = c.user_id
        CROSS JOIN maxday
    ),
    km AS (
        SELECT cohort_week, t,
               CAST(SUM(ev) AS BIGINT) AS n_events,
               CAST(SUM(1 - ev) AS BIGINT) AS n_censored
        FROM dur GROUP BY cohort_week, t
    ),
    risk AS (
        SELECT cohort_week, t, n_events, n_censored,
               CAST(SUM(n_events + n_censored)
                        OVER (PARTITION BY cohort_week) -
                    (SUM(n_events + n_censored)
                        OVER (PARTITION BY cohort_week ORDER BY t)
                     - (n_events + n_censored)) AS BIGINT) AS n_risk
        FROM km
    )
    SELECT cohort_week, CAST(t AS BIGINT) AS t, n_risk, n_events,
           n_censored,
           CAST(SUM((1000000 * n_events + n_risk // 2) // n_risk)
                OVER (PARTITION BY cohort_week ORDER BY t) AS BIGINT)
               AS cum_hazard_x1e6,
           CAST(SUM((1000000000000 * CAST(n_events AS HUGEINT)
                     + CAST(n_risk AS HUGEINT) * n_risk // 2)
                    // (CAST(n_risk AS HUGEINT) * n_risk))
                OVER (PARTITION BY cohort_week ORDER BY t) AS BIGINT)
               AS cum_var_x1e12
    FROM risk
    """,
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard table — the integrator over
    survival_km_table's per-duration frame: H(t) = Σ_{s≤t} d(s)/n(s)
    and Aalen's variance estimator Var(t) = Σ_{s≤t} d(s)/n(s)², per
    weekly signup cohort. Where the KM table answers "what is the
    instantaneous conversion pressure at day t", the NA estimator
    answers "how much conversion pressure has accumulated by day t" —
    the standard quantity for comparing cohorts' lifetime behavior and
    the input to the exp(−H) survival transform (left to the consumer:
    exp is libm-dependent and would break cross-engine bit equality).

    Exactness discipline: each increment is half-up-rounded in integer
    micro-units BEFORE summation (Σ round(10⁶·d/n), Σ round(10¹²·d/n²))
    so the cumulative values are sums of integers — no float
    accumulation order to diverge. The variance term widens n·n and
    10¹²·d to decimal(38,0)/HUGEINT before multiplying: at a 10⁹-user
    cohort 10¹²·d alone passes int64.

    Builds on the module-level survival_km_table (same single persisted
    events projection, same risk-set identity); everything added here
    is a cumulative window over the metadata-sized (cohort, duration)
    frame — #cohorts × #distinct-duration-days rows, never user rows.
    """
    wcum = Window.partitionBy("cohort_week").orderBy("t")
    base = survival_km_table(spark, sf_dir)
    var_inc = F.expr(
        "(1000000000000 * cast(n_events as decimal(38,0))"
        " + cast(n_risk as decimal(38,0)) * n_risk div 2)"
        " div (cast(n_risk as decimal(38,0)) * n_risk)"
    )
    return base.select(
        "cohort_week", "t", "n_risk", "n_events", "n_censored",
        F.sum("hazard_ppm").over(wcum).cast("long")
        .alias("cum_hazard_x1e6"),
        F.sum(var_inc).over(wcum).cast("long").alias("cum_var_x1e12"),
    )


Z_CRIT_SQ_X10K = 38_416  # 1.96² × 10⁴ — two-sided 95% in exact integers


@register(
    "funnel_significance_ztest",
    category="eventflow",
    oracle=f"""
    WITH pe AS (SELECT user_id, event_type, ts FROM events),
    su AS (
        SELECT user_id, user_id % 2 AS variant, MIN(ts) AS s_ts
        FROM pe WHERE event_type = 'signup' GROUP BY user_id
    ),
    goal AS (
        SELECT e.event_type, su.variant, su.user_id,
               MAX(CASE WHEN e.ts >= su.s_ts
                         AND e.ts < su.s_ts + INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END) AS conv
        FROM su JOIN pe e ON e.user_id = su.user_id
        WHERE e.event_type != 'signup'
        GROUP BY e.event_type, su.variant, su.user_id
    ),
    base AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n
             FROM su GROUP BY variant),
    cv AS (
        SELECT event_type, variant, CAST(SUM(conv) AS BIGINT) AS c
        FROM goal GROUP BY event_type, variant
    ),
    wide AS (
        SELECT cv.event_type,
               MAX(CASE WHEN cv.variant = 0 THEN cv.c END) AS c0,
               MAX(CASE WHEN cv.variant = 1 THEN cv.c END) AS c1,
               MAX(CASE WHEN b.variant = 0 THEN b.n END) AS n0,
               MAX(CASE WHEN b.variant = 1 THEN b.n END) AS n1
        FROM cv JOIN base b ON b.variant = cv.variant
        GROUP BY cv.event_type
    )
    SELECT event_type, n0, c0, n1, c1,
           CAST(round(c0 * 1.0 / n0, 6) AS DOUBLE) AS rate0,
           CAST(round(c1 * 1.0 / n1, 6) AS DOUBLE) AS rate1,
           CASE WHEN (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1) THEN 0
                ELSE CAST((1000000 * CAST(c0*n1 - c1*n0 AS HUGEINT)
                               * (c0*n1 - c1*n0) * (n0 + n1)
                           + (CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                              * (n0 + n1 - c0 - c1)) // 2)
                          // (CAST(n0 AS HUGEINT) * n1 * (c0 + c1)
                              * (n0 + n1 - c0 - c1)) AS BIGINT)
           END AS zsq_micro,
           CASE WHEN (c0 + c1) = 0 OR (c0 + c1) = (n0 + n1) THEN FALSE
                ELSE 10000 * CAST(c0*n1 - c1*n0 AS HUGEINT)
                         * (c0*n1 - c1*n0) * (n0 + n1)
                     >= {Z_CRIT_SQ_X10K} * CAST(n0 AS HUGEINT) * n1
                         * (c0 + c1) * (n0 + n1 - c0 - c1)
           END AS significant
    FROM wide
    """,
)
def funnel_significance_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on funnel conversion — the PROPORTIONS
    complement of experiment_ab_ttest's Welch test on means: per goal
    event type, users split by deterministic id parity, conversion =
    reaching the goal within one hour of first signup, and the pooled
    two-proportion z² computed ENTIRELY in exact integer arithmetic.
    With p_i = c_i/n_i the algebra collapses to
    z² = (c0·n1 − c1·n0)²·(n0+n1) / (n0·n1·(c0+c1)·(n0+n1−c0−c1)),
    emitted as a half-up micro-unit integer; the significance verdict
    cross-multiplies against 1.96²·10⁴ = Z_CRIT_SQ_X10K — no sqrt, no
    division, no float anywhere on the decision path. Degenerate pooled
    variance (all convert / none convert) reports z² = 0, not
    significant — identical rates are evidence of nothing.

    Digit budget: the verdict products peak at ~(c·n)²·n ≈ n⁵ — inside
    the shared 38-digit DECIMAL/HUGEINT headroom through ~3×10⁷ users
    per variant per type. Past that bound the failure modes DIFFER:
    DuckDB HUGEINT overflow raises, while Spark decimal(38,0) overflow
    in default non-ANSI mode returns NULL silently — so a breach
    surfaces as a harness hash mismatch (NULL vs error), not as a loud
    error on both engines. The bound itself is ~30× the 100 TB per-cell
    population this query partitions to, so the headroom is real; the
    sentence above records the detection mode honestly.

    Scale: ONE events scan (persisted projection) feeds the entry
    aggregation and the goal probe (user-keyed shuffle, the sessionize
    posture); everything after the per-(type, variant) counts is a
    #types-row computation.
    """
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pe = tracked_persist(ev.select("user_id", "event_type", "ts"))
    su = (
        pe.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
        .select(
            "user_id", "s_ts", (F.col("user_id") % 2).alias("variant")
        )
    )
    goal = (
        pe.filter(F.col("event_type") != "signup")
        .join(su, "user_id")
        .groupBy("event_type", "variant", "user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("ts") >= F.col("s_ts"))
                    & (F.col("ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
    )
    base = su.groupBy("variant").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cv = goal.groupBy("event_type", "variant").agg(
        F.sum("conv").cast("long").alias("c")
    )
    wide = (
        cv.join(F.broadcast(base), "variant")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
            F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
            F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
            F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        )
    )
    # exact-integer z² pieces, widened to decimal BEFORE any product
    num = (
        "(cast(c0 as decimal(38,0)) * n1 - cast(c1 as decimal(38,0)) * n0)"
    )
    den = (
        "(cast(n0 as decimal(38,0)) * n1 * (c0 + c1) * (n0 + n1 - c0 - c1))"
    )
    degenerate = (F.col("c0") + F.col("c1") == 0) | (
        F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1")
    )
    return wide.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("c0").cast("long").alias("c0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("c1").cast("long").alias("c1"),
        F.round(F.col("c0") * 1.0 / F.col("n0"), 6).cast("double").alias("rate0"),
        F.round(F.col("c1") * 1.0 / F.col("n1"), 6).cast("double").alias("rate1"),
        F.when(degenerate, F.lit(0))
        .otherwise(
            F.expr(
                f"(1000000 * {num} * {num} * (n0 + n1) + {den} div 2) div {den}"
            )
        )
        .cast("long")
        .alias("zsq_micro"),
        F.when(degenerate, F.lit(False))
        .otherwise(
            F.expr(
                f"10000 * {num} * {num} * (n0 + n1) "
                f">= {Z_CRIT_SQ_X10K} * {den}"
            )
        )
        .alias("significant"),
    )
