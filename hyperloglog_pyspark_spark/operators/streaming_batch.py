"""Time-window aggregations — the batch forms of the streaming operators
(SURVEY.md §2.2 row "streaming"): tumbling, sliding and session windows
over the events table.

These are the same expressions the Structured Streaming pipelines in
streaming/pipelines.py run over an unbounded source (readStream +
withWatermark); batch execution makes them DuckDB-oracle-checkable, and
Spark guarantees batch/streaming semantic parity for windowed aggs. The
true-streaming forms (watermarks, late-data drop, stateful HLL) are
exercised in tests/test_streaming.py.

Output discipline: window starts surfaced as epoch milliseconds
(unix_millis ↔ epoch_ms both floor), value sums in DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.money import dec_price
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "window_tumbling",
    category="streaming",
    bench=True,
    oracle="""
    SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS window_start_ms,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: count, exact distinct
    users, value sum.

    Streaming form: identical agg over readStream with
    withWatermark("ts", ...) — HLL sketch state (bounded) replaces exact
    distinct for unbounded keyspaces (see streaming/pipelines.py).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(dec_price("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


@register(
    "window_sliding",
    category="streaming",
    bench=True,
    oracle="""
    SELECT CAST(epoch_ms(time_bucket(INTERVAL 30 MINUTES, ts) - o.off * INTERVAL 30 MINUTES) AS BIGINT)
               AS window_start_ms,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    CROSS JOIN (SELECT unnest([0, 1]) AS off) o
    GROUP BY 1
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — every event lands
    in exactly two overlapping windows (the oracle materializes both
    window starts per row; Spark's window() generator does the same)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec_price("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "total_value",
        )
    )


@register(
    "window_session",
    category="streaming",
    bench=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 15 MINUTES
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    )
    SELECT user_id,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: 15-minute inactivity gap per user.

    Spark's session_window merges events whose gap to the previous event
    is < 15 min (window extends to last_ts + gap, half-open) — the oracle
    reproduces this with the classic gaps-and-islands construction
    (new session when ts − prev ≥ gap).

    Scale: sessionization shuffles once on user_id; state per key is
    bounded by the gap in streaming mode (state eviction past watermark).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )

# ONE definition of the hourly series (Spark + SQL twins): every
# gap-fill/drift query derives from this aggregation, so what "hourly"
# means (slot truncation, DECIMAL(12,2) money cast) lives in one place.
_HOURLY_SQL = """hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS slot,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    )"""


def _hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (event_type, hour) decimal-exact value series — Spark twin of
    _HOURLY_SQL; one fact-scale aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("slot")).agg(
        F.sum(dec_price("value")).cast("double").alias("v")
    )


# Shared hourly-series scaffold for the gap-fill queries: ONE fact scan
# builds the hourly series; the dense output grid and its bounds derive
# from that |types| x |slots| frame, never from raw events again. The
# oracle mirrors with the same CTE chain.
_HOURLY_GRID_CTES = f"""{_HOURLY_SQL},
    bounds AS (SELECT MIN(slot) AS t0, MAX(slot) AS t1 FROM hourly),
    grid AS (
        SELECT e.event_type, g.slot
        FROM (SELECT DISTINCT event_type FROM hourly) e
        CROSS JOIN (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
                    FROM bounds) g
    )"""


def _hourly_grid(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(hourly, grid): the aggregated hourly series (persisted — it feeds
    the grid derivation, the bounds, and the fill join) and the dense
    per-type hourly grid. MIN/MAX of the truncated slots equal the
    truncated MIN/MAX of raw ts, so bounds need no second fact scan."""
    hourly = tracked_persist(_hourly_series(spark, sf_dir))
    bounds = hourly.agg(F.min("slot").alias("t0"), F.max("slot").alias("t1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("slot"),
        )
    )
    return hourly, grid


@register(
    "timeseries_resample_ffill",
    category="streaming",
    oracle=f"""
    WITH {_HOURLY_GRID_CTES}
    SELECT g.event_type,
           CAST(epoch_ms(g.slot) AS BIGINT) AS slot_ms,
           h.v IS NOT NULL AS observed,
           last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.slot
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill
    FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.slot = g.slot
    """,
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the events series onto a dense hourly grid per event type,
    forward-filling empty slots from the last observation — the gap-fill
    step before any window/trend computation on irregular telemetry.

    Scale: one fact scan builds the hourly series (persisted); the grid is
    |types| x |slots| (tiny — it's the *output* grid, not the data) and
    derives from the series, as do its bounds; the fill is one window per
    type. No cross join ever touches raw events.
    """
    hourly, grid = _hourly_grid(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "slot"], "left")
        .select(
            "event_type",
            F.unix_millis("slot").alias("slot_ms"),
            F.col("v").isNotNull().alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


@register(
    "timeseries_interpolate_linear",
    category="streaming",
    oracle=f"""
    WITH {_HOURLY_GRID_CTES},
    filled AS (
        SELECT g.event_type, g.slot, h.v,
               CAST(epoch_ms(g.slot) AS BIGINT) AS slot_ms,
               last_value(h.v IGNORE NULLS) OVER wp AS prev_v,
               last_value(CASE WHEN h.v IS NOT NULL THEN CAST(epoch_ms(g.slot) AS BIGINT) END
                          IGNORE NULLS) OVER wp AS prev_ms,
               first_value(h.v IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN h.v IS NOT NULL THEN CAST(epoch_ms(g.slot) AS BIGINT) END
                           IGNORE NULLS) OVER wf AS next_ms
        FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.slot = g.slot
        WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.slot
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY g.event_type ORDER BY g.slot
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, slot_ms,
           v IS NOT NULL AS observed,
           CASE WHEN v IS NOT NULL THEN ROUND(v, 6)
                WHEN prev_v IS NULL THEN ROUND(next_v, 6)
                WHEN next_v IS NULL THEN ROUND(prev_v, 6)
                ELSE ROUND(prev_v + (next_v - prev_v)
                     * (CAST(slot_ms - prev_ms AS DOUBLE) / CAST(next_ms - prev_ms AS DOUBLE)), 6)
           END AS value_interp
    FROM filled
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly grid: empty slots take
    the time-weighted blend of the previous and next observations (edges
    degrade to nearest-neighbor fill) — the gap-fill used when a
    forward-fill's step function would bias trend/derivative features.

    Scale posture mirrors timeseries_resample_ffill (shared _hourly_grid
    scaffold, one fact scan): both direction-fills are windows over the
    |types| x |slots| OUTPUT grid (two window specs, one ascending one
    descending frame, same single partitioning). The interpolation
    arithmetic is written in the exact same operation order on both
    engines (double ratio of BIGINT epoch-ms deltas), so the rounded
    result hash-matches."""
    hourly, grid = _hourly_grid(spark, sf_dir)
    from pyspark.sql import Window

    wp = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    slot_ms = F.unix_millis("slot")
    obs_ms = F.when(F.col("v").isNotNull(), slot_ms)
    filled = grid.join(hourly, ["event_type", "slot"], "left").select(
        "event_type",
        slot_ms.alias("slot_ms"),
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_ms, ignorenulls=True).over(wp).alias("prev_ms"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(obs_ms, ignorenulls=True).over(wf).alias("next_ms"),
    )
    ratio = (F.col("slot_ms") - F.col("prev_ms")).cast("double") / (
        F.col("next_ms") - F.col("prev_ms")
    ).cast("double")
    return filled.select(
        "event_type",
        "slot_ms",
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.round("v", 6))
        .when(F.col("prev_v").isNull(), F.round("next_v", 6))
        .when(F.col("next_v").isNull(), F.round("prev_v", 6))
        .otherwise(
            F.round(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio, 6)
        )
        .alias("value_interp"),
    )


CUSUM_SLACK = 25.0   # drift allowance per hour (absorbs mean noise)
CUSUM_H = 200.0      # alert threshold on the accumulated statistic


@register(
    "timeseries_drift_cusum",
    category="streaming",
    oracle=f"""
    WITH {_HOURLY_SQL},
    mu AS (
        SELECT event_type,
               CAST(SUM(CAST(v AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*) AS mu
        FROM hourly GROUP BY event_type
    ),
    d AS (
        SELECT h.event_type, h.slot,
               CAST(ROUND((h.v - m.mu - {CUSUM_SLACK}) * 1000000, 0) AS BIGINT) AS d
        FROM hourly h JOIN mu m ON m.event_type = h.event_type
    ),
    pfx AS (
        SELECT event_type, slot,
               CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY slot
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS prefix
        FROM d
    ),
    c AS (
        SELECT event_type, slot,
               prefix - LEAST(CAST(0 AS BIGINT),
                              CAST(MIN(prefix) OVER (PARTITION BY event_type ORDER BY slot
                                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                                     AND CURRENT ROW) AS BIGINT))
                   AS cusum
        FROM pfx
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(MAX(cusum) / 1000000.0, 6) AS max_cusum,
           CAST(COUNT(*) FILTER (WHERE cusum > {int(CUSUM_H * 1000000)}) AS BIGINT)
               AS n_alert_hours,
           CAST(epoch_ms(MIN(CASE WHEN cusum > {int(CUSUM_H * 1000000)} THEN slot END))
               AS BIGINT) AS first_alert_ms
    FROM c GROUP BY event_type
    """,
)
def timeseries_drift_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event type: the classic
    change-point statistic s_t = max(0, s_(t-1) + (x_t − μ − slack)),
    computed WITHOUT recursion via the prefix identity
    s_t = prefix_t − min(0, min_(j≤t) prefix_j) — a running sum and a
    running min over the same window spec, both plain Catalyst windows.
    Reports hours above threshold and the first alert time per series.

    Scale: the statistic runs on the |types| × |slots| hourly series (one
    fact-scale aggregation), one partition-key shuffle serves the nested
    windows; deviations are scaled to exact BIGINT micro-units before
    accumulation (DuckDB's windowed decimal sums are float-backed), so
    the running sums are order-independent and the oracle hash-matches.
    (A true-streaming twin would carry (prefix, running-min) as two
    values in transformWithState — same bounded state as the stateful-HLL
    pipeline.)"""
    from pyspark.sql import Window

    # hourly feeds BOTH the baseline mean and the deviation join — persist
    # so the fact-scale aggregation runs once (same move as _hourly_grid).
    hourly = tracked_persist(_hourly_series(spark, sf_dir))
    mu = hourly.groupBy("event_type").agg(
        (F.sum(F.col("v").cast("decimal(16,6)")).cast("double") / F.count(F.lit(1))).alias("mu")
    )
    d = hourly.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "slot",
        # Exact BIGINT micro-units: windowed DECIMAL sums are float-backed
        # in DuckDB's segment trees, so integer units are the one
        # representation BOTH engines accumulate exactly.
        F.round((F.col("v") - F.col("mu") - CUSUM_SLACK) * 1000000, 0)
        .cast("long")
        .alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pfx = d.select("event_type", "slot", F.sum("d").over(w).cast("long").alias("prefix"))
    runmin = F.least(F.lit(0).cast("long"), F.min("prefix").over(w).cast("long"))
    c = pfx.select("event_type", "slot", (F.col("prefix") - runmin).alias("cusum"))
    h_units = int(CUSUM_H * 1000000)
    alert = F.when(F.col("cusum") > h_units, F.col("slot"))
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.max("cusum") / 1000000.0, 6).alias("max_cusum"),
        F.count(alert).alias("n_alert_hours"),
        F.unix_millis(F.min(alert)).alias("first_alert_ms"),
    )


# Closed-form EWMA headroom: the running DECIMAL(38,0) sum holds
# cents * 2^t and cents at warehouse magnitudes stays under ~10^9, so
# t <= 90 keeps 2^91 * 10^9 ~ 2.5e36 < 10^38 with slack for the sum.
EWMA_T_MAX = 90


@register(
    "timeseries_ewma_smooth",
    category="streaming",
    bench=True,
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, day, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t
        FROM daily
    ),
    scaled AS (
        SELECT event_type, day, cents, t,
               CAST(cents AS DECIMAL(38,0))
                   * CAST(pow(2, CASE WHEN t = 0 THEN 0 ELSE t - 1 END) AS DECIMAL(38,0)) AS sv
        FROM seq
    )
    SELECT event_type, day,
           CAST(round(cents / 100.0, 4) AS DOUBLE) AS v,
           CAST(round(
               CAST(SUM(sv) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / pow(2, t) / 100.0, 4
           ) AS DOUBLE) AS ewma
    FROM scaled
    """,
)
def timeseries_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) over the
    daily value series per event type — the trend-smoothing half of the
    monitoring stack next to timeseries_drift_cusum's change detection.

    EWMA is the textbook recursion s_t = a*v_t + (1-a)*s_{t-1}, which
    plain SQL cannot express; like CUSUM's prefix-minus-running-min
    identity, it is rewritten into windows via a closed form. With
    a = 1/2 the weights are exact binary scalings:
    s_t = (v_0 + sum_{i=1..t} v_i * 2^(i-1)) / 2^t. Determinism is NOT
    left to floating-point accumulation order (engines are free to
    re-associate a window SUM — DuckDB's segment-tree cumulative sum
    measurably diverges from sequential order beyond ~100-row
    partitions): the series is exact integer cents, the 2^(i-1) weights
    are exact DECIMAL(38,0) scalings, and the running SUM is a DECIMAL
    sum — exact and association-independent on BOTH engines. The single
    DECIMAL->DOUBLE conversion, the exact 2^-t rescale, and one /100
    happen after the window, so the smoothed values are identical
    cross-engine before the output rounding. DECIMAL(38) headroom bounds
    the rewrite to ~80 points per key at warehouse magnitudes (cents
    * 2^t < 10^38) — past that, chunk the series (the registered
    timeseries_ewma_unbounded form) or use the stateful streaming form
    (applyInPandasWithState holds s_t in O(1) state). Exceeding the
    headroom fails LOUDLY on both engines: DuckDB raises on DECIMAL
    overflow natively, and a raise_error guard on t > {EWMA_T_MAX}
    makes Spark (ANSI off would otherwise silently NULL the overflow)
    raise too.

    Scale: one fact-scale aggregation to the (type, day) grain, then
    one partition-key window over a series-sized frame — the identical
    plan family as CUSUM; no recursion, no self-join, no Python.
    """
    ev = load_table(spark, sf_dir, "events")
    cents_ev = F.round(F.col("value") * 100, 0).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(cents_ev).cast("long").alias("cents"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    seq = daily.withColumn("t", F.row_number().over(w_ord) - 1)
    sv = F.col("cents").cast("decimal(38,0)") * F.pow(
        F.lit(2.0), F.when(F.col("t") == 0, 0).otherwise(F.col("t") - 1)
    ).cast("decimal(38,0)")
    run = F.sum(sv.alias("sv")).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ewma = F.round(
        run.cast("double") / F.pow(F.lit(2.0), F.col("t")) / F.lit(100.0), 4
    ).cast("double")
    return seq.select(
        "event_type",
        "day",
        F.round(F.col("cents") / 100.0, 4).cast("double").alias("v"),
        F.when(F.col("t") <= EWMA_T_MAX, ewma)
        .otherwise(
            F.raise_error(
                F.lit(
                    "timeseries_ewma_smooth: series exceeds the "
                    f"DECIMAL(38) closed-form headroom (t > {EWMA_T_MAX}); "
                    "use timeseries_ewma_unbounded"
                )
            ).cast("double")
        )
        .alias("ewma"),
    )


# Chunked renormalization for the unbounded EWMA: re-zero the weight
# exponent every EWMA_CHUNK rows, so the DECIMAL(38,0) running sum holds
# at most cents * 2^(2*EWMA_CHUNK) regardless of series length. K=46
# keeps the x100 exact-rounding step under DECIMAL(38)/HUGEINT:
# 2^92 * 10^7-magnitude cents * 2 * 100 ~ 1e37.
EWMA_CHUNK = 46


@register(
    "timeseries_ewma_unbounded",
    category="streaming",
    bench=True,
    oracle=f"""
    WITH seq AS (
        SELECT l_suppkey,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                            CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               ) - 1 AS t
        FROM lineitem
    ),
    dup AS (
        SELECT *, t // {EWMA_CHUNK} AS d FROM seq
        UNION ALL
        SELECT *, t // {EWMA_CHUNK} + 1 AS d FROM seq
    ),
    scaled AS (
        SELECT l_suppkey, cents, t, d,
               GREATEST(d - 1, 0) * {EWMA_CHUNK} AS o,
               CAST(cents AS DECIMAL(38,0))
                   * CAST(pow(2, GREATEST(t, 1) - GREATEST(d - 1, 0)
                                 * {EWMA_CHUNK}) AS DECIMAL(38,0)) AS sv
        FROM dup
    ),
    run AS (
        SELECT l_suppkey, cents, t, d, o,
               SUM(sv) OVER (PARTITION BY l_suppkey, d ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS r
        FROM scaled
    )
    SELECT l_suppkey, t,
           CAST(round(cents / 100.0, 4) AS DOUBLE) AS v,
           CAST(CAST((CAST(r AS HUGEINT) * 100
                      + CAST(pow(2, t - o) AS HUGEINT))
                     // CAST(pow(2, t + 1 - o) AS HUGEINT) AS BIGINT)
                AS DOUBLE) / 10000.0 AS ewma
    FROM run WHERE t // {EWMA_CHUNK} = d
    """,
)
def timeseries_ewma_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha = 1/2) over series of UNBOUNDED length — the chunked
    renormalization that lifts timeseries_ewma_smooth's ~90-point
    DECIMAL(38) headroom. The series here is per-supplier line revenue
    in ship order (527-695 points per key at every sf — all past the
    closed form's ceiling).

    The rewrite re-zeros the weight exponent every K={EWMA_CHUNK} rows:
    each row is duplicated into its own chunk d and the next (explode /
    UNION ALL), weighted 2^(max(t,1) - o) against the target chunk's
    origin o = max(d-1,0)*K, and one running DECIMAL sum per (key,
    chunk) divides by 2^(t+1-o). Rows in chunks 0-1 reproduce the exact
    closed form (full history); from chunk 2 on, history older than the
    previous chunk's start is dropped — a deliberate, DOCUMENTED
    truncation whose error is bounded by max|v| * 2^-(K+1) ~ 1e-9
    dollars here, four orders below the 4-dp output quantum. The 4-dp
    output round is EXACT integer half-up — (r*100 + 2^(e-1)) div 2^e
    on the DECIMAL/HUGEINT side, never a double round() (casting the
    >2^53 running sum to double first hits half-ulp 4-dp boundaries
    where Spark's BigDecimal HALF_UP and DuckDB's double round()
    disagree — observed at sf0.01 before this form); the lone
    integer->double cast is of a <2^40 already-rounded value, exact on
    both engines. Ordering
    is total: (l_shipdate, l_orderkey, l_linenumber, cents) — the
    corpus holds one duplicated (orderkey, linenumber) pair at sf0.1
    differing only in price, which the cents tiebreak orders.

    Scale: this is the form that survives arbitrarily long series —
    window partitions are (key, chunk), never larger than 2K rows, so
    state per partition is CONSTANT while partition count grows with
    data; the only full-series pass is the thin row_number index. The
    explode doubles a (key, cents, t) frame, not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    w_ord = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "cents"
    )
    seq = li.select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        cents.alias("cents"),
    ).withColumn("t", F.row_number().over(w_ord) - 1)
    k = F.lit(EWMA_CHUNK)
    chunk = F.expr(f"t div {EWMA_CHUNK}")
    dup = seq.select(
        "l_suppkey", "cents", "t",
        F.explode(F.array(chunk, chunk + 1)).alias("d"),
    )
    origin = F.greatest(F.col("d") - 1, F.lit(0)) * k
    sv = F.col("cents").cast("decimal(38,0)") * F.pow(
        F.lit(2.0), F.greatest(F.col("t"), F.lit(1)) - origin
    ).cast("decimal(38,0)")
    w_run = Window.partitionBy("l_suppkey", "d").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    half = F.pow(F.lit(2.0), F.col("t") - F.col("o")).cast("decimal(38,0)")
    denom = F.pow(F.lit(2.0), F.col("t") + 1 - F.col("o")).cast("decimal(38,0)")
    return (
        dup.withColumn("o", origin)
        .withColumn("r", F.sum(sv).over(w_run))
        .filter(F.expr(f"t div {EWMA_CHUNK}") == F.col("d"))
        .withColumn("half", half)
        .withColumn("denom", denom)
        .select(
            "l_suppkey",
            "t",
            F.round(F.col("cents") / 100.0, 4).cast("double").alias("v"),
            (
                F.expr("(r * 100 + half) div denom").cast("double")
                / F.lit(10000.0)
            ).alias("ewma"),
        )
    )


@register(
    "timeseries_theil_sen",
    category="timeseries",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY event_type, d
    ),
    pairs AS (
        SELECT a.event_type,
               (1000000 * (b.y - a.y) + (b.d - a.d) // 2) // (b.d - a.d)
                   AS sl
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
        SELECT event_type, sl,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sl, sl) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM pairs
    ),
    ts AS (
        SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
               CAST(MIN(sl) AS BIGINT) AS theil_sen_micro
        FROM ranked WHERE rn = (np + 1) // 2
        GROUP BY event_type
    ),
    mom AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(d) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               SUM(CAST(d AS HUGEINT) * y) AS sxy,
               SUM(CAST(d AS HUGEINT) * d) AS sxx
        FROM daily GROUP BY event_type
    ),
    ols AS (
        SELECT event_type, n_days,
               CAST((1000000 * (n_days * sxy - sx * sy)
                     + (n_days * sxx - sx * sx) // 2)
                    // (n_days * sxx - sx * sx) AS BIGINT) AS ols_micro
        FROM mom
    )
    SELECT event_type, n_days, n_pairs, theil_sen_micro, ols_micro
    FROM ts JOIN ols USING (event_type)
    """,
)
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator over per-type daily volumes —
    the median of all pairwise slopes, the robust-statistics twin of
    the OLS moment fits (quality_zipf_audit / agg_regression): a single
    corrupted day drags an OLS slope arbitrarily far but moves a
    pairwise-slope MEDIAN by at most one rank (29.3% breakdown point).
    Reported side by side with the OLS slope from the same frame so the
    gap itself is the outlier signal. Everything is exact integer
    arithmetic: each pairwise slope is a half-up integer micro-slope
    ((1e6·Δy + Δd div 2) div Δd — both engines truncate identically,
    negatives included), the median is the exact lower-median rank
    selection rn = (n+1) div 2 over the ordered slope values, and the
    OLS slope folds HUGEINT/decimal moments (widened before the
    multiply) into one half-up division.

    The pair "join" is per-type over the DAILY frame — at most
    #days·(#days−1)/2 rows per type (bounded by the calendar span, not
    the corpus), the same domain-bounded-grid discipline as
    quality_ks_drift's ECDF cross product.

    Scale: one events scan collapses map-side to #(type, day) rows;
    pairs, ranking and moments all live on that metadata-sized frame.
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    daily = tracked_persist(
        ev.groupBy(
            "event_type",
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")), F.lit("2024-01-01")
            ).alias("d"),
        ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    a = daily.select("event_type", F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select("event_type", F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            F.expr(
                "(1000000 * (yb - ya) + (db - da) div 2) div (db - da)"
            ).cast("long").alias("sl"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("sl")
    wn = Window.partitionBy("event_type")
    ts = (
        pairs.select(
            "event_type", "sl",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("np"),
        )
        .filter(F.col("rn") == F.expr("(np + 1) div 2"))
        .groupBy("event_type")
        .agg(
            F.max("np").cast("long").alias("n_pairs"),
            F.min("sl").cast("long").alias("theil_sen_micro"),
        )
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("d").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum(F.col("d").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("d").cast(dec) * F.col("d")).cast(dec).alias("sxx"),
    )
    ols = mom.select(
        "event_type", "n_days",
        F.expr(
            "(1000000 * (n_days * sxy - sx * sy) "
            "+ (n_days * sxx - sx * sx) div 2) "
            "div (n_days * sxx - sx * sx)"
        ).cast("long").alias("ols_micro"),
    )
    return ts.join(ols, "event_type").select(
        "event_type", "n_days", "n_pairs", "theil_sen_micro", "ols_micro"
    )
