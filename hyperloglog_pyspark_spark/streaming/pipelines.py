"""Structured Streaming pipelines: the unbounded forms of the window
operators, plus a custom stateful distinct-count stream backed by the
clean-room HLL64 sketch.

The reference targets "data streams" conceptually (assignment PDF title;
README.md:22 discusses sketch memory for streams) but only implements
batch RDDs — this module is where that intent becomes real: bounded-state
HLL aggregation is exactly what makes per-window distinct counts safe on
an unbounded stream.

Sources here are file streams (parquet dirs) so tests can feed
micro-batches deterministically; swapping in kafka/rate sources changes
one line. Sinks are left to the caller (tests use memory/foreachBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hyperloglog_pyspark_spark.functions import hll64
from hyperloglog_pyspark_spark.functions.money import dec_price
from hyperloglog_pyspark_spark.session import configure

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of events-shaped parquet micro-batches."""
    configure(spark)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 1h windows with a watermark: late rows beyond the
    watermark are dropped, window state is evicted once the watermark
    passes window end — bounded state on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec_price("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "15 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Session windows (15-min gap) per user over the stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


OUTPUT_SCHEMA = "event_type string, estimate double, n_rows_seen long"
_HLL_P = 12


def _distinct_users_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update: fold this micro-batch's user_ids into
    the persisted HLL64 register state, emit the refreshed estimate.

    The state value is the serialized register array — the same mergeable
    sketch the batch layer uses (functions/hll64.py), so streaming and
    batch estimates agree given the same input.
    """
    if state.exists:
        (blob, seen) = state.get
        regs = hll64.deserialize(blob)
    else:
        regs, seen = hll64.empty_registers(_HLL_P), 0
    for pdf in pdfs:
        # Canonicalize exactly like the batch path's CAST(user_id AS
        # STRING) (functions/hll64_spark.py): integer ids stringify
        # WITHOUT a decimal point and nulls stay None (update_registers
        # str()s them to 'None'). distinct_users_stream casts JVM-side,
        # so the column normally arrives as strings already — the only
        # path exact for ids above 2^53, where a null-triggered
        # Arrow-float64 round-trip would silently corrupt the id before
        # any pandas-side recovery. The integer branch below is a
        # defensive twin for direct callers: a nullable Int64 view, NOT
        # astype('int64') on a float64 frame (which both crashes on NaN
        # and re-tokenizes '123.0').
        ids = pdf["user_id"]
        if ids.dtype == object:
            # copy: to_numpy on an object column returns a VIEW of the
            # pandas block, and the null canonicalization below would
            # otherwise mutate the caller's micro-batch in place
            vals = ids.to_numpy(dtype=object, copy=True)
            vals[pd.isna(vals)] = None
        else:
            iv = ids.astype("Int64")
            vals = np.array(
                [None if x is pd.NA else str(x) for x in iv], dtype=object
            )
        hll64.update_registers(regs, vals, _HLL_P)
        seen += len(pdf)
    state.update((hll64.serialize(regs), seen))
    yield pd.DataFrame(
        {"event_type": [key[0]], "estimate": [hll64.estimate(regs)], "n_rows_seen": [seen]}
    )


def distinct_users_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running approximate distinct users per
    event_type, state = one fixed-size HLL64 sketch per key.

    This is the streaming answer to the reference's flagship
    estimate_distinct_elements_parallel (HLL/examples.py:56-67): the
    sketch's bounded memory (2^p registers, HyperLogLog.py:83-84) is what
    makes running distinct counts viable on an unbounded stream.
    """
    return (
        # CAST(user_id AS STRING) JVM-side, mirroring the batch sketch
        # path: the state fn then never sees the Arrow float64 round-trip
        # a nullable long column takes (exact for ALL int64 ids, not
        # just those under 2^53).
        events.select("event_type", F.col("user_id").cast("string").alias("user_id"))
        .groupBy("event_type")
        .applyInPandasWithState(
            _distinct_users_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType="registers binary, n_rows_seen long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Sliding 1h/30min windows per event_type over the stream — each event
    contributes to two overlapping windows (same expression as the batch
    form in operators/streaming_batch.py::window_sliding)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
        )
    )


def enriched_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with a (static) per-user
    dimension. Spark re-plans the static side per micro-batch; with a
    broadcastable dim this is a map-side hash join on every batch — the
    standard streaming enrichment pattern (at scale: a compact dim table
    or a Delta/parquet snapshot, broadcast or bucket-joined)."""
    return (
        events.join(F.broadcast(user_dim), "user_id", "left")
        .select("event_id", "ts", "user_id", "event_type", "value", "user_segment")
    )


def deduped_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with BOUNDED state:
    dropDuplicatesWithinWatermark keeps a key only until the watermark
    passes it, so state never grows unboundedly — the streaming analog of
    the batch dedup family (operators/dedup.py), and the reason watermarks
    matter beyond late-data handling."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def click_purchase_join(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    clicks within the preceding hour. Both sides are watermarked and the
    join carries a time-range condition, so Spark can bound the buffered
    state on each side (clicks older than purchase_ts − 1h are evicted) —
    without the range condition a stream-stream join would buffer forever.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "amount")


# ---------------------------------------------------------------------------
# Streaming heavy hitters: Misra-Gries summaries as keyed stream state.
# ---------------------------------------------------------------------------

MG_STREAM_K = 64
MG_SHARDS = 8
_MG_OUT_SCHEMA = "shard int, item string, weight long, n_seen long"


def _heavy_users_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's items into the shard's MG summary.

    State per shard = ≤ MG_STREAM_K (item, weight) counters + rows seen,
    serialized as two pickled arrays. Shards partition the item domain
    (shard = hash(item) % MG_SHARDS), so summaries are disjoint and the
    union of shard outputs is itself a valid MG summary of the whole
    stream: per-shard error ≤ n_shard/(k+1) ≤ n/(k+1).
    """
    import pickle

    from hyperloglog_pyspark_spark.functions.mgsketch import mg_compress

    if state.exists:
        (blob, n_seen) = state.get
        acc = pd.Series(**pickle.loads(blob))
    else:
        acc, n_seen = pd.Series(dtype="int64"), 0
    for pdf in pdfs:
        counts = pdf["item"].value_counts(sort=False)
        acc = counts.astype("int64") if acc.empty else acc.add(counts, fill_value=0).astype("int64")
        n_seen += len(pdf)
    acc = mg_compress(acc, MG_STREAM_K)
    state.update(
        (pickle.dumps({"data": acc.to_numpy(), "index": acc.index.to_numpy()}), n_seen)
    )
    yield pd.DataFrame(
        {
            "shard": key[0],
            "item": acc.index.astype("object"),
            "weight": acc.to_numpy(),
            "n_seen": n_seen,
        }
    )


def heavy_users_stream(events: DataFrame) -> DataFrame:
    """Running heavy-user detection over an unbounded event stream: the
    streaming form of heavy_hitters_mg (operators/sketch.py), with the
    Misra-Gries summary as applyInPandasWithState state.

    Items are sharded by a stable hash so state per key stays ≤ k counters
    no matter how many distinct users the stream ever sees — the
    frequency-sketch twin of the HLL state in distinct_users_stream, and
    the property that makes "who is hot right now" answerable without
    unbounded memory. Output mode is update: each micro-batch emits the
    refreshed summaries of the shards it touched.
    """
    items = events.select(
        F.col("user_id").cast("string").alias("item"),
        (F.crc32(F.col("user_id").cast("string")) % MG_SHARDS).cast("int").alias("shard"),
    )
    return items.groupBy("shard").applyInPandasWithState(
        _heavy_users_state_fn,
        outputStructType=_MG_OUT_SCHEMA,
        stateStructType="summary binary, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_AB_OUT_SCHEMA = (
    "event_type string, n_a long, s1_a long, s2_a long,"
    " n_b long, s1_b long, s2_b long, t_welch double"
)


def _ab_moments_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's observations into the metric's per-variant
    moment state (n, Σc, Σc² per side — six exact integers), then emit
    the refreshed Welch t readout.

    Sums are COMMUTATIVE, so unlike first-touch operators (funnels,
    cohorts) this state is exactly batch-equivalent under ANY arrival
    order — no watermark needed for correctness, only for state TTL in
    a metric-churning deployment.

    Exactness bound: the state columns are 64-bit, so Σc² must stay
    below 2⁶³ (the same bound the batch operator documents — reached
    only after ~10⁹ events of $25k magnitude on one metric). The
    cumulative accumulation is arbitrary-precision Python int and the
    guard below raises BEFORE the long state column would wrap, so an
    unbounded stream fails loudly (shard or window the metric key),
    never with a silently negative variance.
    """
    if state.exists:
        n_a, s1_a, s2_a, n_b, s1_b, s2_b = state.get
    else:
        n_a = s1_a = s2_a = n_b = s1_b = s2_b = 0
    for pdf in pdfs:
        # null metric values reach the state fn as NaN; SQL aggregates
        # (the batch twin's F.sum) skip nulls, so drop them here too.
        # A null user_id makes variant NaN — the batch twin's
        # F.when(variant == v) matches NEITHER side for null, so those
        # rows must not land anywhere (NaN == 0 is False, which would
        # silently dump them into variant B).
        pdf = pdf.dropna(subset=["variant", "c"])
        c = pdf["c"].to_numpy()
        mask = pdf["variant"].to_numpy() == 0
        ca, cb = c[mask], c[~mask]
        # per-element int() BEFORE any arithmetic: once a batch carried
        # a null, the column is float64, and float sums/squares lose
        # exactness at 2^53 — 512× below the 2^62 state guard; each
        # element itself is an exact integer (round(value·100)), so the
        # conversion is lossless and the accumulation stays pure-Python
        # arbitrary-precision int (numpy int64 would wrap past 2^63)
        ia = [int(x) for x in ca.tolist()]
        ib = [int(x) for x in cb.tolist()]
        n_a += len(ia)
        s1_a += sum(ia)
        s2_a += sum(x * x for x in ia)
        n_b += len(ib)
        s1_b += sum(ib)
        s2_b += sum(x * x for x in ib)
    if max(s2_a, s2_b) >= 1 << 62:
        raise ValueError(
            "ab_monitor_stream moment state near 2^63 for metric "
            f"{key[0]!r}: shard or window the metric before the long "
            "state column overflows"
        )
    state.update((n_a, s1_a, s2_a, n_b, s1_b, s2_b))
    t = None
    if n_a > 1 and n_b > 1:
        mean_a = s1_a / (n_a * 100.0)
        mean_b = s1_b / (n_b * 100.0)
        var_a = (s2_a - float(s1_a) * s1_a / n_a) / ((n_a - 1) * 10000.0)
        var_b = (s2_b - float(s1_b) * s1_b / n_b) / ((n_b - 1) * 10000.0)
        # zero pooled variance (both sides constant) has no t statistic:
        # dividing would raise ZeroDivisionError and poison the query on
        # every checkpoint restart, and float cancellation can leave the
        # sum epsilon-NEGATIVE, where Python's **0.5 silently returns a
        # COMPLEX number that fails Arrow conversion — emit null, like
        # the batch twin's den > 0 guard
        den = var_a / n_a + var_b / n_b
        t = (mean_b - mean_a) / den ** 0.5 if den > 0 else None
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "n_a": n_a,
                "s1_a": s1_a,
                "s2_a": s2_a,
                "n_b": n_b,
                "s1_b": s1_b,
                "s2_b": s2_b,
                "t_welch": t,
            }
        ]
    )


_FUNNEL_OUT_SCHEMA = "user_id long, tv long, tc long, tp long"
_FUNNEL_NONE = -(1 << 62)  # sentinel: "no view yet" in the long state cell


def _make_funnel_state_fn(horizon_us: int | None):
    """Build the per-user first-touch funnel state fn
    (view → click → purchase), EXACT under any arrival order — the
    property naive incremental funnels lose: a late-arriving earlier
    view lowers tv, which can qualify a click that was already seen and
    (naively) discarded.

    The fix rests on monotonicity: tv = min(view ts) only decreases, so
    the click-qualifying set {ts ≥ tv} only grows and tc = min of it
    only decreases — likewise tp against tc. A click ABOVE the current
    tc can therefore never become tc, but every click at or below it
    must be retained as a candidate for future tv drops (symmetrically
    purchases against tp). State per user = tv + the two pruned
    candidate lists, each bounded by the events preceding the user's
    first qualifying touch — in-order streams keep ~1 candidate.

    ``horizon_us`` bounds that state for adversarial orders (e.g. a
    click-only user whose tv never arrives would otherwise retain every
    click forever): candidates older than ``max seen ts − horizon`` are
    frozen out. Sound whenever the source watermark allows at most
    ``horizon_us`` of lateness: a pruned candidate t could only become a
    stage time via a future view/click with ts ≤ t < cutoff, which the
    watermark has already discarded. That argument covers CANDIDATES
    only, so the COMMITTED stage times (tc, tp) are persisted in the
    state tuple alongside tv and folded back in as floors on every
    recompute — they are never in the candidate lists and the horizon
    prune can never touch them (a converted funnel must stay converted
    no matter how far event time advances). ``None`` keeps the exact
    unbounded form (the batch-parity tests exercise arbitrary
    reorderings with no watermark, so they use ``None``).
    """

    def _funnel_state_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        if state.exists:
            (tv, blob) = state.get
            # len-based unpack migrates checkpoints written by the
            # pre-committed-floor blob format (3-tuple, no tc/tp): a
            # restarted query resumes with floors unset and recomputes
            # them from the retained candidates on the first fold
            parts = pickle.loads(blob)
            clicks, purchases, hi = parts[:3]
            tc0, tp0 = parts[3:5] if len(parts) >= 5 else (None, None)
            tv = None if tv == _FUNNEL_NONE else tv
        else:
            tv, clicks, purchases, hi, tc0, tp0 = None, [], [], None, None, None
        for pdf in pdfs:
            for etype, ts in zip(pdf["event_type"], pdf["ts_us"]):
                if pd.isna(ts):
                    # a null timestamp reaches the fold as NaN; the
                    # batch twin's MIN/WHEN aggregates ignore null ts —
                    # int(NaN) would instead crash the query permanently
                    continue
                ts = int(ts)
                hi = ts if hi is None else max(hi, ts)
                if etype == "view":
                    tv = ts if tv is None else min(tv, ts)
                elif etype == "click":
                    clicks.append(ts)
                elif etype == "purchase":
                    purchases.append(ts)
        # committed values are floors: tv only decreases, so a committed
        # tc (≥ the tv it qualified under) keeps qualifying forever —
        # only a retained candidate strictly below it can replace it
        tc = min(
            (t for t in clicks if tv is not None and t >= tv), default=None
        )
        if tc0 is not None and (tc is None or tc0 < tc):
            tc = tc0
        clicks = sorted(t for t in clicks if tc is None or t < tc)
        tp = min(
            (t for t in purchases if tc is not None and t >= tc), default=None
        )
        if tp0 is not None and (tp is None or tp0 < tp):
            tp = tp0
        purchases = sorted(t for t in purchases if tp is None or t < tp)
        if horizon_us is not None and hi is not None:
            cutoff = hi - horizon_us
            clicks = [t for t in clicks if t >= cutoff]
            purchases = [t for t in purchases if t >= cutoff]
        state.update(
            (
                _FUNNEL_NONE if tv is None else tv,
                pickle.dumps((clicks, purchases, hi, tc, tp)),
            )
        )
        yield pd.DataFrame(
            [{"user_id": key[0], "tv": tv, "tc": tc, "tp": tp}]
        )

    return _funnel_state_fn


# default (exact, unbounded) form — kept as a module-level name so the
# batch-parity tests and docs can reference it directly
_funnel_state_fn = _make_funnel_state_fn(None)


def funnel_stream(events: DataFrame, horizon_us: int | None = None) -> DataFrame:
    """Streaming first-touch funnel: the streaming form of
    funnel_conversion (operators/eventflow.py), emitting each touched
    user's refreshed (tv, tc, tp) stage-entry times per micro-batch;
    counting non-nulls over the latest emission per user reproduces the
    batch funnel counts exactly (asserted by tests/test_streaming.py
    under an arbitrary batch split). ``horizon_us`` caps per-user
    candidate state to the event-time horizon — pair it with the
    matching source watermark (see _make_funnel_state_fn)."""
    obs = events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    return obs.groupBy("user_id").applyInPandasWithState(
        _make_funnel_state_fn(horizon_us),
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType="tv long, candidates binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ab_monitor_stream(events: DataFrame) -> DataFrame:
    """Live A/B experiment monitor: the streaming form of
    experiment_ab_ttest (operators/eventflow.py) — per-metric,
    per-variant exact integer moments as applyInPandasWithState state,
    a fresh Welch t-statistic emitted every micro-batch.

    This is the streaming face of the engine's moment discipline: the
    batch operator's conditional sums ARE this state's merge function,
    so the dashboard's running t equals a batch recompute at every
    barrier (asserted by tests/test_streaming.py). State is six longs
    per metric — constant, no TTL pressure.
    """
    obs = events.select(
        F.col("event_type"),
        F.pmod("user_id", F.lit(2)).cast("int").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    return obs.groupBy("event_type").applyInPandasWithState(
        _ab_moments_state_fn,
        outputStructType=_AB_OUT_SCHEMA,
        stateStructType=(
            "n_a long, s1_a long, s2_a long, n_b long, s1_b long, s2_b long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API — the successor to
# applyInPandasWithState): typed named state cells per key, optional TTL,
# timers. The processor below is the minimal production shape: one
# ValueState holding exact integer-cent totals.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

SPEND_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def _half_up_units(v: np.ndarray, scale: int) -> np.ndarray:
    """Sign-aware HALF-UP integer-unit rounding of a float array —
    matches Spark's F.round (HALF_UP, away from zero) for negative
    values (refunds, below-target deviations) too. pandas .round() is
    banker's (half-even), which diverges on exact .5 units, and a bare
    astype('int64') truncates toward zero, which diverges on negatives.
    Shared by SpendTracker (cents) and CusumMonitor (micro-units) so the
    rounding discipline cannot drift between the two processors."""
    return (np.sign(v) * np.floor(np.abs(v) * scale + 0.5)).astype("int64")


class SpendTracker(StatefulProcessor):
    """Per-user running spend: ValueState = (event count, total in integer
    cents). Cents keep the cross-batch accumulation exact — the same
    decimal-not-double discipline as the batch layer (functions/money.py),
    folded to int64 because state round-trips through Arrow.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", "n_events long, total_cents long")

    def handleInputRows(self, key, rows, timer_values):  # noqa: N802
        prev = self._stats.get()
        n, cents = prev if prev else (0, 0)
        for pdf in rows:
            n += len(pdf)
            v = pdf["value"].fillna(0.0).to_numpy()
            cents += int(_half_up_units(v, 100).sum())
        self._stats.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    def close(self) -> None:
        pass


def user_spend_stream(events: DataFrame) -> DataFrame:
    """Running per-user spend via transformWithStateInPandas.

    State is one fixed-width tuple per user — bounded by the user
    population, not the stream length; RocksDB state store shards it by
    the grouping key across executors at scale (set
    spark.sql.streaming.stateStore.providerClass to
    RocksDBStateStoreProvider — transformWithState requires it). TTL on
    the state cell (getValueState's ttlDurationMs) is the idiomatic
    eviction story for inactive keys on an unbounded keyspace.

    Environment note: the API's state-server protocol needs
    google.protobuf, which this container does not ship — the end-to-end
    test collects only where protobuf exists, while the processor's
    semantics (cent-exact accumulation, HALF_UP refund rounding) run
    everywhere via tests/test_streaming.py::
    test_spend_tracker_processor_contract driving a fake state handle.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SpendTracker(),
            outputStructType=SPEND_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


CUSUM_OUTPUT_SCHEMA = (
    "event_type string, cusum double, max_cusum double, n_alerts long, alarm boolean"
)
CUSUM_STREAM_TARGET = 150.0  # per-event reference level (mu + slack of the batch twin)
CUSUM_STREAM_H = 500.0       # alert threshold on the accumulated statistic


class CusumMonitor(StatefulProcessor):
    """Streaming one-sided CUSUM per key: the textbook recursion
    s = max(0, s + (x − target)) run imperatively over arriving rows —
    the streaming twin of the batch operator timeseries_drift_cusum
    (which computes the same statistic as two Catalyst windows via the
    prefix identity). State = (s, running max, alert count) in exact
    integer micro-units, one fixed-width tuple per key — bounded by the
    key population, not stream length, the same state discipline as
    SpendTracker."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "cusum", "s_units long, max_units long, n_alerts long"
        )

    def handleInputRows(self, key, rows, timer_values):  # noqa: N802
        prev = self._st.get()
        s, mx, n_alerts = prev if prev else (0, 0, 0)
        h_units = int(CUSUM_STREAM_H * 1_000_000)
        # The CUSUM recursion s = max(0, s + d) is ORDER-SENSITIVE —
        # unlike the funnel/A-B folds, which were engineered order-free.
        # Post-shuffle row order within a micro-batch is nondeterministic,
        # so concatenate the batch's rows and sort by EVENT TIME (value as
        # tie-break; equal (ts, value) rows commute through the fold).
        # Cross-batch order follows arrival, bounded by the watermark the
        # deployment pairs with this monitor.
        # An empty row iterator (possible once timers are configured, and
        # legal per the transformWithState contract) must be a no-op fold,
        # not a pd.concat ValueError that poisons the query permanently.
        pdfs = list(rows)
        if pdfs:
            batch = pd.concat(pdfs, ignore_index=True)
            batch = batch.sort_values(["ts_us", "value"], kind="stable")
            # Missing readings are SKIPPED, not treated as observations
            # of zero — a null would otherwise apply a full -target
            # deviation and clear an active alarm (the batch twin's
            # hourly SUM likewise ignores NULLs). Contrast SpendTracker,
            # where null spend = 0 genuinely is neutral.
            v = batch["value"].dropna().to_numpy()
        else:
            v = np.empty(0)
        d = _half_up_units(v - CUSUM_STREAM_TARGET, 1_000_000)
        for du in d:
            s = max(0, s + int(du))
            if s > mx:
                mx = s
            if s > h_units:
                n_alerts += 1
        self._st.update((s, mx, n_alerts))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "cusum": [s / 1e6],
                "max_cusum": [mx / 1e6],
                "n_alerts": [n_alerts],
                "alarm": [s > h_units],
            }
        )

    def close(self) -> None:
        pass


def cusum_stream(events: DataFrame) -> DataFrame:
    """Per-event-type streaming drift monitor via transformWithStateInPandas
    (same environment note as user_spend_stream: the end-to-end form needs
    google.protobuf; semantics are pinned by the fake-handle contract test).
    Event time rides along because the CUSUM recursion is order-sensitive —
    the processor sorts each micro-batch by ts before folding."""
    return (
        events.select("event_type", "value", F.unix_micros("ts").alias("ts_us"))
        .groupBy("event_type")
        .transformWithStateInPandas(
            CusumMonitor(),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


EWMA_OUTPUT_SCHEMA = "event_type string, ewma double, n_obs long"


class EwmaTracker(StatefulProcessor):
    """Streaming EWMA (alpha = 1/2) per key: s = (v + s_prev)/2 folded
    imperatively in O(1) state — the TRUE-unbounded twin of the batch
    operators timeseries_ewma_smooth (exact closed form, ~90-point
    DECIMAL headroom) and timeseries_ewma_unbounded (chunked
    renormalization). The exact s_t needs t bits, so bounded state
    REQUIRES quantization: s is held in integer micro-units and
    half-AWAY-FROM-ZERO-rounded after every halving step (sign-aware
    shift: (t+1) >> 1 for t ≥ 0, −((1−t) >> 1) below — the repo-wide
    rounding discipline of _half_up_units / F.round HALF_UP; a bare
    (t+1) >> 1 would round the −1.5 midpoint to −1, toward +∞).
    Each step's rounding error
    is ≤ 0.5 micro-units and is itself halved by every later step, so
    the drift from the exact real-valued recursion stays under 1
    micro-unit at ANY stream length — the same magnitude-vs-boundedness
    trade the batch chunked form makes with its 2^-47 truncation.

    Order-sensitive like CusumMonitor (s_t depends on arrival order):
    the processor concatenates the micro-batch and sorts by event time
    (value tie-break) before folding; nulls are SKIPPED (a missing
    reading is not an observation of zero — halving toward 0 would
    decay an active trend spuriously). State = one (s_units, n_obs)
    tuple per key, bounded by key population, not stream length."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("ewma", "s_units long, n_obs long")

    def handleInputRows(self, key, rows, timer_values):  # noqa: N802
        prev = self._st.get()
        s, n_obs = prev if prev else (0, 0)
        pdfs = list(rows)
        if pdfs:
            batch = pd.concat(pdfs, ignore_index=True)
            batch = batch.sort_values(["ts_us", "value"], kind="stable")
            v = batch["value"].dropna().to_numpy()
        else:
            v = np.empty(0)
        for u in _half_up_units(v, 1_000_000):
            u = int(u)
            if n_obs == 0:
                s = u
            else:
                t = u + s
                s = (t + 1) >> 1 if t >= 0 else -((1 - t) >> 1)
            n_obs += 1
        self._st.update((s, n_obs))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "ewma": [s / 1e6],
                "n_obs": [n_obs],
            }
        )

    def close(self) -> None:
        pass


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-event-type streaming EWMA trend via transformWithStateInPandas
    (same environment note as user_spend_stream: the end-to-end form needs
    google.protobuf; semantics are pinned by the fake-handle contract
    test). Event time rides along because the recursion is
    order-sensitive — the processor sorts each micro-batch by ts before
    folding."""
    return (
        events.select("event_type", "value", F.unix_micros("ts").alias("ts_us"))
        .groupBy("event_type")
        .transformWithStateInPandas(
            EwmaTracker(),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def sketch_store_epoch_writer(store_path: str):
    """foreachBatch body for ``sketch_store_stream`` — exposed separately
    so tests can re-deliver a micro-batch by hand and assert the
    idempotent-commit contract directly.

    Each micro-batch collapses to per-(event_type, day) HLL sketches
    (lg_k matched to the batch store, operators/sketch.py::LG_K) and is
    committed as ONE immutable epoch directory keyed by the Structured
    Streaming batch_id: ``<store>/epoch=<batch_id>``, written with
    mode("overwrite") of that directory only — the same per-batch-id
    partition-overwrite discipline as the idempotent file-sink test.
    After a crash between the write and the checkpoint advancing, the
    engine REPLAYS the batch under the SAME batch_id, so the retry
    replaces its own epoch instead of appending a duplicate. HLL union
    being idempotent (register max) would protect the ESTIMATES from a
    duplicate epoch anyway, but the store's row grain (epoch counts,
    files-per-cell) would silently drift — the overwrite commit protects
    both."""
    from hyperloglog_pyspark_spark.operators.sketch import LG_K

    def write_epoch(df: DataFrame, batch_id: int) -> None:
        (
            df.groupBy(
                "event_type",
                F.to_date(F.date_trunc("day", "ts")).alias("day"),
            )
            .agg(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(LG_K))
                .alias("sk")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_path}/epoch={batch_id}")
        )

    return write_epoch


def sketch_store_stream(events: DataFrame, store_path: str):
    """Streaming twin of sink_hll_sketch_store's build phase: the batch
    operator freezes day-ranged epochs once; this form grows the SAME
    store shape one epoch per micro-batch, unbounded, with exactly-once
    file commits (see sketch_store_epoch_writer). Serving is identical
    for both: read every epoch, register-max merge with hll_union_agg —
    sketch(A ∪ B) = merge(sketch(A), sketch(B)) makes the batch/stream
    split invisible to the estimate (the parity test pins the stores'
    register states equal via their canonicalized union estimates; raw
    sketch bytes differ by build path — HIP header — even when the
    registers agree). State lives in the store files, not
    the streaming engine: O(1) engine state regardless of stream length,
    the sketch-store analogue of EwmaTracker's bounded-state contract."""
    return events.writeStream.foreachBatch(sketch_store_epoch_writer(store_path))


def ddsketch_store_epoch_writer(store_path: str):
    """foreachBatch body for ``ddsketch_store_stream`` — exposed
    separately so tests can re-deliver a micro-batch by hand and assert
    the idempotent-commit contract directly.

    Each micro-batch collapses to per-(event_type, day, bucket)
    DDSketch bucket COUNTS (γ-boundary assignment matched to the batch
    store, operators/sketch.py::_DD_ROWS) committed as ONE immutable
    epoch directory keyed by the Structured Streaming batch_id —
    ``<store>/epoch=<batch_id>``, mode("overwrite") of that directory
    only. For the HLL store this overwrite commit was belt-and-braces
    (register-max union is idempotent); here it is LOAD-BEARING:
    DDSketch merge is plain ADDITION of counts, so a crash-retry that
    APPENDED a second copy of the same batch would silently
    double-count every value in it. The parity test re-delivers batch 0
    under its original batch_id and asserts the served counts do not
    move."""
    from hyperloglog_pyspark_spark.operators.sketch import _DD_ROWS

    def write_epoch(df: DataFrame, batch_id: int) -> None:
        bounds = df.sparkSession.createDataFrame(
            _DD_ROWS, "bucket int, lo long, hi long"
        )
        (
            df.select(
                "event_type",
                F.to_date(F.date_trunc("day", "ts")).alias("day"),
                F.round(F.col("value") * 100, 0).cast("long").alias("c"),
            )
            .join(
                F.broadcast(bounds),
                (F.col("c") >= F.col("lo")) & (F.col("c") < F.col("hi")),
            )
            .groupBy("event_type", "day", "bucket", "lo", "hi")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_path}/epoch={batch_id}")
        )

    return write_epoch


def ddsketch_store_stream(events: DataFrame, store_path: str):
    """Streaming twin of sink_ddsketch_store's build phase: the batch
    operator freezes day-ranged epochs once; this form grows the SAME
    store shape one epoch per micro-batch, unbounded, with exactly-once
    file commits (see ddsketch_store_epoch_writer). Serving is
    identical for both: read every epoch, SUM bucket counts per
    (segment, bucket), walk the ≤900-bucket cumulative window for
    p50/p95/p99. Counts being exact integers, stream-vs-batch parity is
    bit-exact frame equality, not a tolerance. State lives in the store
    files, not the streaming engine: O(1) engine state regardless of
    stream length."""
    return events.writeStream.foreachBatch(
        ddsketch_store_epoch_writer(store_path)
    )
