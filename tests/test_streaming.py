"""True Structured Streaming tests: micro-batch file source → windowed /
stateful aggregations → memory sink. Covers batch/stream parity,
late-data drop past the watermark, and cross-batch HLL sketch state."""

from __future__ import annotations

import math
import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.functions import hll64
from hyperloglog_pyspark_spark.sources.catalog import load_table
from hyperloglog_pyspark_spark.streaming.pipelines import (
    distinct_users_stream,
    read_events_stream,
    tumbling_counts,
)

pytestmark = pytest.mark.streaming


def _write_batch(spark, events_df, path: str) -> None:
    events_df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def event_batches(spark, sf_dir, tmp_path):
    """events split into two micro-batch parquet files by event_id."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream_src")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    return ev, first, second, src, str(tmp_path / "ckpt")


def test_tumbling_stream_matches_batch(spark, event_batches):
    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    stream = tumbling_counts(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_complete")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("tumbling_complete").toPandas()
    finally:
        q.stop()
    want = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    key = ["window_start_ms", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_like=True)


def test_late_rows_dropped_past_watermark(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    # Batch 1: events at 12:00-12:10 → watermark advances to ~11:40.
    _write_batch(spark, mk([(base, 1, "click"), (base + datetime.timedelta(minutes=10), 2, "click")]), src)
    stream = tumbling_counts(read_events_stream(spark, src), watermark="30 minutes")
    q = (
        stream.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: one row 2h late (10:05 — before the 11:40 watermark → must
        # be DROPPED) and one current row (12:20 — must be aggregated).
        _write_batch(
            spark,
            mk([(base - datetime.timedelta(hours=2), 3, "click"),
                (base + datetime.timedelta(minutes=20), 4, "click")]),
            src,
        )
        q.processAllAvailable()
        got = spark.table("late_drop").toPandas()
    finally:
        q.stop()
    late_window_ms = int((base - datetime.timedelta(hours=2)).replace(minute=0).timestamp() * 1000)
    live_window_ms = int(base.timestamp() * 1000)
    assert late_window_ms not in set(got.window_start_ms), "late row should be dropped"
    live = got[got.window_start_ms == live_window_ms].sort_values("n_events")
    assert list(live.n_events)[-1] == 3  # 12:00 window re-emitted with the 12:20 row


def test_stateful_hll_state_survives_batches(spark, event_batches):
    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    stream = distinct_users_stream(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, second, src)
        q.processAllAvailable()
        got = spark.table("hll_state").toPandas()
    finally:
        q.stop()
    # Last emission per key reflects ALL rows — state carried across batches.
    last = got.sort_values("n_rows_seen").groupby("event_type").last()
    batch_counts = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et, row in last.iterrows():
        assert row["n_rows_seen"] == batch_counts[et]
        # streaming estimate == local HLL64 over the same values
        vals = [str(r["user_id"]) for r in ev.filter(F.col("event_type") == et).collect()]
        regs = hll64.empty_registers(12)
        hll64.update_registers(regs, vals, 12)
        assert row["estimate"] == pytest.approx(hll64.estimate(regs), abs=1e-9)


def test_checkpoint_recovery_resumes_hll_state(spark, event_batches):
    """Kill the stateful query after batch 1, restart from the same
    checkpoint, feed batch 2: the restarted query must resume the HLL
    register state (not recount from zero) — streaming fault tolerance."""
    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)

    emissions: list[pd.DataFrame] = []

    def start():
        # memory sink can't recover from a checkpoint; foreachBatch can.
        return (
            distinct_users_stream(read_events_stream(spark, src))
            .writeStream.foreachBatch(lambda df, _bid: emissions.append(df.toPandas()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _write_batch(spark, second, src)
    q = start()  # fresh query object, same checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = pd.concat(emissions, ignore_index=True)

    # The final emission per key must cover batch 1 AND batch 2 rows even
    # though the second query object never saw batch 1 — i.e. the HLL
    # register state was restored from the checkpoint, not recounted.
    last = got.sort_values("n_rows_seen").groupby("event_type").last()
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(last) > 0
    for et, row in last.iterrows():
        assert row["n_rows_seen"] == totals[et], (et, row["n_rows_seen"], totals[et])


def test_sliding_stream_matches_batch(spark, event_batches):
    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    from hyperloglog_pyspark_spark.streaming.pipelines import sliding_counts

    stream = sliding_counts(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("sliding_complete")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("sliding_complete").toPandas()
    finally:
        q.stop()
    want = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
        )
        .toPandas()
    )
    key = ["window_start_ms", "event_type"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_like=True,
    )


def test_stream_static_join_enriches_every_batch(spark, event_batches):
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.streaming.pipelines import enriched_stream

    # Static dim derived from the batch table: deterministic user segments.
    user_dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("user_segment", F.concat(F.lit("seg_"), (F.col("user_id") % 4).cast("string")))
    )
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    stream = enriched_stream(read_events_stream(spark, src), user_dim)
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("enriched").toPandas()
    finally:
        q.stop()
    assert len(got) == ev.count()
    # every event enriched (left join, dim covers all users)
    assert got["user_segment"].notna().all()
    assert (got["user_segment"] == "seg_" + (got["user_id"] % 4).astype(str)).all()


def test_foreachbatch_idempotent_parquet_sink(spark, event_batches, tmp_path):
    """foreachBatch + per-batch-id partition overwrite: the standard
    exactly-once file sink. Re-writing a batch directory (retry) replaces
    rather than duplicates; the read-back equals the batch table."""
    ev, first, second, src, ckpt = event_batches
    out = str(tmp_path / "out")
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)

    def write_batch(df, batch_id: int):
        df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")
        # simulate a task retry: the same batch written again must replace
        df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        read_events_stream(spark, src)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == ev.count()
    assert back.select("event_id").distinct().count() == ev.count()


def test_streaming_dedup_within_watermark(spark, event_batches):
    """Feed the same rows twice (two identical micro-batches): the
    deduped stream must emit each event_id once."""
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.streaming.pipelines import deduped_stream

    _write_batch(spark, first, src)
    _write_batch(spark, first, src)  # exact duplicate batch
    q = (
        deduped_stream(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("dedup_stream").toPandas()
    finally:
        q.stop()
    assert len(got) == first.count()
    assert got["event_id"].is_unique


def test_stream_stream_join_matches_batch(spark, event_batches):
    """Stream-stream time-bounded join (purchases × same-user clicks in
    the trailing hour) equals the batch join over the same data."""
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.streaming.pipelines import click_purchase_join

    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    q = (
        click_purchase_join(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("ss_join").toPandas()
    finally:
        q.stop()
    # batch form: same expression over the batch DataFrame (watermark is a
    # no-op in batch execution)
    from pyspark.sql import functions as F2
    clicks = ev.filter(F2.col("event_type") == "click").select(
        F2.col("user_id").alias("c_user"), F2.col("ts").alias("click_ts"),
        F2.col("event_id").alias("click_id"))
    purchases = ev.filter(F2.col("event_type") == "purchase").select(
        F2.col("user_id").alias("p_user"), F2.col("ts").alias("purchase_ts"),
        F2.col("event_id").alias("purchase_id"), F2.col("value").alias("amount"))
    want = purchases.join(
        clicks,
        (F2.col("p_user") == F2.col("c_user"))
        & (F2.col("click_ts") <= F2.col("purchase_ts"))
        & (F2.col("click_ts") >= F2.col("purchase_ts") - F2.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "amount").toPandas()
    key = ["purchase_id", "click_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_like=True,
    )


def test_session_stream_matches_batch(spark, event_batches):
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.streaming.pipelines import session_counts

    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    q = (
        session_counts(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("session_complete")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("session_complete").toPandas()
    finally:
        q.stop()
    want = (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
        .toPandas()
    )
    key = ["user_id", "session_start_ms"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_like=True,
    )


def test_streaming_heavy_hitters_mg_contract(spark, event_batches):
    """Sharded Misra-Gries stream state: after two micro-batches, the
    union of the final per-shard summaries must satisfy the MG contract
    against exact batch counts — every user with freq > n/(k+1) captured,
    weight within [freq − n_shard/(k+1), freq] — and state must have
    carried across batches (n_seen sums to the full event count)."""
    from hyperloglog_pyspark_spark.streaming.pipelines import (
        MG_STREAM_K,
        heavy_users_stream,
    )

    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    stream = heavy_users_stream(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("mg_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, second, src)
        q.processAllAvailable()
        got = spark.table("mg_state").toPandas()
    finally:
        q.stop()
    # Keep each shard's FINAL emission (largest n_seen).
    final = got.merge(
        got.groupby("shard")["n_seen"].max().rename("n_max"), on="shard"
    ).query("n_seen == n_max")
    exact = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert final["n_seen"].groupby(final["shard"]).max().sum() == n_total
    weights = dict(zip(final["item"], final["weight"]))
    err = n_total / (MG_STREAM_K + 1.0)
    for user, freq in exact.items():
        if freq > err:
            assert user in weights, f"heavy user {user} missing from summary"
            assert weights[user] <= freq
            assert weights[user] >= freq - err


class _FakeValueState:
    """Minimal stand-in for pyspark's ValueState cell (get/update/clear)."""

    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def exists(self):
        return self._v is not None

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.cells = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):  # noqa: N802
        return self.cells.setdefault(name, _FakeValueState())


def test_spend_tracker_processor_contract():
    """SpendTracker semantics without the protobuf state-server transport:
    drive the processor directly against a fake handle. Pins (a) exact
    integer-cent accumulation across micro-batches, (b) HALF_UP
    (half-away-from-zero) cent rounding matching Spark's F.round — the
    refund (negative value) case would truncate toward zero under a naive
    astype('int64'). Values are binary-exact (.125) so the .5-cent edge is
    exercised without float representation noise."""
    from hyperloglog_pyspark_spark.streaming.pipelines import SpendTracker

    tracker = SpendTracker()
    tracker.init(_FakeHandle())
    [out1] = list(
        tracker.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [0.125, 2.0, None]})]), None
        )
    )
    # 0.125 -> 12.5 cents -> 13 (half-up); 2.0 -> 200; null -> 0
    assert out1.to_dict("records") == [
        {"user_id": 7, "n_events": 3, "total_value": 2.13}
    ]
    [out2] = list(
        tracker.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [-0.125, 1.0]})]), None
        )
    )
    # refund -12.5 cents -> -13 (half AWAY from zero, not truncation to -12)
    assert out2.to_dict("records") == [
        {"user_id": 7, "n_events": 5, "total_value": 3.00}
    ]
    tracker.close()


def _have_protobuf() -> bool:
    """True only when google.protobuf is importable AND its runtime
    accepts pyspark 4.1.2's generated StateMessage stubs (gencode
    6.33.0) — an older runtime (e.g. protobuf 5.x from a TF/grpc stack)
    would fail ValidateProtobufRuntimeVersion at import, so presence
    alone must not lift the skip."""
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion(
            runtime_version.Domain.PUBLIC, 6, 33, 0, "", "StateMessage.proto"
        )
        return True
    except Exception:
        return False


# Exact environment gate for the transformWithStateInPandas e2e leg:
# pyspark 4.1.2's generated state-server stubs
# (pyspark/sql/streaming/proto/StateMessage_pb2.py) call
# ValidateProtobufRuntimeVersion(PUBLIC, 6.33.0, ...), so the e2e path
# needs google.protobuf with runtime >= 6.33.0 — absent in this
# container (no protobuf at all; re-checked round 14, 2026-08-16:
# `import google` → ModuleNotFoundError, and pip index confirms no
# network route to install one). The processor SEMANTICS run everywhere
# via the fake-handle contract tests (test_spend_tracker_processor_
# contract / test_cusum_monitor_processor_contract); only the protobuf
# state-server transport is environment-gated. On a standard Spark
# cluster image (protobuf present) the skip lifts with no code change.
_PROTOBUF_SKIP = pytest.mark.skipif(
    not _have_protobuf(),
    reason=(
        "transformWithStateInPandas e2e needs google.protobuf runtime "
        ">= 6.33.0 (pyspark 4.1.2 StateMessage_pb2 stubs); not installed "
        "in this container — processor semantics covered by the "
        "fake-handle contract tests"
    ),
)


@_PROTOBUF_SKIP
def test_transform_with_state_running_spend(spark, event_batches):
    """transformWithState parity: after both micro-batches, each user's
    latest emitted running total equals the batch aggregate over the full
    input (exact, via integer-cent state).

    Environment gate: see _PROTOBUF_SKIP above — the e2e transport needs
    google.protobuf runtime >= 6.33.0; where it is absent this test
    SKIPS with that pinned reason, and the processor semantics still run
    everywhere via test_spend_tracker_processor_contract."""
    from hyperloglog_pyspark_spark.streaming.pipelines import user_spend_stream

    # transformWithState requires the RocksDB state store.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    stream = user_spend_stream(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("running_spend")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("running_spend").toPandas()
    finally:
        q.stop()
    # update-mode sink appends one row per key per micro-batch: the LAST
    # row per user is the running total after all batches.
    got_last = got.groupby("user_id").tail(1).reset_index(drop=True)
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100).cast("long")) / 100.0
            ).alias("total_value"),
        )
        .toPandas()
    )
    key = ["user_id"]
    pd.testing.assert_frame_equal(
        got_last.sort_values(key).reset_index(drop=True)[["user_id", "n_events", "total_value"]],
        want.sort_values(key).reset_index(drop=True)[["user_id", "n_events", "total_value"]],
        check_like=True,
    )


def test_python_streaming_datasource_exact_drain(spark, tmp_path):
    """Custom Python streaming source (simpleStreamReader): draining the
    capped tick stream yields exactly rows [0, cap) with the deterministic
    generator fields — offsets are row ranges, so micro-batch boundaries
    cannot duplicate or drop rows."""
    from hyperloglog_pyspark_spark.sources.pysource import SyntheticTicksSource

    spark.dataSource.register(SyntheticTicksSource)
    q = (
        spark.readStream.format("synthetic_ticks")
        .option("batch", 700)
        .option("cap", 3000)
        .load()
        .writeStream.format("memory")
        .queryName("ticks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("ticks").toPandas().sort_values("id").reset_index(drop=True)
    finally:
        q.stop()
    assert len(got) == 3000
    assert got["id"].tolist() == list(range(3000))
    # spot-check the generator arithmetic end-to-end
    row = got.iloc[1234]
    assert (row["bucket"], row["score"], row["user"]) == (1234 % 7, float(1234 * 13 % 101), f"u{1234 % 997}")


def test_python_streaming_datasource_recovers_from_checkpoint(spark, tmp_path):
    """Kill the tick stream mid-drain, restart from the same checkpoint:
    the restarted query must replay uncommitted ranges via
    readBetweenOffsets and finish with exactly rows [0, cap) — the
    exactly-once contract of offset-range sources under recovery."""
    from hyperloglog_pyspark_spark.sources.pysource import SyntheticTicksSource

    spark.dataSource.register(SyntheticTicksSource)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def start():
        return (
            spark.readStream.format("synthetic_ticks")
            .option("batch", 400)
            .option("cap", 2000)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        # let at least one micro-batch commit, then stop mid-stream
        while not q.recentProgress:
            q.awaitTermination(0.2)
    finally:
        q.stop()

    q = start()  # fresh query object, same checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(sink).toPandas().sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == list(range(2000)), (
        f"recovery broke exactly-once: {len(got)} rows, "
        f"dupes={got['id'].duplicated().sum()}"
    )


def test_cusum_monitor_processor_contract():
    """CusumMonitor semantics without the protobuf transport: the recursion
    must match a plain-Python replay across micro-batch boundaries (state
    carries over), alerts count rows above threshold, the statistic
    clamps at zero (never negative) when values run below target, and —
    because the recursion is ORDER-SENSITIVE — the processor must sort
    each micro-batch by event time, so a shuffle-scrambled batch yields
    the same result as the in-order one."""
    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        CUSUM_STREAM_H,
        CUSUM_STREAM_TARGET,
        CusumMonitor,
    )

    batches = [
        [400.0, 900.0, 50.0],            # drives s up
        [1200.0, None, None, 10.0],      # spike; nulls are SKIPPED, not zero
        [10.0, 10.0],                     # decay
        [1.0] * 12,                       # long run below target -> clamp at 0
    ]
    # event times: strictly increasing across the whole stream
    t = 0
    timed = []
    for batch in batches:
        ts = list(range(t, t + len(batch)))
        t += len(batch)
        timed.append((batch, ts))
    # plain replay in event-time order (nulls dropped — a missing
    # reading is not an observation)
    s = mx = n_alerts = 0
    h = int(CUSUM_STREAM_H * 1e6)
    for batch, _ in timed:
        for v in batch:
            if v is None:
                continue
            d = v - CUSUM_STREAM_TARGET
            du = int((1 if d >= 0 else -1) * __import__("math").floor(abs(d) * 1e6 + 0.5))
            s = max(0, s + du)
            mx = max(mx, s)
            n_alerts += s > h

    def drive(scramble):
        mon = CusumMonitor()
        mon.init(_FakeHandle())
        outs = []
        for batch, ts in timed:
            pdf = pd.DataFrame({"value": batch, "ts_us": ts})
            if scramble:
                pdf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
            outs.extend(mon.handleInputRows(("view",), [pdf], None))
        return outs

    outs = drive(scramble=False)
    # post-shuffle arrival order is nondeterministic: a scrambled batch
    # must fold identically (the processor sorts by ts before the
    # recursion)
    scrambled = drive(scramble=True)
    assert [o.to_dict("records") for o in scrambled] == [
        o.to_dict("records") for o in outs
    ]
    last = outs[-1].iloc[0]
    assert last.cusum == s / 1e6
    assert last.max_cusum == mx / 1e6
    assert last.n_alerts == n_alerts
    assert bool(last.alarm) == (s > h)
    assert last.cusum == 0.0, "run below target must clamp the statistic at zero"


def test_cusum_monitor_empty_row_iterator_is_noop():
    """transformWithState may invoke the handler with ZERO input rows for
    a key (e.g. a timer fire); the fold must re-emit the current state,
    not raise pd.concat's 'No objects to concatenate' ValueError — which
    would poison the query permanently."""
    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import CusumMonitor

    mon = CusumMonitor()
    mon.init(_FakeHandle())
    first = list(
        mon.handleInputRows(
            ("view",), [pd.DataFrame({"value": [900.0], "ts_us": [1]})], None
        )
    )[0]
    empty = list(mon.handleInputRows(("view",), iter([]), None))[0]
    assert empty.to_dict("records") == first.to_dict("records")


def test_streaming_incremental_dedup_index_grows(spark, sf_dir, tmp_path):
    """Ingestion-time near-dup screening as a stream: each micro-batch of
    documents is probed against the persisted MinHash band index
    (foreachBatch), and ACCEPTED documents' bands are appended to the
    index before the next batch — so a batch-2 document that duplicates
    an accepted batch-1 document is rejected even though neither is in
    the original corpus. The streaming twin of dedup_incremental_probe,
    with the index as growing state on storage rather than a static
    table."""
    from hyperloglog_pyspark_spark.functions.texttools import word_shingles
    from hyperloglog_pyspark_spark.operators.dedup import _band_table, _minhash_sigs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def bands_of(df):
        sh = (
            df.filter(F.size(F.split("text", " ")) >= 3)
            .select("doc_id", word_shingles("text", 3).alias("sh"))
        )
        return _band_table(_minhash_sigs(sh))

    index = str(tmp_path / "band_index")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    bands_of(hist).write.mode("overwrite").parquet(index)

    src = str(tmp_path / "incoming")
    b1 = docs.filter(F.col("doc_id") % 10 == 0)
    b2 = docs.filter(F.col("doc_id") % 10 == 5)
    accepted_out = str(tmp_path / "accepted")

    def ingest(batch_df, batch_id: int):
        bb = bands_of(batch_df)
        idx = batch_df.sparkSession.read.parquet(index)
        dups = (
            bb.join(idx.select("band", "band_hash").distinct(), ["band", "band_hash"])
            .select("doc_id")
            .distinct()
        )
        ok = batch_df.join(dups, "doc_id", "left_anti").select("doc_id", "text")
        bands_of(ok).write.mode("append").parquet(index)
        ok.select("doc_id").write.mode("append").parquet(accepted_out)

    _write_batch(spark, b1, src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        _write_batch(spark, b2, src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    got = {r.doc_id for r in spark.read.parquet(accepted_out).collect()}

    # Batch-accurate expectation computed independently: batch-1 docs are
    # rejected on hist collisions; batch-2 docs on hist ∪ accepted(b1).
    hist_bands = bands_of(hist).select("band", "band_hash").distinct()
    b1_bands = bands_of(b1)
    b1_dups = {
        r.doc_id
        for r in b1_bands.join(hist_bands, ["band", "band_hash"]).select("doc_id").distinct().collect()
    }
    exp1 = {r.doc_id for r in b1.select("doc_id").collect()} - b1_dups
    grown = hist_bands.union(
        b1_bands.filter(F.col("doc_id").isin(list(exp1))).select("band", "band_hash")
    ).distinct()
    b2_bands = bands_of(b2)
    b2_dups = {
        r.doc_id
        for r in b2_bands.join(grown, ["band", "band_hash"]).select("doc_id").distinct().collect()
    }
    exp2 = {r.doc_id for r in b2.select("doc_id").collect()} - b2_dups
    assert got == exp1 | exp2
    # State actually grew: batch-2 must see rejections beyond hist alone
    # (documents whose only near-dup was accepted in batch 1) whenever the
    # fixture contains cross-batch duplicate pairs; at minimum the index
    # file count increased.
    assert len({f for f in __import__("os").listdir(index) if f.endswith(".parquet")}) >= 3


def test_streaming_epochs_match_registered_manifest(spark, sf_dir, tmp_path):
    """The true-stream twin of ``dedup_incremental_epochs``: epoch-0 docs
    seed a persisted index (bands + shingles); epochs 1 and 2 arrive as
    ordered micro-batches whose foreachBatch handler band-probes the
    index, CONFIRMS collisions by exact Jaccard, appends only ADMITTED
    docs to the index, and records per-doc verdicts. The stream's
    verdicts must equal the registered batch query's manifest exactly —
    proving the batch-checkable form and the ingest-time pipeline
    implement the same contract (admitted-only index, verdicts chaining
    across epochs)."""
    from hyperloglog_pyspark_spark.operators.dedup import (
        JACCARD_T,
        _band_table,
        _minhash_sigs,
        _shingled,
    )
    from hyperloglog_pyspark_spark.registry import REGISTRY

    docs = _shingled(spark, sf_dir)  # doc_id, sh (≥3-token docs only)

    bands_dir = str(tmp_path / "index_bands")
    sh_dir = str(tmp_path / "index_shingles")
    verdicts = str(tmp_path / "verdicts")
    epoch = F.col("doc_id") % 3
    seed = docs.filter(epoch == 0)
    _band_table(_minhash_sigs(seed)).write.mode("overwrite").parquet(bands_dir)
    seed.write.mode("overwrite").parquet(sh_dir)

    def ingest(batch_df, batch_id: int) -> None:
        ss = batch_df.sparkSession
        bb = _band_table(_minhash_sigs(batch_df))
        idx = ss.read.parquet(bands_dir)
        cand = (
            bb.select(F.col("doc_id").alias("new_id"), "band", "band_hash")
            .join(idx, ["band", "band_hash"])
            .select("new_id", F.col("doc_id").alias("hist_id"))
            .distinct()
        )
        dn = batch_df.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_n"))
        dh = ss.read.parquet(sh_dir).select(
            F.col("doc_id").alias("hist_id"), F.col("sh").alias("sh_h")
        )
        inter = F.size(F.array_intersect("sh_n", "sh_h"))
        rejected = (
            cand.join(dn, "new_id")
            .join(dh, "hist_id")
            .filter(
                inter.cast("double") / (F.size("sh_n") + F.size("sh_h") - inter)
                >= JACCARD_T
            )
            .select("new_id")
            .distinct()
        )
        out = batch_df.select("doc_id").join(
            rejected, F.col("doc_id") == F.col("new_id"), "left"
        ).select("doc_id", F.col("new_id").isNull().alias("admitted"))
        out.write.mode("append").parquet(verdicts)
        ok = batch_df.join(
            rejected, batch_df["doc_id"] == rejected["new_id"], "left_anti"
        )
        _band_table(_minhash_sigs(ok)).write.mode("append").parquet(bands_dir)
        ok.write.mode("append").parquet(sh_dir)

    src = str(tmp_path / "incoming")
    _write_batch(spark, docs.filter(epoch == 1), src)
    stream = (
        spark.readStream.schema("doc_id bigint, sh array<string>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        _write_batch(spark, docs.filter(epoch == 2), src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    got = {
        (r.doc_id, r.admitted)
        for r in spark.read.parquet(verdicts).collect()
    }
    want = {
        (r.doc_id, r.admitted)
        for r in REGISTRY["dedup_incremental_epochs"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_ab_monitor_stream_matches_batch_ttest(spark, sf_dir, event_batches):
    """Streaming twin of experiment_ab_ttest: after each micro-batch the
    monitor's state is six commutative integer moments per metric, so
    the final emission must equal a batch recompute EXACTLY — same
    n/Σc/Σc² per variant and the same Welch t to the same rounding —
    under the arbitrary (event-id parity) batch split, proving the
    order-independence the operator's docstring claims."""
    from hyperloglog_pyspark_spark.registry import REGISTRY, queries
    from hyperloglog_pyspark_spark.streaming.pipelines import ab_monitor_stream

    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    q = (
        ab_monitor_stream(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("ab_monitor")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, second, src)
        q.processAllAvailable()
        got = spark.table("ab_monitor").toPandas()
    finally:
        q.stop()
    # final emission per metric = the one with the largest population
    got["n_tot"] = got["n_a"] + got["n_b"]
    final = got.loc[got.groupby("event_type")["n_tot"].idxmax()]
    queries()
    batch = {
        r["event_type"]: r
        for r in REGISTRY["experiment_ab_ttest"].fn(spark, sf_dir).collect()
    }
    assert set(final["event_type"]) == set(batch)
    for _, row in final.iterrows():
        b = batch[row["event_type"]]
        assert int(row["n_a"]) == b["n_a"] and int(row["n_b"]) == b["n_b"]
        assert round(float(row["t_welch"]), 4) == b["t_welch"]


def test_funnel_stream_matches_batch_counts(spark, sf_dir, event_batches):
    """Streaming first-touch funnel parity: with the event-id-parity
    batch split (deliberately NOT time-ordered), late-arriving earlier
    views must still lower tv and re-qualify already-seen clicks — the
    candidate-buffer state makes the final (tv, tc, tp) per user exact,
    so stage populations equal funnel_conversion's batch counts. Each
    stage time is non-increasing and never reverts to null, so the
    latest value per user is the column-wise null-ignoring min over
    update-mode emissions."""
    from hyperloglog_pyspark_spark.registry import REGISTRY, queries
    from hyperloglog_pyspark_spark.streaming.pipelines import funnel_stream

    ev, first, second, src, ckpt = event_batches
    _write_batch(spark, first, src)
    q = (
        funnel_stream(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, second, src)
        q.processAllAvailable()
        got = spark.table("funnel_state").toPandas()
    finally:
        q.stop()
    latest = got.groupby("user_id")[["tv", "tc", "tp"]].min()
    queries()
    b = REGISTRY["funnel_conversion"].fn(spark, sf_dir).collect()[0]
    assert int(latest["tv"].notna().sum()) == b["n_view"]
    assert int(latest["tc"].notna().sum()) == b["n_click"]
    assert int(latest["tp"].notna().sum()) == b["n_purchase"]


class _FakeGroupState:
    """Minimal stand-in for applyInPandasWithState's GroupState: exists /
    get as properties, update(tuple) — enough to drive the state fns
    directly without a streaming query."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_funnel_state_horizon_bounds_candidate_lists():
    """The funnel state fn's candidate lists are the one unbounded-state
    risk (a click-only user retains every click while tv stays None).
    With horizon_us set, candidates older than max-seen-ts − horizon are
    frozen out each fold, so state stays O(horizon's event count); the
    default (None) form keeps them all — both pinned here by driving the
    fn directly against a fake GroupState."""
    import pandas as pd
    import pickle

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _make_funnel_state_fn,
    )

    def feed(fn, state, ts_list):
        pdf = pd.DataFrame(
            {"event_type": ["click"] * len(ts_list), "ts_us": ts_list}
        )
        return list(fn(("u",), iter([pdf]), state))

    # click-only user, 500 clicks spread over 500s of event time
    ts = [i * 1_000_000 for i in range(500)]
    unbounded, bounded = _FakeGroupState(), _FakeGroupState()
    feed(_make_funnel_state_fn(None), unbounded, ts)
    feed(_make_funnel_state_fn(10_000_000), bounded, ts)  # 10s horizon
    n_unbounded = len(pickle.loads(unbounded.get[1])[0])
    n_bounded = len(pickle.loads(bounded.get[1])[0])
    assert n_unbounded == 500
    assert n_bounded == 11  # ts in [489s, 499s] survive (cutoff inclusive)
    # a view within the horizon still qualifies the retained clicks
    fn = _make_funnel_state_fn(10_000_000)
    pdf = pd.DataFrame({"event_type": ["view"], "ts_us": [492_000_000]})
    out = list(fn(("u",), iter([pdf]), bounded))[0]
    assert out.loc[0, "tv"] == 492_000_000
    assert out.loc[0, "tc"] == 492_000_000  # the click at 492s qualifies


def test_funnel_stream_horizon_never_unconverts_e2e(spark, tmp_path):
    """End-to-end twin of test_funnel_state_horizon_never_unconverts:
    a real funnel_stream(horizon_us=10s) query over three parquet
    micro-batches — a full conversion, then events far beyond the
    horizon. The committed stage times must survive the prune through
    the real applyInPandasWithState state round-trip (the pre-fix bug
    only surfaced on the SECOND fold after the prune)."""
    import datetime

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        funnel_stream,
        read_events_stream,
    )

    def ev_df(rows):
        # (event_id, seconds, user_id, event_type)
        return spark.createDataFrame(
            [
                (
                    eid,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
                    uid,
                    et,
                    1.0,
                    "{}",
                )
                for eid, s, uid, et in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # batch 1 (written before start — the file source needs the path):
    # user 7 converts at 100/101/102s
    _write_batch(spark, ev_df([(1, 100, 7, "view"), (2, 101, 7, "click"),
                               (3, 102, 7, "purchase")]), src)
    q = (
        funnel_stream(read_events_stream(spark, src), horizon_us=10_000_000)
        .writeStream.format("memory")
        .queryName("funnel_horizon")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batches 2+3: far-future events advance the horizon cutoff
        _write_batch(spark, ev_df([(4, 5000, 7, "view")]), src)
        q.processAllAvailable()
        _write_batch(spark, ev_df([(5, 5001, 7, "view")]), src)
        q.processAllAvailable()
        got = spark.table("funnel_horizon").toPandas()
    finally:
        q.stop()
    base = datetime.datetime(2024, 1, 1).replace(
        tzinfo=datetime.timezone.utc
    ).timestamp()
    want = {
        "tv": int((base + 100) * 1_000_000),
        "tc": int((base + 101) * 1_000_000),
        "tp": int((base + 102) * 1_000_000),
    }
    last = got.tail(1).iloc[0]  # one user -> last emission is the latest
    assert (last["tv"], last["tc"], last["tp"]) == (
        want["tv"], want["tc"], want["tp"],
    )


def test_funnel_state_horizon_never_unconverts():
    """Horizon pruning may only touch CANDIDATES, never the committed
    stage times: a user who converted must stay converted no matter how
    far event time advances. Regression for the prune deleting the
    established tc/tp from the candidate lists — the next fold then
    recomputed tc as a later click or None, silently un-converting the
    funnel. Committed values now persist in the state tuple as floors."""
    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _make_funnel_state_fn,
    )

    fn = _make_funnel_state_fn(10_000_000)  # 10s horizon
    state = _FakeGroupState()

    def feed(events):
        pdf = pd.DataFrame(
            {"event_type": [e for e, _ in events], "ts_us": [t for _, t in events]}
        )
        return list(fn(("u",), iter([pdf]), state))[0]

    # batch 1: full conversion at 100/101/102s
    out = feed([("view", 100_000_000), ("click", 101_000_000), ("purchase", 102_000_000)])
    assert (out.loc[0, "tv"], out.loc[0, "tc"], out.loc[0, "tp"]) == (
        100_000_000, 101_000_000, 102_000_000,
    )
    # batch 2: an event far beyond the horizon advances the prune cutoff
    out = feed([("view", 400_000_000)])
    assert (out.loc[0, "tv"], out.loc[0, "tc"], out.loc[0, "tp"]) == (
        100_000_000, 101_000_000, 102_000_000,
    )
    # batch 3: the fold after the prune must still see the committed
    # values (pre-fix they were recomputed from the emptied lists)
    out = feed([("view", 401_000_000)])
    assert (out.loc[0, "tv"], out.loc[0, "tc"], out.loc[0, "tp"]) == (
        100_000_000, 101_000_000, 102_000_000,
    )
    # legacy-checkpoint migration: a state blob written by the
    # pre-committed-floor format (3-tuple, no tc/tp) unpacks with the
    # floors unset and the fold recomputes them from the candidates
    import pickle

    legacy = _FakeGroupState()
    legacy.update((100, pickle.dumps(([150], [], 150))))
    pdf = pd.DataFrame({"event_type": ["click"], "ts_us": [120]})
    out = list(_make_funnel_state_fn(None)(("u",), iter([pdf]), legacy))[0]
    assert (out.loc[0, "tv"], out.loc[0, "tc"]) == (100, 120)
    assert len(pickle.loads(legacy.get[1])) == 5  # re-written as 5-tuple

    # a still-earlier qualifying candidate may lower a committed value
    # (monotone non-increasing), it just can never raise or null it
    fn2 = _make_funnel_state_fn(None)
    s2 = _FakeGroupState()
    pdf = pd.DataFrame(
        {"event_type": ["view", "click", "click"], "ts_us": [100, 300, 200]}
    )
    out = list(fn2(("u",), iter([pdf]), s2))[0]
    assert out.loc[0, "tc"] == 200
    pdf = pd.DataFrame({"event_type": ["view"], "ts_us": [50]})
    out = list(fn2(("u",), iter([pdf]), s2))[0]
    assert out.loc[0, "tc"] == 200  # 300 was discarded above the old tc
    pdf = pd.DataFrame({"event_type": ["click"], "ts_us": [60]})
    out = list(fn2(("u",), iter([pdf]), s2))[0]
    assert out.loc[0, "tc"] == 60  # new qualifying candidate lowers tc


def test_funnel_state_fuzz_exact_and_horizon_sound():
    """Property fuzz of the funnel state fn (pure Python — no Spark):
    for random event sequences, random arrival orders and random
    micro-batch splits,

    - horizon=None reproduces the batch-exact (tv, tc, tp) under ANY
      arrival order (the candidate-buffer exactness claim);
    - a finite horizon reproduces batch-exact under any order whose
      lateness is bounded by the horizon (arrival key = ts + jitter,
      jitter < H — the watermark-soundness model: when an event arrives,
      hi ≤ its ts + H, so it is never below the prune cutoff), including
      orders where conversion commits early and later events advance the
      cutoff far past the committed stage times.
    """
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _make_funnel_state_fn,
    )

    H = 10

    def exact(events):
        views = [t for e, t in events if e == "view"]
        clicks = [t for e, t in events if e == "click"]
        purchases = [t for e, t in events if e == "purchase"]
        tv = min(views) if views else None
        tc = min((t for t in clicks if tv is not None and t >= tv), default=None)
        tp = min((t for t in purchases if tc is not None and t >= tc), default=None)
        return tv, tc, tp

    def fold(fn, ordered, cuts):
        state = _FakeGroupState()
        out = None
        bounds = [0] + sorted(cuts) + [len(ordered)]
        for lo, hi in zip(bounds, bounds[1:]):
            batch = ordered[lo:hi]
            if not batch:
                continue
            pdf = pd.DataFrame(
                {"event_type": [e for e, _ in batch], "ts_us": [t for _, t in batch]}
            )
            out = list(fn(("u",), iter([pdf]), state))[0]
        return (
            (None, None, None)
            if out is None
            else tuple(
                None if pd.isna(v) else int(v)
                for v in (out.loc[0, "tv"], out.loc[0, "tc"], out.loc[0, "tp"])
            )
        )

    @given(
        events=st.lists(
            st.tuples(
                st.sampled_from(["view", "click", "purchase"]),
                st.integers(0, 60),
            ),
            min_size=1,
            max_size=14,
        ),
        order_seed=st.randoms(use_true_random=False),
        jitter=st.lists(st.integers(0, H - 1), min_size=14, max_size=14),
        cuts=st.lists(st.integers(0, 14), max_size=4),
    )
    @settings(max_examples=200, deadline=None, derandomize=True)
    def run(events, order_seed, jitter, cuts):
        want = exact(events)
        # unbounded form: ANY arrival order is exact
        shuffled = list(events)
        order_seed.shuffle(shuffled)
        assert fold(_make_funnel_state_fn(None), shuffled, cuts) == want
        # horizon form: exact under horizon-bounded lateness
        keyed = sorted(
            (t + jitter[i % len(jitter)], i, (e, t))
            for i, (e, t) in enumerate(events)
        )
        bounded_order = [ev for _, _, ev in keyed]
        assert fold(_make_funnel_state_fn(H), bounded_order, cuts) == want

    run()


def test_ab_ttest_batch_streaming_null_parity(spark, tmp_path):
    """Batch/streaming parity WITH null metric values present: the batch
    operator's n must count only non-null observations (COUNT over the
    when-expression), matching the streaming fold's dropna — pre-fix the
    batch counted every variant row into n while its sums skipped nulls,
    so means and t diverged whenever value was null."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hyperloglog_pyspark_spark.registry import REGISTRY, queries
    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _ab_moments_state_fn,
    )

    queries()  # populate the lazy registry (file may run in isolation)

    rows = [
        # (event_id, user_id, value): even user_id = variant 0
        (1, 0, 1.0), (2, 2, None), (3, 4, 5.0), (4, 6, 3.0),
        (5, 1, 2.0), (6, 3, 4.0), (7, 5, None), (8, 7, None), (9, 9, 8.0),
    ]
    # a second metric whose variant-0 side has exactly ONE non-null
    # observation: Welch variance divides by n−1, so without the n > 1
    # guard this was an ANSI DIVIDE_BY_ZERO crash of the whole query
    n1_rows = [(10, 0, 5.0), (11, 2, None), (12, 1, 1.0), (13, 3, 2.0)]
    # a third metric constant on BOTH sides: pooled variance is exactly
    # zero — no t statistic exists; the den > 0 guard must emit null
    # t/significant instead of an ANSI DIVIDE_BY_ZERO crash
    const_rows = [(14, 0, 1.0), (15, 2, 1.0), (16, 1, 1.0), (17, 3, 1.0)]
    allr = rows + n1_rows + const_rows
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in allr], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + r[0] for r in allr], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in allr], pa.int64()),
            "event_type": pa.array(
                ["purchase"] * len(rows) + ["click"] * len(n1_rows)
                + ["signup"] * len(const_rows)
            ),
            "value": pa.array([r[2] for r in allr], pa.float64()),
            "props": pa.array(["{}"] * len(allr)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {r["event_type"]: r for r in REGISTRY["experiment_ab_ttest"].fn(spark, str(tmp_path)).collect()}
    # the n=1 metric is dropped (not crashed on, not emitted as NULLs);
    # the constant metric is emitted with null t/significant
    assert set(out) == {"purchase", "signup"}
    assert out["signup"]["t_welch"] is None and out["signup"]["significant"] is None
    b = out["purchase"]
    # streaming fold over the same observations (variant = user_id % 2,
    # c = round(value*100); nulls arrive as NaN)
    state = _FakeGroupState()
    pdf = pd.DataFrame(
        {
            "variant": [r[1] % 2 for r in rows],
            "c": [None if r[2] is None else round(r[2] * 100) for r in rows],
        }
    )
    s = list(_ab_moments_state_fn(("purchase",), iter([pdf]), state))[0]
    assert (b["n_a"], b["n_b"]) == (s.loc[0, "n_a"], s.loc[0, "n_b"]) == (3, 3)
    # batch emits t rounded to 4dp; the streaming readout is unrounded
    assert abs(float(b["t_welch"]) - float(s.loc[0, "t_welch"])) < 1e-4


def test_streaming_folds_null_robustness():
    """The micro-batch folds must survive (and match batch semantics on)
    null-bearing columns, which Arrow hands over as float64/NaN:

    - ab moments: zero pooled variance → t is None (not a
      ZeroDivisionError poison pill, not a complex number); null variant
      (null user_id) rows land in NEITHER side, like the batch twin's
      F.when(variant == v); float64 c values accumulate via per-element
      int() so the exact-integer state discipline survives a null in
      the batch;
    - funnel: a null ts row is ignored, like the batch MIN/WHEN;
    - HLL distinct: a micro-batch containing a null user_id must not
      re-tokenize integer ids as '123.0' — registers match the batch
      canonicalization (CAST AS STRING: '123' and None)."""
    import numpy as np
    import pandas as pd

    from hyperloglog_pyspark_spark.functions import hll64
    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _HLL_P,
        _ab_moments_state_fn,
        _distinct_users_state_fn,
        _make_funnel_state_fn,
    )

    # zero-variance: both variants constant -> t None, no crash
    state = _FakeGroupState()
    pdf = pd.DataFrame({"variant": [0, 0, 1, 1], "c": [100.0, 100.0, 100.0, 100.0]})
    out = list(_ab_moments_state_fn(("signup",), iter([pdf]), state))[0]
    assert out.loc[0, "t_welch"] is None or pd.isna(out.loc[0, "t_welch"])
    # null variant rows (null user_id) land in NEITHER side
    state = _FakeGroupState()
    pdf = pd.DataFrame(
        {"variant": [0.0, 1.0, np.nan], "c": [100.0, 200.0, 999.0]}
    )
    out = list(_ab_moments_state_fn(("m",), iter([pdf]), state))[0]
    assert (out.loc[0, "n_a"], out.loc[0, "n_b"]) == (1, 1)
    assert (out.loc[0, "s1_a"], out.loc[0, "s1_b"]) == (100, 200)
    # exact-integer accumulation from a float64 column (one null forced
    # the dtype): python ints, not floats, reach the state tuple
    assert isinstance(state.get[1], int) and isinstance(state.get[2], int)

    # funnel: null ts ignored like the batch aggregates
    state = _FakeGroupState()
    pdf = pd.DataFrame(
        {"event_type": ["view", "click"], "ts_us": [np.nan, 50.0]}
    )
    out = list(_make_funnel_state_fn(None)(("u",), iter([pdf]), state))[0]
    assert pd.isna(out.loc[0, "tv"]) and pd.isna(out.loc[0, "tc"])

    # HLL: ids with a null in the batch tokenize like CAST(id AS STRING)
    state = _FakeGroupState()
    pdf = pd.DataFrame({"user_id": [123, 456, None]})
    list(_distinct_users_state_fn(("view",), iter([pdf]), state))
    want = hll64.empty_registers(_HLL_P)
    hll64.update_registers(
        want, np.array(["123", "456", None], dtype=object), _HLL_P
    )
    assert hll64.deserialize(state.get[0]).tolist() == want.tolist()


def test_ab_moments_state_fn_skips_null_metric_values():
    """SQL aggregates skip nulls; the streaming moments fold must too —
    a null events.value reaches the state fn as NaN, and before the
    dropna guard int(ca.sum()) raised (or corrupted the exact-integer
    state). Feed a batch with NaNs mixed in and assert the state equals
    the null-free fold."""
    import numpy as np
    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import (
        _ab_moments_state_fn,
    )

    state = _FakeGroupState()
    pdf = pd.DataFrame(
        {
            "variant": [0, 0, 1, 1, 0, 1],
            "c": [100.0, np.nan, 300.0, np.nan, 500.0, 700.0],
        }
    )
    out = list(_ab_moments_state_fn(("purchase",), iter([pdf]), state))[0]
    assert (out.loc[0, "n_a"], out.loc[0, "s1_a"]) == (2, 600)
    assert out.loc[0, "s2_a"] == 100 * 100 + 500 * 500
    assert (out.loc[0, "n_b"], out.loc[0, "s1_b"]) == (2, 1000)
    assert out.loc[0, "s2_b"] == 300 * 300 + 700 * 700


def _perc_fp_table(df):
    """(doc_id, b0..b3) image fingerprints through the REAL
    synth->decode->dHash path — shared by the streaming perceptual
    screening tests (the batch operators keep their own copy inside
    operators/multimodal.py with persist semantics)."""
    import pandas as pd

    from hyperloglog_pyspark_spark.operators.multimodal import (
        _perc_image_fp,
        _perc_image_synth,
    )

    def batches(it):
        for pdf in it:
            bands = [
                _perc_image_fp(_perc_image_synth(int(d)))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{f"b{i}": [b[i] for b in bands] for i in range(4)},
                }
            )

    return df.select("doc_id").mapInPandas(
        batches, schema="doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


def _perc_band_rows(h):
    return h.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "bv"),
    )


def _perc_matches(batch_h, index_bands):
    """(doc_id, match_id) DISTINCT pairs: incoming fingerprints probed
    against the persisted band index, Hamming-verified — the pair form
    so keeper election can take MIN(match_id)."""
    from hyperloglog_pyspark_spark.operators.multimodal import PERC_HAMMING_T

    a, b = _perc_band_rows(batch_h).alias("a"), index_bands.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")))
        for i in range(4)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .filter(ham <= PERC_HAMMING_T)
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("match_id"))
        .distinct()
    )


def test_streaming_incremental_perceptual_dedup(spark, sf_dir, tmp_path):
    """Ingestion-time perceptual media screening as a stream — the
    multimodal twin of test_streaming_incremental_dedup_index_grows:
    each micro-batch of media docs is fingerprinted through the REAL
    synth->decode->dHash path, band-probed against the persisted
    fingerprint index, Hamming-verified (<= PERC_HAMMING_T), and only
    ACCEPTED fingerprints are appended before the next batch — so a
    batch-2 image that near-duplicates an accepted batch-1 image is
    rejected even though neither is in the original corpus. Verdicts
    must equal an independent batch-accurate recompute."""
    fp_table = _perc_fp_table
    band_rows = _perc_band_rows

    def dup_ids(batch_h, index_bands):
        return _perc_matches(batch_h, index_bands).select("doc_id").distinct()

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    b1 = docs.filter(F.col("doc_id") % 10 == 0)
    b2 = docs.filter(F.col("doc_id") % 10 == 5)

    index = str(tmp_path / "fp_index")
    band_rows(fp_table(hist)).write.mode("overwrite").parquet(index)
    src = str(tmp_path / "incoming")
    accepted_out = str(tmp_path / "accepted")

    def ingest(batch_df, batch_id: int):
        h = fp_table(batch_df)
        idx = batch_df.sparkSession.read.parquet(index)
        ok = h.join(dup_ids(h, idx), "doc_id", "left_anti")
        band_rows(ok).write.mode("append").parquet(index)
        ok.select("doc_id").write.mode("append").parquet(accepted_out)

    _write_batch(spark, b1, src)
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        _write_batch(spark, b2, src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    got = {r.doc_id for r in spark.read.parquet(accepted_out).collect()}

    # independent batch-accurate recompute
    hist_bands = band_rows(fp_table(hist))
    b1_dups = {r.doc_id for r in dup_ids(fp_table(b1), hist_bands).collect()}
    exp1 = {r.doc_id for r in b1.collect()} - b1_dups
    grown = hist_bands.union(
        band_rows(fp_table(b1).filter(F.col("doc_id").isin(list(exp1))))
    )
    b2_dups = {r.doc_id for r in dup_ids(fp_table(b2), grown).collect()}
    exp2 = {r.doc_id for r in b2.collect()} - b2_dups
    assert got == exp1 | exp2
    # the planted 4-doc groups guarantee cross-set near-dups: some batch
    # docs must actually be rejected (the screen is doing work)
    assert b1_dups or b2_dups


def test_streaming_incremental_canonical_keeper_matches_batch(spark, sf_dir, tmp_path):
    """Streaming twin of multimodal_dedup_canonical's keeper election
    (r9 verdict item): the foreachBatch perceptual screen now maintains
    the canonical-pick verdict INCREMENTALLY — every ingested doc gets a
    (status, keeper_id) row where an accepted doc is its own keeper and
    a rejected near-dup's keeper is the SMALLEST admitted doc it
    Hamming-matches (the first-ingested copy, the same MIN convention
    the batch canonical pick elects). Accepted-only fingerprints append
    to the index between micro-batches, so batch-2 keepers can be
    batch-1 admits. The full verdict table must equal an independent
    batch-accurate recompute that replays the same epochs one
    DataFrame step at a time."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    b1 = docs.filter(F.col("doc_id") % 10 == 0)
    b2 = docs.filter(F.col("doc_id") % 10 == 5)

    index = str(tmp_path / "fp_index")
    _perc_band_rows(_perc_fp_table(hist)).write.mode("overwrite").parquet(index)
    src = str(tmp_path / "incoming")
    verdicts_out = str(tmp_path / "verdicts")

    def ingest(batch_df, batch_id: int):
        h = _perc_fp_table(batch_df)
        idx = batch_df.sparkSession.read.parquet(index)
        keepers = (
            _perc_matches(h, idx)
            .groupBy("doc_id")
            .agg(F.min("match_id").alias("keeper_id"))
        )
        ok = h.join(keepers, "doc_id", "left_anti")
        _perc_band_rows(ok).write.mode("append").parquet(index)
        verdicts = keepers.select(
            "doc_id", "keeper_id", F.lit("rejected").alias("status")
        ).union(
            ok.select(
                "doc_id",
                F.col("doc_id").alias("keeper_id"),
                F.lit("accepted").alias("status"),
            )
        )
        verdicts.write.mode("append").parquet(verdicts_out)

    _write_batch(spark, b1, src)
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        _write_batch(spark, b2, src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    got = {
        (r.doc_id, r.keeper_id, r.status)
        for r in spark.read.parquet(verdicts_out).collect()
    }

    # independent batch-accurate replay of the same epochs
    idx = _perc_band_rows(_perc_fp_table(hist))
    expected = set()
    for batch in (b1, b2):
        h = _perc_fp_table(batch)
        keepers = (
            _perc_matches(h, idx)
            .groupBy("doc_id")
            .agg(F.min("match_id").alias("keeper_id"))
        )
        expected |= {
            (r.doc_id, r.keeper_id, "rejected") for r in keepers.collect()
        }
        ok = h.join(keepers, "doc_id", "left_anti")
        expected |= {(r.doc_id, r.doc_id, "accepted") for r in ok.select("doc_id").collect()}
        idx = idx.union(_perc_band_rows(ok))

    assert got == expected
    rejected = {g for g in got if g[2] == "rejected"}
    accepted = {g for g in got if g[2] == "accepted"}
    # the planted 4-doc groups guarantee both outcomes occur, and every
    # keeper is an ADMITTED doc (hist or an earlier accepted stream doc)
    assert rejected and accepted
    admitted = {r.doc_id for r in hist.collect()} | {g[0] for g in accepted}
    assert all(k in admitted for _, k, _s in rejected)


def test_streaming_ann_index_append_matches_batch_rebuild(spark, sf_dir, tmp_path):
    """Index FRESHNESS for the partitioned ANN index
    (sink_ann_index_partitioned's layout): newly arriving vectors are
    encoded incrementally — coarse-assigned against the FROZEN centroid
    set, residualed against the FROZEN per-cell references, PQ-coded
    with the FROZEN codebook — and appended into the existing cent_id=
    partition directories by foreachBatch. Freezing the artifacts
    between retrains is exactly how production IVF-PQ stays fresh
    (FAISS add_with_ids); the contract here is batch-size invariance:
    after any sequence of micro-batches the persisted index must equal
    a ONE-SHOT encode of the grown corpus with the same artifacts, and
    every appended file must land inside a cent_id= directory."""
    import glob

    from hyperloglog_pyspark_spark.operators.similarity import (
        N_CENT_MOD,
        _centroid_set,
        _nearest_centroid,
        _pq_assign_codes,
        _pq_seed_model,
        _pq_sub_milli,
        as_milli,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_milli("embedding").alias("mv")
    )
    is_new = (F.col("vec_id") % 10).isin(3, 7)
    base = emb.filter(~is_new)
    b1 = emb.filter(F.col("vec_id") % 10 == 3)
    b2 = emb.filter(F.col("vec_id") % 10 == 7)

    # ---- frozen artifacts, built from the base corpus once ----
    cents = _centroid_set(
        base.filter(F.col("vec_id") % N_CENT_MOD == 0).select(
            F.col("vec_id").alias("k"), F.col("mv").alias("cv")
        )
    ).collect()[0]
    cents_row = spark.createDataFrame([cents])

    def assign(frame):
        best = _nearest_centroid("mv")
        return frame.crossJoin(F.broadcast(cents_row)).select(
            "vec_id", "mv", best["k"].alias("cent_id")
        )

    refc = (
        assign(base)
        .select("cent_id", F.posexplode("mv").alias("i", "e"))
        .groupBy("cent_id", "i")
        .agg(
            F.floor(F.sum("e") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long")
            .alias("c")
        )
        .groupBy("cent_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("rv")
        )
    )
    refc.write.mode("overwrite").parquet(str(tmp_path / "refs"))
    refc_frozen = spark.read.parquet(str(tmp_path / "refs"))

    def residuals(frame):
        return (
            assign(frame)
            .join(F.broadcast(refc_frozen), "cent_id")
            .select(
                "vec_id",
                "cent_id",
                F.zip_with("mv", "rv", lambda x, y: x - y).alias("r"),
            )
        )

    model_path = str(tmp_path / "codebook")
    _pq_seed_model(residuals(base).select("vec_id", "r"), "r").select(
        F.explode("cents").alias("c")
    ).select("c.m", "c.k", "c.cv").write.mode("overwrite").parquet(model_path)

    def encode(frame):
        from hyperloglog_pyspark_spark.operators.similarity import _pq_model_row

        model = _pq_model_row(spark.read.parquet(model_path))
        res = residuals(frame)
        codes = _pq_assign_codes(
            _pq_sub_milli(res.select("vec_id", "r"), "r"), model
        ).select("vec_id", "m", "k")
        return codes.join(res.select("vec_id", "cent_id"), "vec_id")

    index = str(tmp_path / "index")
    encode(base).write.mode("overwrite").partitionBy("cent_id").parquet(index)

    src = str(tmp_path / "incoming")
    ids_schema = "vec_id long"

    def ingest(batch_df, batch_id: int):
        ids = [r.vec_id for r in batch_df.collect()]
        frame = emb.filter(F.col("vec_id").isin(ids))
        encode(frame).write.mode("append").partitionBy("cent_id").parquet(index)

    _write_batch(spark, b1.select("vec_id"), src)
    stream = (
        spark.readStream.schema(ids_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        _write_batch(spark, b2.select("vec_id"), src)
        stream.processAllAvailable()
    finally:
        stream.stop()

    got = {
        (r.vec_id, r.m, r.k, r.cent_id)
        for r in spark.read.parquet(index).collect()
    }
    want = {
        (r.vec_id, r.m, r.k, r.cent_id) for r in encode(emb).collect()
    }
    assert got == want
    # layout: every data file sits inside a cent_id= partition directory
    stray = [
        f for f in glob.glob(f"{index}/*.parquet")
        if "cent_id=" not in f
    ]
    assert not stray, stray


def test_ewma_tracker_processor_contract():
    """EwmaTracker semantics without the protobuf transport: the
    quantized fold must exactly match a plain-Python integer replay
    across micro-batch boundaries (state carries over), stay within a
    micro-unit of the EXACT rational recursion at any length (the
    documented O(1)-state quantization bound), skip nulls, and — being
    order-sensitive — fold a shuffle-scrambled batch identically to the
    in-order one (the processor sorts by event time first)."""
    from fractions import Fraction

    import pandas as pd

    from hyperloglog_pyspark_spark.streaming.pipelines import EwmaTracker

    batches = [
        [400.0, 900.0, 50.0],
        [1200.0, None, None, 10.0],       # nulls are SKIPPED, not zero
        [10.0, 10.0],
        # negative half-integer midpoints: u=-1 then u=-2 puts the fold
        # at t=-3 → -1.5, where half-away-from-zero (-2, the repo
        # discipline) differs from a bare (t+1)>>1 shift (-1, toward
        # +inf); the mixed-sign pair walks the state back across zero
        [-0.000001, -0.000002, 0.000005, -0.000008],
        [123.456789] * 40,                 # long run: drift must stay bounded
    ]
    t = 0
    timed = []
    for batch in batches:
        ts = list(range(t, t + len(batch)))
        t += len(batch)
        timed.append((batch, ts))

    # integer replay (the processor's own arithmetic, independent code)
    s_i = n = 0
    # exact rational recursion (the mathematical EWMA on the same obs)
    s_x = None
    for batch, _ in timed:
        for v in batch:
            if v is None:
                continue
            u = int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)
            if n == 0:
                s_i = u
            else:
                # half-away-from-zero replay in a DIFFERENT formulation
                # (copysign/floordiv, not the processor's shifts)
                t_ = u + s_i
                s_i = int(math.copysign((abs(t_) + 1) // 2, t_)) if t_ else 0
            n += 1
            fv = Fraction(v).limit_denominator(10**9)
            s_x = fv if s_x is None else (fv + s_x) / 2

    def drive(scramble):
        trk = EwmaTracker()
        trk.init(_FakeHandle())
        outs = []
        for batch, ts in timed:
            pdf = pd.DataFrame({"value": batch, "ts_us": ts})
            if scramble:
                pdf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
            outs.extend(trk.handleInputRows(("view",), [pdf], None))
        # empty iterator (legal once timers fire) must be a state-neutral
        # no-op emit, not a pd.concat crash
        outs.extend(trk.handleInputRows(("view",), iter([]), None))
        return outs

    outs = drive(scramble=False)
    scrambled = drive(scramble=True)
    assert [o.to_dict("records") for o in scrambled] == [
        o.to_dict("records") for o in outs
    ]
    last = outs[-1].iloc[0]
    assert last.n_obs == n
    assert last.ewma == s_i / 1e6, "must equal the integer replay exactly"
    drift = abs(last.ewma - float(s_x))
    assert drift < 1e-6, f"quantization drift {drift} exceeds the documented bound"


def test_sketch_store_stream_matches_batch(spark, event_batches, tmp_path):
    """Streaming twin of sink_hll_sketch_store: the store grown one
    epoch per micro-batch, then a HAND-RE-DELIVERED micro-batch 0 (the
    crash-between-write-and-checkpoint retry), must equal the store
    built from the batch table in one pass — register-for-register: both
    sides canonicalize through hll_union_agg (dropping the HIP history,
    whose serialized header differs by build path even when registers
    are equal), so the union ESTIMATE is a deterministic function of the
    full register array alone and exact equality at 4 dp pins the
    register states equal; the epoch grain shows exactly one surviving
    epoch row per (cell, batch) despite the re-delivery."""
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.operators.sketch import LG_K
    from hyperloglog_pyspark_spark.streaming.pipelines import (
        read_events_stream,
        sketch_store_epoch_writer,
        sketch_store_stream,
    )

    store = str(tmp_path / "sketch_store")
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    q = (
        sketch_store_stream(read_events_stream(spark, src), store)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # re-deliver micro-batch 0 under the same batch_id: the idempotent
    # epoch commit must REPLACE epoch=0, not append a duplicate
    sketch_store_epoch_writer(store)(first, 0)

    day = F.to_date(F.date_trunc("day", "ts")).alias("day")
    stored = (
        spark.read.option("basePath", store)
        .parquet(store)
        .groupBy("event_type", "day")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")), 4)
            .alias("est"),
            F.count(F.lit(1)).cast("long").alias("n_epochs"),
        )
    )
    direct = (
        ev.groupBy("event_type", day)
        .agg(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(LG_K))
            .alias("sk")
        )
        .groupBy("event_type", "day")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")), 4)
            .alias("est"),
        )
    )
    got = {
        (r["event_type"], str(r["day"])): r
        for r in stored.collect()
    }
    want = {
        (r["event_type"], str(r["day"])): r
        for r in direct.collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["est"] == w["est"], f"register-state mismatch at {k}"
        # each (event_type, day) seen in <= 2 micro-batches; re-delivery
        # of batch 0 must not have added a third epoch row
        assert g["n_epochs"] <= 2, k


def test_ddsketch_store_stream_matches_batch(spark, event_batches, tmp_path):
    """Streaming twin of sink_ddsketch_store: the store grown one epoch
    per micro-batch, then a HAND-RE-DELIVERED micro-batch 0 (the
    crash-between-write-and-checkpoint retry), must equal the bucket
    table built from the batch data in one pass — BIT-EXACT per
    (event_type, day, bucket) count equality, because DDSketch state is
    plain integers. Unlike the HLL twin (register-max union is
    idempotent, so only the epoch grain could drift there), an append
    instead of the per-batch-id overwrite here would DOUBLE the batch-0
    counts and fail the frame equality — the re-delivery exercises the
    load-bearing idempotent commit, not just bookkeeping."""
    ev, first, second, src, ckpt = event_batches
    from hyperloglog_pyspark_spark.operators.sketch import _DD_ROWS
    from hyperloglog_pyspark_spark.streaming.pipelines import (
        ddsketch_store_epoch_writer,
        ddsketch_store_stream,
        read_events_stream,
    )

    store = str(tmp_path / "dd_store")
    _write_batch(spark, first, src)
    _write_batch(spark, second, src)
    q = (
        ddsketch_store_stream(read_events_stream(spark, src), store)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # re-deliver micro-batch 0 under the same batch_id: the idempotent
    # epoch commit must REPLACE epoch=0, not append a duplicate (which
    # would double-count every batch-0 value in the additive merge)
    ddsketch_store_epoch_writer(store)(first, 0)

    merged = (
        spark.read.option("basePath", store)
        .parquet(store)
        .groupBy("event_type", "day", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    bounds = spark.createDataFrame(_DD_ROWS, "bucket int, lo long, hi long")
    direct = (
        ev.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .join(
            F.broadcast(bounds),
            (F.col("c") >= F.col("lo")) & (F.col("c") < F.col("hi")),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    got = {
        (r["event_type"], str(r["day"]), r["bucket"]): r["n"]
        for r in merged.collect()
    }
    want = {
        (r["event_type"], str(r["day"]), r["bucket"]): r["n"]
        for r in direct.collect()
    }
    assert got == want, "stream-grown store counts diverged from batch"
