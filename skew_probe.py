#!/usr/bin/env python
"""Skewed-decade probe: measure the engine's skew answers under the skew
they exist for.

`scale_probe.py` measures a UNIFORM 10× decade; this probe builds the
adversarial variant — same R× volume, but ~30% of all event rows are
reassigned to ONE user_id (a whale: bot / ingestion replay) and ONE
event_type (a hot key) — and times each salted operator against its
naive counterpart on all three corpora:

  x1   — the sf0.1 events table as-is (base),
  xRu  — R uniform replicas (user/event ids offset per replica),
  xRs  — R replicas, then ~30% of rows collapsed onto the whale key.

Pairs measured (salted = the registered query; naive = the textbook
single-key form, inline here):

- sessionize: `sessionize_salted_stitch` vs `sessionize_gap_ids` —
  window partitionBy(user_id): no engine mitigation exists for a whale
  window partition (AQE cannot split a window), so the naive form's
  skew ratio is expected to degrade and the slice-salted stitch to hold.
- join: `join_salted_skew` vs the same shuffle-hash join without salt —
  AQE's OptimizeSkewedJoin CAN split a skewed shuffle-join partition,
  so this pair measures salting against AQE's runtime answer.
- agg: `agg_salted_skew` vs a single-phase
  groupBy(event_type).agg(count, sum, count_distinct) — partial
  (map-side) aggregation is the built-in mitigation for low-cardinality
  group keys; the pair measures what explicit salting adds beyond it.

Ratios reported per (op, form): sec_Ru/sec_1x (uniform decade),
sec_Rs/sec_1x (skewed decade), and skew_penalty = the two ratios'
quotient — 1.0 means skew costs nothing beyond volume. Results recorded
in SCALE.md §"Measured skewed decade".

Run: ``python skew_probe.py [R]`` (default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hyperloglog_pyspark_spark import registry
from hyperloglog_pyspark_spark.functions.money import dec_price
from hyperloglog_pyspark_spark.session import get_spark
from hyperloglog_pyspark_spark.sources.catalog import load_table

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK_DIR = "/tmp/spark_graft_skew"
HOT_FRACTION = 3  # pmod(hash, 10) < 3 → ~30% of rows on the whale key
WHALE_USER = -1
HOT_TYPE = "click"
#: uniform replicas in the 1× base corpus — lifts base walls clear of the
#: fixed ~0.3 s per-job overhead so the R× ratio measures scaling, not
#: scheduler constants (sf0.1 events alone is 100k rows, sub-second)
BASE_MULT = int(os.environ.get("SPARK_GRAFT_SKEW_BASE_MULT", "3"))


def _replica_events(ev, k: int):
    return ev.select(
        (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
        (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
        "event_type",
        "ts",
        "value",
    )


def build_events(spark, out_dir: str, replicas: int, skewed: bool) -> None:
    ev = load_table(spark, BASE_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    d = _replica_events(ev, 0)
    for k in range(1, replicas):
        d = d.union(_replica_events(ev, k))
    if skewed:
        hot = F.pmod(F.xxhash64("event_id"), F.lit(10)) < HOT_FRACTION
        d = d.select(
            "event_id",
            F.when(hot, F.lit(WHALE_USER)).otherwise(F.col("user_id")).alias("user_id"),
            F.when(hot, F.lit(HOT_TYPE)).otherwise(F.col("event_type")).alias("event_type"),
            "ts",
            "value",
        )
    d.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def naive_agg(spark, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec_price("value")).cast("double").alias("total_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


def naive_join(spark, sf_dir: str):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_n"))
    joined = ev.join(dim.hint("shuffle_hash"), "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)") * F.col("type_n"))
        .cast("double")
        .alias("weighted_value"),
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.EAGER_CACHES = True
    registry.queries()

    dirs = {
        "x1": (BASE_MULT, False),
        "xRu": (BASE_MULT * replicas, False),
        "xRs": (BASE_MULT * replicas, True),
    }
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    for tag, (r, skewed) in dirs.items():
        build_events(spark, os.path.join(WORK_DIR, tag), r, skewed)

    pairs = [
        ("sessionize", "salted", registry.REGISTRY["sessionize_salted_stitch"].fn),
        ("sessionize", "naive", registry.REGISTRY["sessionize_gap_ids"].fn),
        ("join", "salted", registry.REGISTRY["join_salted_skew"].fn),
        ("join", "naive", naive_join),
        ("agg", "salted", registry.REGISTRY["agg_salted_skew"].fn),
        ("agg", "naive", naive_agg),
    ]
    results = []
    for op, form, fn in pairs:
        secs = {}
        for tag in dirs:
            best = None
            for _ in range(2):  # min of 2: drop one-off JIT/IO noise
                t0 = time.perf_counter()
                fn(spark, os.path.join(WORK_DIR, tag)).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            secs[tag] = round(best, 2)
        r_u = round(secs["xRu"] / max(secs["x1"], 0.05), 2)
        r_s = round(secs["xRs"] / max(secs["x1"], 0.05), 2)
        row = {
            "op": op,
            "form": form,
            "replicas": replicas,
            "sec_1x": secs["x1"],
            "sec_Ru": secs["xRu"],
            "sec_Rs": secs["xRs"],
            "ratio_uniform": r_u,
            "ratio_skew": r_s,
            "skew_penalty": round(r_s / max(r_u, 0.01), 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    salted_pen = max(r["skew_penalty"] for r in results if r["form"] == "salted")
    print(
        json.dumps(
            {
                "metric": "skew_decade_salted_worst_penalty",
                "value": salted_pen,
                "replicas": replicas,
                "hot_fraction": HOT_FRACTION / 10,
            }
        )
    )


if __name__ == "__main__":
    main()
