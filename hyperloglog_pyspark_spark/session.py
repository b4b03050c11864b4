"""SparkSession construction and runtime configuration.

Two entry paths:
- ``get_spark()`` builds a session for local runs (tests, bench.py).
- ``configure(spark)`` applies the runtime-settable confs we rely on to a
  session we did NOT build (the driver hands us one in __spark_entry__).

Scale notes: the static configs below are tuned for local[32]/128 GiB, but
every knob is the one you'd turn on a 1000-executor cluster too — AQE for
runtime re-planning (skew joins, partition coalescing), a shuffle-partition
count sized to cores, Arrow for any Python-side exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs (safe on someone else's session)."""
    conf = spark.conf
    # The driver-generated events.parquet stores ts as TIMESTAMP(NANOS),
    # which Spark's parquet reader rejects [PARQUET_TYPE_ILLEGAL]; read the
    # raw int64 nanos and convert in the catalog layer (sources/catalog.py).
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Deterministic time semantics, aligned with DuckDB's naive timestamps.
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def get_spark(app_name: str = "hyperloglog_pyspark_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpu_count()
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure(spark)
