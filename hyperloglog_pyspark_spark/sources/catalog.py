"""Table catalog over the driver-generated parquet star schema.

The reference has no file connectors at all (its tests load JSON by hand,
tests/HLL/test_examples.py:35-43); this module is the engine's scan layer:
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and partition pruning for free.

Scale notes: at 100 TB these reads become partitioned/ bucketed external
tables; the normalization applied here (nanos→micros on events.ts) is a
projection that stays inside whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing physical quirks of the testdata files."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as raw int64 (nanosAsLong); floor-
        # divide to micros — same truncation DuckDB applies at micro
        # granularity, keeping oracle comparisons exact.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ,
    # which unix_millis/unix_micros and interval casts reject. The session
    # timezone is pinned to UTC (session.py), so casting NTZ→TIMESTAMP is a
    # pure type relabel of the same wall-clock — identical to how DuckDB
    # reads the file as a naive TIMESTAMP. Normalize every table generically
    # so a future testdata regeneration can't reintroduce the mismatch.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so queries can be authored in spark.sql."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
