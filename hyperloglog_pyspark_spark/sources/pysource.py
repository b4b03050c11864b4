"""Custom connector via the Python DataSource API (Spark 4): a
deterministic synthetic-events generator with proper partition planning —
the extension point for sources Spark has no built-in reader for
(internal APIs, proprietary formats, test-data generators).

The reference's only "connector" is hand-loading JSON on the driver
(tests/HLL/test_examples.py:35-43); this is the engine-grade version:
the DRIVER plans partitions, each EXECUTOR generates/reads only its
partition — no data ever funnels through the driver.

Scale: partition count is the parallelism contract; a real connector maps
partitions to file splits / shard ranges / Kafka partitions the same way.
Generation is pure arithmetic on (row index) so any engine can reproduce
it — which is what makes the DuckDB oracle possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hyperloglog_pyspark_spark.registry import register

N_ROWS = 50_000
N_PARTS = 16


class SyntheticEventsReader(DataSourceReader):
    """Round-robin row generator: partition i yields rows i, i+P, i+2P…"""

    def __init__(self, options):
        self.n = int(options.get("n", N_ROWS))
        self.parts = int(options.get("parts", N_PARTS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        for k in range(i, self.n, self.parts):
            # deterministic integer arithmetic only — exactly reproducible
            yield (k, k % 7, float(k * 13 % 101), f"u{k % 997}")


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id long, bucket int, score double, user string"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


@register(
    "source_python_datasource",
    category="source",
    oracle=f"""
    SELECT bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(score) AS DOUBLE) AS total_score,
           CAST(COUNT(DISTINCT usr) AS BIGINT) AS n_users
    FROM (
        SELECT CAST(k % 7 AS INT) AS bucket,
               CAST(k * 13 % 101 AS DOUBLE) AS score,
               'u' || CAST(k % 997 AS VARCHAR) AS usr
        FROM range(0, {N_ROWS}) t(k)
    )
    GROUP BY bucket
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python DataSource — executors generate
    their partitions independently; the oracle reproduces the generator
    arithmetic relationally. (Score sums are exact: integer-valued doubles
    far below 2^53.)"""
    from hyperloglog_pyspark_spark.session import configure

    configure(spark)  # ships this package to Python workers (addPyFile) —
    # the DataSource class is pickled by reference and unpickled there
    spark.dataSource.register(SyntheticEventsSource)
    df = (
        spark.read.format("synthetic_events")
        .option("n", N_ROWS)
        .option("parts", N_PARTS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("score").cast("double").alias("total_score"),
        F.count_distinct("user").alias("n_users"),
    )
