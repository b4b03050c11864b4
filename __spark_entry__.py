"""Driver contract for the spark-graft builder (PySpark target).

Everything is re-exported from the hyperloglog_pyspark_spark package; the
query registry (hyperloglog_pyspark_spark/registry.py) is the single
source of truth — each operator module registers its queries plus, when
SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperloglog_pyspark_spark import registry  # noqa: E402
from hyperloglog_pyspark_spark.sources.catalog import load_table  # noqa: E402

# The driver EXECUTES everything it builds through this module, so the
# eager-cache path (materialize a self-join's persisted build side once,
# before the join races to fill it) is the right default here. Library
# default is False so plan-only consumers never trigger jobs.
registry.EAGER_CACHES = True

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: distinct users per day on
    the events stream — approximate (HLL++) and exact side by side, the
    engine's form of the reference's estimate_distinct_elements_parallel +
    calculate_empirical_accuracy pair (HLL/examples.py:56-83)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
