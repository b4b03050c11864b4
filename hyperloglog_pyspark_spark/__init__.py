"""hyperloglog_pyspark_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference repo
(PatZoug/HyperLogLog_PySpark: a HyperLogLog/HLL++ cardinality-sketch
library with an RDD parallelization layer, see /root/reference/HLL/)
as an idiomatic Spark DataFrame/SQL engine, and extends it with the
relational operator inventory and LLM-data-pipeline operators described
in SURVEY.md §2.

Design principles (100 TB posture):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Partial+final aggregation (the reference's hand-rolled combiner pattern,
  HLL/examples.py:56-67) is expressed as built-in aggregates so map-side
  combine is automatic.
- Sketches (HLL) — not raw distincts — for cardinality rollups.
- Broadcast joins for dimension tables; shuffle joins only on large-large.
- No driver-side collect inside operators; results stay DataFrames.
"""

from hyperloglog_pyspark_spark.registry import REGISTRY, register, queries, oracle_sql  # noqa: F401
from hyperloglog_pyspark_spark.session import get_spark, configure  # noqa: F401
from hyperloglog_pyspark_spark.sources.catalog import TABLES, load_table, load_tables, register_views  # noqa: F401


def load_all_operators() -> None:
    """Import every operator module so its queries register themselves."""
    from hyperloglog_pyspark_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        cogrouped,
        curation,
        dedup,
        eventflow,
        graph,
        layoutops,
        multimodal,
        partsupp,
        pipeline,
        quality,
        relational,
        sampling,
        scalars,
        setops,
        similarity,
        sketch,
        sqlapi,
        streaming_batch,
        subqueries,
        textops,
        trainprep,
        udtf,
        windows,
    )
    from hyperloglog_pyspark_spark.sources import formats, pysource  # noqa: F401
