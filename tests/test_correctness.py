"""Driver-mirror correctness gate: every registered query with an oracle
must match DuckDB exactly (row count + columns + canonical values).
Queries without an oracle are smoke-checked (runs, yields a schema)."""

from __future__ import annotations

import pytest

from hyperloglog_pyspark_spark.registry import REGISTRY, queries
from tests.helpers import compare

ALL = queries()  # triggers operator registration


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_vs_oracle(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.limit(5).collect()
        assert df.schema is not None
        assert rows is not None
    else:
        compare(df, duck, q.oracle, name)
