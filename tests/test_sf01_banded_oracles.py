"""sf0.1-band oracle re-verification of the quadratic-DuckDB queries.

The queries in QUADRATIC_ORACLE_QUERIES carry DuckDB oracles whose
cost is quadratic in the
document count (all-pairs CTEs: MinHash/Jaccard/SimHash/containment/
cluster/leakage/pipeline-v2), so the full sf0.1 oracle check is
impractical on the DuckDB side — COVERAGE.md records the exemption.
This module shrinks that exemption to zero: both the Spark query AND
its oracle run verbatim on a deterministic 1/5 band of the sf0.1
documents table (doc_id % 5 == 0 → 1 000 docs, double sf0.01's corpus,
drawn from sf0.1's actual text distribution). A band of a corpus is
itself a corpus, so every query — including the non-pairwise ones
(cluster components, calibration, pipeline aggregates) — is exercised
at full fidelity; the oracle's pair CTE drops to ~500k candidate pairs,
which DuckDB handles in seconds.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.registry import REGISTRY, queries
from hyperloglog_pyspark_spark.sources.catalog import load_table
from tests.helpers import compare

SF01 = "/root/testdata/sf0.1"

#: the COVERAGE.md exemption list this module retires
QUADRATIC_ORACLE_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_minhash_accuracy",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "dedup_containment",
    "dedup_incremental_probe",
    "dedup_incremental_epochs",
    "dedup_prefix_filter",
    "dedup_canonical_pick",
    "split_leakage_audit",
    "split_cluster_safe",
    "pipeline_curation_v2",
    "sample_dedup_weighted",
]


@pytest.fixture(scope="module")
def banded_dir(spark, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("sf01_band")
    docs = load_table(spark, SF01, "documents").filter(F.col("doc_id") % 5 == 0)
    docs.repartition(8).write.parquet(str(out / "documents.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def banded_duck(banded_dir):
    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{banded_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", QUADRATIC_ORACLE_QUERIES)
def test_quadratic_oracle_matches_at_sf01_band(
    name, spark, banded_dir, banded_duck
):
    queries()
    q = REGISTRY[name]
    compare(q.fn(spark, banded_dir), banded_duck, q.oracle, name)
