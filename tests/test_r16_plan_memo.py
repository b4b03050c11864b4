"""Round-16 registered-query plan memo (registry._PLAN_MEMO): a PURE
builder's second invocation reuses the rep-1 DataFrame handle (plan
construction only — every job still executes per invocation); a builder
that runs jobs at build time (eager cache counts, sink writes, training
checkpoints) is never memoized; releasing a query's caches drops its plan
entries; plan-only mode (lazy_caches) never memoizes."""

from __future__ import annotations

from hyperloglog_pyspark_spark import registry
from hyperloglog_pyspark_spark.registry import _PLAN_MEMO, queries

ALL = queries()

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pure_builder_memoizes_and_results_stable(spark):
    registry.release_caches()
    assert not _PLAN_MEMO
    # The first-ever read of a table runs a parquet footer job, so the
    # FIRST build is (correctly) not memoized; the second build runs
    # zero jobs and is; the third reuses its handle.
    a = ALL["scan_project_filter"](spark, SF)
    got1 = _rows(a)
    b = ALL["scan_project_filter"](spark, SF)
    c = ALL["scan_project_filter"](spark, SF)
    assert c is b  # same plan handle back — construction reused
    assert _rows(c) == got1  # execution repeats, bit-identical
    registry.release_caches()
    assert not _PLAN_MEMO


def test_job_running_builder_is_never_memoized(spark):
    registry.release_caches()
    # dedup_simhash eagerly count()s its fingerprint cache inside fn
    # (EAGER_CACHES) — a job runs during build, so no plan entry may
    # exist for it and re-invocation must rebuild.
    a = ALL["dedup_simhash"](spark, SF)
    assert not any(k[2] == "dedup_simhash" for k in _PLAN_MEMO)
    b = ALL["dedup_simhash"](spark, SF)
    assert b is not a
    assert _rows(b) == _rows(a)
    registry.release_caches()


def test_release_drops_owned_plan_entries(spark):
    registry.release_caches()
    # text_tfidf_topk persists interior frames; its (job-free) second
    # build memoizes. Another query's invocation releases its caches,
    # which must drop the plan entry too (a memoized plan over
    # unpersisted frames would silently recompute them per scan site).
    ALL["text_tfidf_topk"](spark, SF).collect()
    a = ALL["text_tfidf_topk"](spark, SF)
    if any(k[2] == "text_tfidf_topk" for k in _PLAN_MEMO):
        ALL["text_stats"](spark, SF).collect()
        assert not any(k[2] == "text_tfidf_topk" for k in _PLAN_MEMO)
        assert ALL["text_tfidf_topk"](spark, SF) is not a
    registry.release_caches()


def test_plan_only_mode_never_memoizes(spark):
    registry.release_caches()
    with registry.lazy_caches():
        ALL["scan_project_filter"](spark, SF)
    assert not _PLAN_MEMO
    registry.release_caches()
