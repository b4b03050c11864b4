"""Round-15 trained-model session memos (similarity._KM_CENT_MEMO /
_PQ_MODEL_MEMO): the _CC_MEMO discipline applied to the k-means centroid
row and the trained PQ codebook. Contract mirrored from
test_connected_components_memo_survives_query_release: re-invocation of
the registered query memo-HITS with bit-identical results, the memoized
frame survives another query's per-query cache release, a FULL
release_caches() empties the memo, and plan-only mode (lazy_caches)
never memoizes (building a plan must not run a checkpoint job)."""

from __future__ import annotations

from hyperloglog_pyspark_spark.registry import queries

ALL = queries()

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_km_centroid_memo_hits_and_releases(spark):
    from hyperloglog_pyspark_spark import registry
    from hyperloglog_pyspark_spark.operators.similarity import _KM_CENT_MEMO

    registry.release_caches()
    assert not _KM_CENT_MEMO
    got1 = _rows(ALL["embedding_kmeans_lloyd"](spark, SF))
    assert len(_KM_CENT_MEMO) == 1
    # re-invocation memo-hits (entry count stable) with identical rows
    got2 = _rows(ALL["embedding_kmeans_lloyd"](spark, SF))
    assert len(_KM_CENT_MEMO) == 1
    assert got2 == got1
    # another query's invocation releases per-query caches; memo survives
    # and the trained row is still servable
    ALL["text_stats"](spark, SF).collect()
    assert len(_KM_CENT_MEMO) == 1
    assert _rows(ALL["embedding_kmeans_lloyd"](spark, SF)) == got1
    # FULL release empties the memo; a fresh call retrains to the same rows
    registry.release_caches()
    assert not _KM_CENT_MEMO
    assert _rows(ALL["embedding_kmeans_lloyd"](spark, SF)) == got1
    registry.release_caches()


def test_pq_model_memo_hits_and_releases(spark):
    from hyperloglog_pyspark_spark import registry
    from hyperloglog_pyspark_spark.operators.similarity import _PQ_MODEL_MEMO

    registry.release_caches()
    assert not _PQ_MODEL_MEMO
    got1 = _rows(ALL["similarity_pq_trained_codebook"](spark, SF))
    n1 = len(_PQ_MODEL_MEMO)
    assert n1 >= 1
    got2 = _rows(ALL["similarity_pq_trained_codebook"](spark, SF))
    assert len(_PQ_MODEL_MEMO) == n1  # hit, no new entry
    assert got2 == got1
    # the residual index trains a DIFFERENT codebook (residual subvectors)
    # -> a second entry, never a false hit on the first
    res1 = _rows(ALL["similarity_ivf_pq_residual_topk"](spark, SF))
    n2 = len(_PQ_MODEL_MEMO)
    assert n2 == n1 + 1
    assert _rows(ALL["similarity_ivf_pq_residual_topk"](spark, SF)) == res1
    assert len(_PQ_MODEL_MEMO) == n2
    registry.release_caches()
    assert not _PQ_MODEL_MEMO
    assert _rows(ALL["similarity_pq_trained_codebook"](spark, SF)) == got1
    registry.release_caches()


def test_km_memo_fifo_cap_evicts_oldest(spark, monkeypatch):
    """r16 (from r15 advice): _KM_CENT_MEMO carries the same FIFO cap +
    release_memo_frame eviction as _PQ_MODEL_MEMO — a long session over
    many distinct ev plans must not accumulate unevictable checkpointed
    frames. With the cap pinned to 1, training over a second sf_dir
    evicts the first entry (dict size stays 1) and both queries still
    serve correct, re-derivable rows afterwards."""
    from hyperloglog_pyspark_spark import registry
    from hyperloglog_pyspark_spark.operators import similarity

    registry.release_caches()
    monkeypatch.setattr(similarity, "_KM_CENT_MEMO_CAP", 1)
    got1 = _rows(ALL["embedding_kmeans_lloyd"](spark, SF))
    assert len(similarity._KM_CENT_MEMO) == 1
    key1 = next(iter(similarity._KM_CENT_MEMO))
    ALL["embedding_kmeans_lloyd"](spark, "/root/testdata/sf0.01").collect()
    assert len(similarity._KM_CENT_MEMO) == 1  # capped: oldest evicted
    assert next(iter(similarity._KM_CENT_MEMO)) != key1
    # the evicted plan retrains cleanly (its blocks were released, not
    # left dangling) and reproduces the same rows
    assert _rows(ALL["embedding_kmeans_lloyd"](spark, SF)) == got1
    registry.release_caches()


def test_memos_disabled_in_plan_only_mode(spark):
    from hyperloglog_pyspark_spark import registry
    from hyperloglog_pyspark_spark.operators.similarity import (
        _KM_CENT_MEMO,
        _PQ_MODEL_MEMO,
    )

    registry.release_caches()
    with registry.lazy_caches():
        ALL["embedding_kmeans_lloyd"](spark, SF)
        ALL["similarity_pq_trained_codebook"](spark, SF)
    assert not _KM_CENT_MEMO and not _PQ_MODEL_MEMO
    registry.release_caches()
