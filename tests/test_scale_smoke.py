"""Scale-linearity smoke: the bounded dedup paths (MinHash LSH, SimHash,
cluster components, and the inverted-index exact n-gram Jaccard) must
scale ~linearly in corpus size — the LSH/band/postings bounds holding is
exactly what makes them viable at 100 TB.

Method: inflate the sf0.1 documents table Rx by unioning word-salted
replicas (every token of replica k gets a _k suffix, so replicas share no
shingles and the near-dup pair structure stays linear — unsalted copies
would create R-sized near-dup cliques and a legitimately quadratic
output). Wall-time ratio t(Rx)/t(1x) must stay far below the quadratic
R² signature.

dedup_ngram_jaccard qualifies because it generates pairs from a shingle
postings join (work ∝ Σ_g df(g)², bounded by shared-content structure),
not by enumerating length-block pairs — salted replicas add postings but
no cross-replica matches, so its work grows R×. Its output is also
exactly R× the base (salting is injective on shingle sets), giving a
row-exactness check the hash-based paths can't make.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.registry import REGISTRY, queries
from hyperloglog_pyspark_spark.sources.catalog import load_table

BASE_DIR = "/root/testdata/sf0.1"
R = 6  # inflation factor for the linear paths
# Linear scaling would be ~R, quadratic ~R²(=36); the bar splits them with
# generous local-mode noise slack (scheduling overhead, JIT, GC).
MAX_RATIO = 15.0

LINEAR_OPS = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    # Inverted-index / sketch paths over documents: salted replicas add
    # postings and vocabulary but no cross-replica matches, so work grows
    # R× while output row counts stay structural (source-pair matrix /
    # top-k) — only the time ratio is asserted for these.
    "corpus_overlap_grams",
    "heavy_hitters_mg",
    # Broadcast-join contamination check: replica k's corpus grams can
    # only hit replica k's bench grams (suffixes differ), so hits — and
    # output rows — are exactly R× the base, work R×.
    "text_decontaminate",
    # Curation layer: per-doc outputs are exactly R× (salting is
    # injective on words/shingles, so df counts and surprisal tables
    # replicate per-suffix); canonical-pick clusters replicate per
    # replica since no near-dup pair crosses a salt boundary.
    "text_dup_shingle_ratio",
    "text_unigram_logprob",
    "dedup_canonical_pick",
]


def _salted(docs, k: int):
    words = F.split("text", " ")
    return docs.select(
        (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
        F.concat_ws(
            " ", F.transform(words, lambda w: F.concat(w, F.lit(f"_{k}")))
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _write_corpus(docs, path, replicas: int) -> None:
    base = _salted(docs, 0)
    for k in range(1, replicas):
        base = base.union(_salted(docs, k))
    base.repartition(8).write.parquet(str(path / "documents.parquet"))


@pytest.mark.slow
def test_bounded_dedup_paths_scale_linearly(spark, tmp_path):
    queries()
    docs = load_table(spark, BASE_DIR, "documents")
    one, big = tmp_path / "x1", tmp_path / f"x{R}"
    _write_corpus(docs, one, 1)
    _write_corpus(docs, big, R)

    for name in LINEAR_OPS:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        n1 = fn(spark, str(one)).count()
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        nr = fn(spark, str(big)).count()
        tr = time.perf_counter() - t0
        # Salting precludes cross-replica near-dups, so output is ~R× the
        # base — exactly R× for the deterministic ngram path; hash-based
        # paths can move boundary pairs (minhash band recall, coincidental
        # simhash closeness on short docs), so order is what matters there.
        if name in ("corpus_overlap_grams", "heavy_hitters_mg"):
            assert nr == n1, f"{name}: structural output changed {n1} -> {nr}"
        else:
            if name in (
                "dedup_ngram_jaccard",
                "text_decontaminate",
                "text_dup_shingle_ratio",
                "text_unigram_logprob",
            ):
                lo, hi = 1.0, 1.0
            elif name in ("dedup_simhash", "dedup_canonical_pick"):
                lo, hi = 0.5, 1.5
            else:
                lo, hi = 0.9, 1.1
            assert lo * R * n1 <= nr <= hi * R * n1, (
                f"{name}: rows {n1} -> {nr}, expected ~{R}x"
            )
        ratio = tr / max(t1, 0.2)  # floor guards divide-by-scheduler-noise
        assert ratio < MAX_RATIO, f"{name}: {t1:.2f}s -> {tr:.2f}s ({ratio:.1f}x at {R}x data)"


# --- partition-count invariance -------------------------------------------

# Representatives of every merge-order-sensitive class: decimal money
# sums, window tie-breaks, top-k limits, deterministic sampling, float
# score ranking, LSH banding, mergeable sketch states, session windows.
PARTITION_INVARIANT_QUERIES = [
    "agg_pricing_summary",
    "window_topk_per_group",
    "orderby_limit_topk",
    "sample_weighted_reservoir",
    "text_pmi_collocations",
    "dedup_minhash_lsh",
    "heavy_hitters_mg",
    "sessionize_gap_ids",
    "hll_sketch_rollup",
    # r6 single-scan rewrites: windowed funnel chain, conditional-agg
    # moments, per-key CMS cells, DataSketches accuracy sweep
    "funnel_conversion",
    "experiment_ab_ttest",
    "cms_frequency",
    "hll_accuracy_report",
]


def test_results_invariant_under_partition_count(spark, sf_dir):
    """The 1000-executor determinism claim made explicit: every query's
    result must be IDENTICAL (values, not just rows) at wildly different
    parallelism. The suite runs at shuffle.partitions=8 and the driver's
    bare session at Spark's default 200 — both hash-match DuckDB, which
    already implies this — but this test pins the property directly at
    3 and 57 partitions so a merge-order-sensitive regression (float
    accumulation order, unpinned window ties, partition-dependent
    sampling) fails HERE with the query named, not as a distant driver
    hash mismatch."""
    from hyperloglog_pyspark_spark.registry import REGISTRY, queries, release_caches

    queries()

    def rows_at(n_part: int, name: str):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        try:
            return sorted(map(tuple, REGISTRY[name].fn(spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            release_caches()

    diverged = []
    for name in PARTITION_INVARIANT_QUERIES:
        a = rows_at(3, name)
        b = rows_at(57, name)
        if a != b:
            diverged.append(name)
    assert not diverged, f"results vary with partition count: {diverged}"
