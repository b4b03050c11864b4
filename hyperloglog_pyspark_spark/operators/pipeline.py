"""The composed training-data pipeline: quality filter → exact dedup →
stratified sample → corpus accounting, as ONE Catalyst-planned DAG.

Each stage exists standalone elsewhere (text_repetition / dedup_exact /
sample_stratified / corpus_dashboard); this operator proves they compose
without materialization barriers — the way a real 100 TB curation job
runs: a single declarative plan Catalyst can push filters through, prune
columns across, and schedule with AQE end-to-end. The reference has no
relational layer at all (SURVEY.md §0); this is the north-star extension
(BASELINE.json north_star) in its end-to-end form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "pipeline_corpus_curation",
    category="pipeline",
    bench=True,
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               len(string_split(text, ' ')) AS n_words
        FROM documents
    ),
    quality AS (
        SELECT * FROM scored
        WHERE n_words >= 20
          AND CAST(length(text) AS DOUBLE) / n_words < 12.0
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ),
    sampled AS (
        SELECT * FROM deduped
        WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 80 ELSE 100 END)
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS total_words,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM sampled
    GROUP BY lang, source
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup (keep lowest doc_id per identical
    text) → stratified downsample of the dominant language → per-(lang,
    source) corpus accounting, in one plan.

    Scale: the quality filter runs at scan time (map-only) so the dedup
    shuffle on the text key sees only surviving rows; dedup keeps the
    deterministic first row via a window rather than dropDuplicates
    (whose survivor is partitioning-dependent); the sample is another
    map-only filter; the final rollup is an ordinary partial+final
    aggregate. Two shuffles total — text-hash dedup and the (lang,
    source) agg — both unavoidable, neither carrying filtered-out rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "source", "text",
        F.size(F.split("text", " ")).alias("n_words"),
    )
    quality = scored.filter(
        (F.col("n_words") >= 20)
        & (F.length("text").cast("double") / F.col("n_words") < 12.0)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    rate = F.when(F.col("lang") == "en", 80).otherwise(100)
    sampled = deduped.filter(F.pmod("doc_id", F.lit(100)) < rate)
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("bigint")).alias("total_words"),
        F.min("doc_id").alias("first_doc"),
    )


SURP_BAND = 10  # keep docs within ±10 milli-nats of the median surprisal
DUP_MAX = 0.9  # drop docs whose corpus-duplicated shingle ratio exceeds this


def _v2_oracle() -> str:
    # Each signal's SQL is interpolated from the SAME registered oracle
    # the Spark side's shared operator is checked against — one
    # definition per signal, so a contract change moves both engines.
    from hyperloglog_pyspark_spark.operators.curation import _split_case_sql
    from hyperloglog_pyspark_spark.operators.dedup import _minhash_oracle_cte
    from hyperloglog_pyspark_spark.registry import REGISTRY as _REG

    unigram = _REG["text_unigram_logprob"].oracle
    shingle_ratio = _REG["text_dup_shingle_ratio"].oracle

    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle_cte()}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc_id, lbl) AS (
        SELECT a, a FROM edges
        UNION SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc_id
    ),
    comp AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id),
    m AS (
        SELECT c.cluster_id, c.doc_id, len(string_split(d.text, ' ')) AS n_tokens
        FROM comp c JOIN documents d USING (doc_id)
    ),
    drops AS (
        -- same election tie-break as dedup_canonical_pick's ranked CTE
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
                ORDER BY n_tokens DESC, doc_id ASC) AS rn
            FROM m
        ) WHERE rn > 1
    ),
    scored AS (
        SELECT doc_id, n_tokens, avg_surprisal_milli AS avg_s
        FROM ({unigram})
    ),
    hist AS (SELECT avg_s, COUNT(*) AS c FROM scored GROUP BY avg_s),
    med AS (
        SELECT MIN(avg_s) AS m FROM (
            SELECT avg_s, SUM(c) OVER (ORDER BY avg_s) AS cum,
                   (SELECT SUM(c) FROM hist) AS t
            FROM hist
        ) WHERE cum >= (t + 1) // 2
    ),
    ratio AS (
        SELECT doc_id, dup_ratio FROM ({shingle_ratio})
    ),
    kept AS (
        SELECT d.doc_id, d.lang, s.n_tokens
        FROM documents d
        JOIN scored s USING (doc_id)
        JOIN ratio r USING (doc_id)
        CROSS JOIN med
        WHERE s.avg_s BETWEEN med.m - {SURP_BAND} AND med.m + {SURP_BAND}
          AND r.dup_ratio <= {DUP_MAX}
          AND d.doc_id NOT IN (SELECT doc_id FROM drops)
    )
    SELECT {_split_case_sql("doc_id")} AS split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM kept GROUP BY 1, 2
    """


@register("pipeline_curation_v2", category="pipeline", bench=True, oracle=_v2_oracle())
def pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision layer end-to-end: unigram-surprisal band
    filter (keep docs within ±{SURP_BAND} milli-nats of the corpus
    MEDIAN — both perplexity tails cut, CCNet-style) AND corpus-duplicated
    shingle ratio ≤ {DUP_MAX} (Gopher dup-n-gram cut), MINUS every
    non-canonical member of a MinHash-LSH near-dup cluster (longest-doc
    canonical election), accounted per (hash-split, lang) — the
    train/val/test token budgets a data order actually asks for.

    Scale: composes only bounded constructions — the LSH pair graph and
    component election run at pair-graph scale; the surprisal and
    shingle-df tables are vocabulary-keyed inverted indexes; the median
    comes from a histogram over DISTINCT integer surprisal values
    (log-range bounded, a few thousand rows) so no corpus-scale global
    window exists; the final rollup is one partial+final aggregation.
    The per-doc signal frames join co-keyed on doc_id.
    """
    from hyperloglog_pyspark_spark.operators.curation import (
        _split_expr,
        text_dup_shingle_ratio,
        text_unigram_logprob,
    )
    from hyperloglog_pyspark_spark.operators.dedup import (
        connected_components,
        dedup_minhash_lsh,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    # Persisted: three consumers (canonical election, the median
    # histogram, and the final band filter) read this doc-grain frame —
    # without the persist each re-runs the per-doc surprisal rollup.
    scored = tracked_persist(
        text_unigram_logprob(spark, sf_dir).select(
            "doc_id", "n_tokens", F.col("avg_surprisal_milli").alias("avg_s")
        )
    )
    # Canonical election reads n_tokens off the persisted scored frame
    # instead of re-scanning raw documents for size(split(text)) —
    # identical values (explode-count == split-size, empty tokens
    # included in both), one fewer corpus scan.
    members = scored.select("doc_id", "n_tokens").join(F.broadcast(comp), "doc_id")
    wc = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    drops = (
        members.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    hist = scored.groupBy("avg_s").agg(F.count(F.lit(1)).alias("c"))
    wh = Window.orderBy("avg_s")  # histogram-sized (distinct integer scores)
    tot = hist.agg(F.sum("c").alias("t"))
    med = (
        hist.withColumn("cum", F.sum("c").over(wh))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.floor((F.col("t") + 1) / 2))
        .agg(F.min("avg_s").alias("m"))
    )
    ratio = text_dup_shingle_ratio(spark, sf_dir).select("doc_id", "dup_ratio")
    kept = (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id")
        .join(ratio, "doc_id")
        .crossJoin(F.broadcast(med))
        .filter(
            F.col("avg_s").between(F.col("m") - SURP_BAND, F.col("m") + SURP_BAND)
            & (F.col("dup_ratio") <= DUP_MAX)
        )
        .join(F.broadcast(drops), "doc_id", "left_anti")
    )
    return kept.groupBy(_split_expr(F.col("doc_id")).alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
