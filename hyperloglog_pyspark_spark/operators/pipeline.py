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

from hyperloglog_pyspark_spark.registry import register
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
