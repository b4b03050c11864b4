"""Python UDTF surface (SURVEY.md §2.2 row "UDF / UDAF / UDTF"): a
table-valued function expanding each document into its word bigrams,
executed via SQL LATERAL — the 1→N row-generator shape (tokenizers,
sentence splitters, n-gram expanders) every text pipeline needs.

Scale: UDTFs run Arrow-batched (useArrow) per partition; the expansion
never materializes on the driver. For hot paths prefer built-in generators
(explode over a transform'd array — see textops.py) — the UDTF exists for
logic too imperative for higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table


@udtf(returnType="ngram string, pos bigint", useArrow=True)
class BigramUDTF:
    """Word bigrams with their position; empty output for <2 tokens."""

    def eval(self, text: str):  # noqa: D102
        toks = (text or "").split(" ")
        for i in range(len(toks) - 1):
            yield toks[i] + " " + toks[i + 1], i


@register(
    "udtf_bigrams",
    category="udf",
    bench=True,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks) - 1, 0))) AS pos
        FROM t
    )
    SELECT doc_id, toks[pos + 1] || ' ' || toks[pos + 2] AS ngram,
           CAST(pos AS BIGINT) AS pos
    FROM e
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join the bigram UDTF against documents."""
    spark.udtf.register("bigrams", BigramUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, b.ngram, b.pos FROM _udtf_docs d, LATERAL bigrams(d.text) b"
    )
