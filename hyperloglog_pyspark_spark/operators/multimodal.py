"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched Pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the decode step is a clearly
marked STUB (decode_image below raises NotImplementedError; the query path
uses a deterministic fake derived from the payload bytes). What IS real
and tested: the Spark-side plumbing a multimodal pipeline needs — binary
column construction, mapInPandas batch iteration, explicit output schema,
and partition-parallel execution with no driver collects.

Scale: binary payloads ride in parquet as byte arrays; mapInPandas
processes them batch-by-batch per partition (Arrow zero-copy into pandas),
which is exactly how a real frame-sampler/resizer runs over 100 TB of
media — per-partition, bounded memory, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table


def decode_image(payload: bytes) -> dict:
    """Real decoder entry point — STUBBED: no codec libraries in this
    environment. A deployment would decode via PIL/ffmpeg here and return
    width/height/frames."""
    raise NotImplementedError("media codecs unavailable in this environment; use fake_decode_meta")


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: metadata derived from payload
    bytes only, so the DuckDB oracle can reproduce it."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480


@register(
    "multimodal_meta",
    category="multimodal",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS frame_w,
           CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS frame_h,
           'stub' AS codec
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → decoded metadata via mapInPandas (stubbed decode).

    documents.text stands in for a media blob (encode → binary column);
    the UDF iterates Arrow batches and emits a typed metadata row per
    payload — the exact shape of a real decode/feature-extract pass.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "frame_w": meta.map(lambda m: m[1]),
                    "frame_h": meta.map(lambda m: m[2]),
                    "codec": "stub",
                }
            )

    return docs.mapInPandas(
        decode_batches,
        schema="doc_id long, n_bytes long, frame_w long, frame_h long, codec string",
    )


FRAME_STRIDE = 256
FRAME_SAMPLE = 64


@register(
    "multimodal_frame_sample",
    category="multimodal",
    oracle=f"""
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
    e AS (
        SELECT doc_id, n_bytes,
               unnest(range(0, (n_bytes + {FRAME_STRIDE - 1}) // {FRAME_STRIDE})) AS frame_idx
        FROM m
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * {FRAME_STRIDE} AS BIGINT) AS byte_offset,
           CAST(least({FRAME_SAMPLE}, n_bytes - frame_idx * {FRAME_STRIDE}) AS BIGINT) AS frame_len
    FROM e
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media blobs: every 256-byte "frame"
    yields a 64-byte sample descriptor — the 1→N mapInPandas shape of a
    real video frame-sampler (ffmpeg-seek per keyframe), with the decode
    itself stubbed (see decode_image).

    Scale: expansion happens inside the Arrow batch iterator,
    partition-parallel, bounded memory; no shuffle, no driver collect.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "byte_offset": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for idx in range((n + FRAME_STRIDE - 1) // FRAME_STRIDE):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["byte_offset"].append(idx * FRAME_STRIDE)
                    out["frame_len"].append(min(FRAME_SAMPLE, n - idx * FRAME_STRIDE))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        sample_batches,
        schema="doc_id long, frame_idx long, byte_offset long, frame_len long",
    )


@register(
    "multimodal_dedup_digest",
    category="multimodal",
    oracle="""
    WITH digests AS (
        SELECT doc_id, sha256(text) AS digest,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    groups AS (
        SELECT digest,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(MIN(n_bytes) AS BIGINT) AS n_bytes
        FROM digests GROUP BY digest
    )
    SELECT digest, canonical_doc, n_copies, n_bytes
    FROM groups WHERE n_copies > 1
    """,
)
def multimodal_dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by cryptographic digest of the binary payload:
    sha2-256 each blob (JVM-side, no UDF), group by digest, keep the lowest
    doc_id as the canonical copy and report replica groups — byte-identical
    dedup, the first pass of every multimodal curation pipeline (digests
    also serve as stable content-addressed media IDs downstream).

    Scale: the shuffle key is the 32-byte digest, never the payload —
    at 100 TB the exchange carries hashes + ids while blobs stay in place;
    uniform digest distribution also makes the shuffle skew-proof.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    digests = docs.select(
        "doc_id",
        F.sha2("payload", 256).alias("digest"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
    return (
        digests.groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )
