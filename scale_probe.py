#!/usr/bin/env python
"""Scale-decade probe: measure the quadratic-risk operator family at an
sf1-equivalent corpus (R× the sf0.1 tables, default R=10) and report
wall-time ratios vs the 1× base.

Why a probe and not real sf1 testdata: the driver only generates
sf{0.001,0.01,0.1}; this synthesizes the decade locally so the
linearity argument (`tests/test_scale_smoke.py`, R=6 on the dedup
family) gets a measured 10× datapoint on the four heaviest composed
operators. Results are recorded in SCALE.md §"Measured scale decade".

Corpus construction (mirrors the smoke test's salting so pair structure
stays linear instead of forming R-sized near-dup cliques):
- documents: R word-salted replicas — every token of replica k gets a
  ``_k`` suffix, so replicas share no shingles/vocabulary and near-dup
  pairs never cross a salt boundary.
- embeddings: R replicas with REPLICA-LOCAL labels (label + k*1000)
  AND a cosine-PRESERVING per-replica transform (rotate components by
  k positions, then flip signs on an alternating k-dependent mask).
  The label count seeds the cluster count of the semdedup/kmeans
  family, so this reproduces the production rule that k grows with N
  (SemDedup sizes k ≈ √N). The transform is what makes it hold — two
  failure modes measured and rejected first: identical-coordinate
  replicas produce R identical centroid sets, and nearest-centroid
  assignment collapses every replica into one label space (10× cluster
  size = the quadratic reintroduced; first run measured 25× pair
  rows); a constant +4k offset separates centroids but inflates
  within-replica cosine toward 1 (shifted vectors share the offset
  component), crossing τ for nearly every pair. Rotation+sign-flip
  preserves all within-replica angles exactly (same prune decisions as
  the base corpus) while separating replica centroid sets, keeping
  assignment replica-local, cluster SIZE constant, and the
  Σ|cluster|²·d pair work R×, not R².

- events (r15): R replicas with offset user/event ids and UNTOUCHED
  timestamps — per-user structure repeats per replica while the
  calendar (day spine, cohort weeks, CUPED midpoint) stays fixed, so
  the event-scan analytics family's "scan grows, frames don't" claim
  is measurable.

Run: ``python scale_probe.py [R] [substring]`` (default 10, all ops;
the optional substring restricts to matching op names). Prints one
JSON line per operator with base/inflated wall seconds and the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hyperloglog_pyspark_spark import registry
from hyperloglog_pyspark_spark.session import get_spark
from hyperloglog_pyspark_spark.sources.catalog import load_table

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK_DIR = "/tmp/spark_graft_scale"

#: the operators VERDICT r4 flagged as the quadratic-risk family
PROBE_OPS = [
    "dedup_minhash_lsh",
    "dedup_canonical_pick",
    "pipeline_curation_v2",
    "semdedup_centroid_prune",
    "dedup_incremental_epochs",  # r6: chained-epoch probe joins
    # r7: the retrieval composite — fixed query set over a growing
    # corpus; output rows stay constant (8 queries), so the wall ratio
    # isolates the corpus-scale passes (tokenization, term restriction,
    # doc-length map) from the bounded scoring/eval stages
    "retrieval_ndcg_report",
    # r8: the hybrid with the BUCKETED dense leg — both corpora grow
    # (documents for BM25, embeddings for the LSH probes) while the
    # fused output stays 3 queries × top-10, so the ratio isolates the
    # bucketing + probe-join passes from the bounded fusion
    "similarity_hybrid_rrf_ann",
    # r9: the stride-1 repeated-span signal — posting list one row per
    # token position, inverted-index distinct-doc count on the window
    # key; word-salted replicas share no windows, so dup structure (and
    # per-key bucket sizes) stay constant while the posting volume is R×
    "text_repeated_spans",
    # r9: the trim action shares the signal's posting pass but adds the
    # keeper election and the position-union explode — the explode is
    # bounded by MARKED windows (duplicated spans), which the salted
    # replicas keep at R× the base count, not R²
    "text_repeated_spans_trim",
    # r9: the banded-Hamming perceptual family (image twin; the audio
    # twin shares the identical plan) — replica ids (base + k·10⁷) are
    # ≡ 0 mod 4 so planted 4-doc groups never straddle replicas and the
    # pair graph stays linear; the probe measures the fingerprint
    # mapInPandas chain + the (band, value) self-join at 10× ids
    "multimodal_dedup_perceptual",
    # r10: the cross-modal canonical pick — BOTH fingerprint chains +
    # the unioned pair graph + connected components + byte accounting;
    # replica groups never straddle (ids ≡ 0 mod 4), so the pair graph
    # and component sizes stay linear while the decode volume is R×
    "multimodal_dedup_canonical",
    # r10: the residual trained IVF-PQ — fixed 8-query output over a
    # growing corpus; cells grow with the corpus (vec_id % 100), so the
    # ratio isolates the build-phase passes (coarse assign, per-cell
    # means, Lloyd rounds over residual subvectors, encode) from the
    # bounded query-side scoring
    "similarity_ivf_pq_residual_topk",
    # r11: the positional-gram exact-substring join — word-salted
    # replicas share no 8-grams, so matched pairs / diagonals / spans
    # stay constant per replica while the gram posting volume is R×;
    # the df-cap whale guard is what keeps Σ df(g)² linear here
    "dedup_exact_substring",
    # r11: Matryoshka two-stage retrieval — fixed 8-query output over a
    # growing corpus; the coarse prefix-dim pass is the only
    # corpus-width work (O(|Q|·N) streamed multiply-adds, no corpus
    # shuffle), the full-dim rerank stays shortlist-bounded
    "similarity_matryoshka_topk",
    # r12: Zipf rank-frequency audit — salted replicas multiply the
    # VOCABULARY by R (each replica owns a disjoint suffixed vocab), so
    # this measures the vocab-sized rank window + moment agg growing
    # R× while the corpus-side count agg stays one map-side pass
    "quality_zipf_audit",
    # r12: feature-hashing audit — gram volume grows R× but the bucket
    # frame is FIXED at FEAT_B rows and the output at top-20, so the
    # ratio isolates the explode+agg scan cost (the intended 100 TB
    # shape: corpus-width work, constant-width state).
    # (timeseries_ewma_unbounded reads lineitem, which this corpus does
    # not replicate — its (key, chunk) windows are <=2K rows by
    # construction at any length.)
    "text_hashed_ngram_features",
    # r13: the anisotropy report joins the probe — the r12 exclusion
    # (2^k magnitude shells pushing milli-unit moments past BIGINT) is
    # RETIRED by the r13 decimal(38,0)/HUGEINT moment fix; one element
    # explode to a d-row agg, no pair surface, so the ratio isolates
    # the scan
    "embedding_anisotropy_report",
    # r13: normalized-key exact dedup — word-salted replicas share no
    # text, so raw/norm group structure is replica-local and the probe
    # isolates the two thin digest-keyed aggregations growing R× (the
    # output is ONE summary row at any scale)
    "dedup_normalized_exact",
    # r13: the Gopher source-share cap — salted docs keep their source
    # column, so #sources is CONSTANT while tokens grow R×; the ratio
    # isolates the corpus token-count scan from the metadata-sized
    # fixpoint solve
    "mixture_source_share_cap",
    # r13: the ANN rebuild-policy monitor — fixed 8-query audit sample
    # (replica ids are huge, only replica 0 queries) over a growing
    # corpus; NOTE the coarse cells also grow (vec_id % 100 survives
    # the +k·10⁷ shift), so assignment work is N·C — super-linear by
    # design here, same as similarity_ivf_pq_residual_topk's build
    # passes; at production, assignments are the index's own
    # maintenance byproduct and the monitor reads them
    "ann_rebuild_policy",
    # r14: blocked entity resolution — replica names get a replica-tag
    # PREFIX (see _replica_cust), so the (nation, name-prefix) blocks
    # are replica-local and the pair/match/cluster structure repeats
    # per replica: total pairs R× the base, never R² (the same salting
    # argument as the word-salted documents); CC runs on an R× edge set
    "entity_resolution_blocked",
    # r15: the EVENT-SCAN analytics family — every one argues "ONE
    # events scan + metadata-sized frames after"; the replicated events
    # corpus (user ids offset per replica, timestamps untouched so the
    # calendar/day spine stays fixed) turns the argument into a
    # measured decade: per-user shuffles grow R×, the (cohort, t) /
    # (type, day) / variant frames stay calendar-bounded.
    "survival_nelson_aalen",
    "experiment_cuped_adjustment",
    "timeseries_autocorrelation",
    "funnel_significance_ztest",
    # r15: the model-quality family — the gram explode and the doc-grain
    # margin agg grow R× while the broadcast weight vector stays FEAT_B
    # rows and the output stays #sources × thresholds (salted docs keep
    # their source column); the same corpus-width-work/constant-state
    # shape text_hashed_ngram_features measures, plus a doc-grain agg
    "quality_model_score",
    # r15: the Spearman agreement — doubled-rank tables live at
    # DISTINCT-VALUE grain (bounded by the milli score range, not the
    # corpus), so the R× work is the two signal scans and the moment
    # agg; vocab grows R× under word salting, surprisal stays
    # vocabulary-sized
    "quality_signal_agreement",
]


def _salted_docs(docs, k: int):
    # replica 0 is the NATURAL corpus (no suffix) so fixed-term
    # retrieval queries (BM25) hit real postings; replicas k ≥ 1 share
    # no vocabulary with it or each other, so near-dup pairs and
    # postings lists never cross a salt boundary
    if k == 0:
        return docs.select("doc_id", "text", "lang", "source", "n_chars")
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


def _replica_emb(emb, k: int):
    # rotate + sign-flip + scale by (k+1): all three preserve
    # within-replica cosine; the magnitude shells keep nearest-centroid
    # assignment replica-local (rotation alone still allowed occasional
    # cross-replica argmin wins, measured as 17x instead of 10x rows)
    rotated = F.expr(
        f"transform(sequence(0, size(embedding) - 1), i -> "
        f"CAST(embedding[int((i + {k}) % size(embedding))] "
        f"* (1 - 2 * ((i * {k}) % 2)) * CAST(POW(2.0, {k}) AS FLOAT) AS FLOAT))"
    )
    return emb.select(
        (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
        rotated.alias("embedding"),
        (F.col("label") + F.lit(k * 1000)).cast("int").alias("label"),
    )


def _replica_cust(cust, k: int):
    # replica tag PREPENDED to the name: the ER block key is
    # substr(name, 1, len-2), so a prefix tag makes every replica's
    # blocks disjoint from every other's (a SUFFIX tag would collapse
    # each name's R copies into one block — R² pairs); within a replica
    # the digit structure (and so every Levenshtein distance) is
    # untouched, so pair/match/cluster counts repeat exactly per replica
    if k == 0:
        return cust.select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
        )
    return cust.select(
        (F.col("c_custkey") + F.lit(k * 10_000_000)).alias("c_custkey"),
        F.concat(F.lit(f"R{k}#"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )


def _replica_events(ev, k: int):
    # user ids offset per replica (replica-local funnels/cohorts/
    # variants: the offset is even, so id-parity variant splits are
    # preserved per replica); event ids offset to stay unique;
    # timestamps UNTOUCHED — the corpus day span, and so every
    # calendar-bounded frame (KM durations, ACF day spine, CUPED
    # midpoint), is identical at any R
    if k == 0:
        return ev.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return ev.select(
        (F.col("event_id") + F.lit(k * 1_000_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.lit(k * 2_000_000_000)).alias("user_id"),
        "event_type", "value", "props",
    )


def build_corpus(spark, out_dir: str, replicas: int) -> None:
    docs = load_table(spark, BASE_DIR, "documents")
    emb = load_table(spark, BASE_DIR, "embeddings")
    cust = load_table(spark, BASE_DIR, "customer")
    ev = load_table(spark, BASE_DIR, "events")
    d = _salted_docs(docs, 0)
    e = _replica_emb(emb, 0)
    c = _replica_cust(cust, 0)
    v = _replica_events(ev, 0)
    for k in range(1, replicas):
        d = d.union(_salted_docs(docs, k))
        e = e.union(_replica_emb(emb, k))
        c = c.union(_replica_cust(cust, k))
        v = v.union(_replica_events(ev, k))
    d.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    e.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    c.repartition(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )
    v.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.EAGER_CACHES = True
    registry.queries()

    one = os.path.join(WORK_DIR, "x1")
    big = os.path.join(WORK_DIR, f"x{replicas}")
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    build_corpus(spark, one, 1)
    build_corpus(spark, big, replicas)

    ops = [n for n in PROBE_OPS if only is None or only in n]
    results = []
    for name in ops:
        fn = registry.REGISTRY[name].fn
        t0 = time.perf_counter()
        n1 = fn(spark, one).count()
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        nr = fn(spark, big).count()
        tr = time.perf_counter() - t0
        row = {
            "op": name,
            "replicas": replicas,
            "rows_1x": n1,
            "rows_Rx": nr,
            "sec_1x": round(t1, 2),
            "sec_Rx": round(tr, 2),
            "time_ratio": round(tr / max(t1, 0.2), 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    worst = max(r["time_ratio"] for r in results)
    print(
        json.dumps(
            {
                "metric": "scale_decade_worst_ratio",
                "value": worst,
                "replicas": replicas,
                "linear_bar": replicas * 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
