"""Corpus-curation composites: the decision layer on top of the dedup /
similarity / sampling primitives.

Where dedup.py finds near-duplicate *pairs* and sampling.py draws
*subsets*, these operators make the calls a production curation pipeline
actually ships: which copy to keep (canonical pick), which vectors to
drop inside a semantic cluster (SemDedup), whether near-dups straddle the
train/eval split (leakage audit), and two corpus-statistics quality
signals (unigram-LM surprisal, corpus-duplicated shingle ratio) that
filters threshold on.

Everything is built from the same bounded constructions as the modules it
composes — LSH band buckets, inverted-index postings joins, centroid
blocks — so none of it does unblocked pairwise work. Cross-engine
determinism follows the house rules: counts stay BIGINT, transcendentals
are quantized to integer milli-units at vocabulary grain (one ln per
distinct word, never per row), and cosine is exact-integer dot/norms
divided with IEEE-exact sqrt, rounded to 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.operators.dedup import (
    _cc_oracle_ctes,
    _SHINGLED_SQL,
    _minhash_oracle_cte,
    _shingled,
    dedup_cluster_components,
    dedup_minhash_lsh,
)
from hyperloglog_pyspark_spark.functions import texttools
from hyperloglog_pyspark_spark.functions.vector import dot_long
from hyperloglog_pyspark_spark.operators.similarity import (
    _centroid_set,
    _km_el_sql,
    _label_centroid_arrays,
    _nearest_centroid,
    as_milli,
)
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

SEMDEDUP_TAU = 0.35  # within-cluster cosine above which the later vector drops


# Unigram-surprisal CTE chain (tok..surp) — shared by the
# text_unigram_logprob oracle and the quality_signal_agreement oracle,
# which consumes the same doc-grain surprisal as its second signal.
_SURP_CTES = """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT SUM(cnt) AS tot FROM vocab),
    surp AS (
        SELECT w, CAST(FLOOR(1000.0 * ln(CAST(tot AS DOUBLE) / cnt) + 0.5) AS BIGINT) AS surp
        FROM vocab CROSS JOIN tot
    )"""


@register(
    "text_unigram_logprob",
    category="text",
    bench=True,
    oracle=f"""
    WITH {_SURP_CTES}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(surp) AS BIGINT) AS surprisal_sum,
           CAST(FLOOR(SUM(surp) * 1.0 / COUNT(*)) AS BIGINT) AS avg_surprisal_milli
    FROM tok JOIN surp USING (w)
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM surprisal — the CCNet-style perplexity
    proxy: score every document by the mean negative log-probability of
    its tokens under the corpus's own unigram distribution. Low surprisal
    = repetitive/templated text, high = rare-token noise; quality filters
    keep the middle band.

    Determinism: the only transcendental (ln) is evaluated once per
    DISTINCT WORD and immediately quantized to integer milli-nats
    (floor(1000·ln(T/cnt)+0.5)) — a cross-engine ulp difference would
    have to land within ~1e-10 of a rounding boundary on a vocabulary-
    sized set to matter. Document scores are then exact BIGINT sums.

    Scale: two shuffles — the vocabulary count and the per-doc rollup.
    The surprisal table is vocabulary-sized (≪ corpus, Zipf-bounded);
    the join onto the token stream carries NO broadcast hint on purpose:
    AQE sees the post-shuffle size and broadcasts while the vocabulary
    fits (it does for any real tokenizer, a few M rows), and genuinely
    degrades to a shuffle join on the word key if it ever outgrew
    executor memory — an explicit F.broadcast hint would instead be
    obeyed unconditionally and OOM. Only the one-row scalar total keeps
    its hint."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    tok = tracked_persist(
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("tot"))
    surp = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.floor(
            F.lit(1000.0) * F.log(F.col("tot").cast("double") / F.col("cnt"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("surp"),
    )
    scored = (
        tok.join(surp, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("surp").alias("surprisal_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "surprisal_sum",
        F.floor(F.col("surprisal_sum") * 1.0 / F.col("n_tokens"))
        .cast("long")
        .alias("avg_surprisal_milli"),
    )


@register(
    "text_dup_shingle_ratio",
    category="text",
    oracle=f"""
    WITH docs AS ({_SHINGLED_SQL}),
    post AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    dfreq AS (SELECT s, COUNT(*) AS df FROM post GROUP BY s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
           CAST(round(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS DOUBLE) AS dup_ratio
    FROM post JOIN dfreq USING (s)
    GROUP BY doc_id
    """,
)
def text_dup_shingle_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus-duplicated shingle ratio (the Gopher
    dup-n-gram signal): the fraction of a document's distinct word
    3-grams that occur in at least one OTHER document. High ratio =
    boilerplate/syndicated content even when no single pair crosses the
    near-dup threshold — the cross-corpus complement to text_repetition
    (within-doc) and text_boilerplate_lines (per-source).

    Scale: one inverted-index shuffle on the shingle key to count
    document frequency, one shuffle back to doc grain — identical plan
    family to corpus_overlap_grams, never pairwise. Shingles are
    per-doc-distinct upstream so df counts documents, not occurrences."""
    post = tracked_persist(
        _shingled(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    )
    dfreq = post.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    dup = (F.col("df") >= 2).cast("long")
    return (
        post.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(dup).alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            F.round(F.col("n_dup_shingles") * 1.0 / F.col("n_shingles"), 6)
            .cast("double")
            .alias("dup_ratio"),
        )
    )


SPAN_W = 20  # tokens per repeated-span window ("long span" at this corpus's 10-100 token docs)
# Window stride. 1 is ALIGNMENT-EXACT: any shared SPAN_W-token run is
# caught wherever it sits in each doc (a stride s > 1 only matches spans
# whose start offsets agree mod s — a silent recall hole). Cost at
# stride 1 is one posting row per token position, the same exchange
# cardinality as the tf/explode passes textops already pays; a 100 TB
# deployment trading recall for volume would raise this knob.
SPAN_S = 1

# Positional span-window posting list (doc_id, window start i, 60-bit
# window key wk) — the single SQL copy shared by the repeated-span
# SIGNAL and TRIM oracles; the Spark twin is _span_postings below.
_SPAN_POST_SQL = f"""
        SELECT doc_id, CAST(i AS BIGINT) AS i,
               CAST('0x' || substring(md5(array_to_string(
                   list_slice(tk, i, i + {SPAN_W - 1}), ' ')), 1, 15) AS BIGINT) AS wk
        FROM (
            SELECT doc_id, tk,
                   unnest(range(1, len(tk) - {SPAN_W} + 2, {SPAN_S})) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
            WHERE len(tk) >= {SPAN_W}
        )
"""


def _span_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, wk) rows: one stride-{SPAN_S} window start per token
    position, keyed by the 60-bit md5 of the {SPAN_W}-token content —
    the Spark twin of _SPAN_POST_SQL, shared by text_repeated_spans and
    text_repeated_spans_trim. The window build is entirely map-side
    (sequence+transform before the explode)."""
    t = texttools.tokens("text")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(SPAN_W - 1), F.lit(SPAN_S)),
        lambda i: F.struct(
            i.cast("long").alias("i"),
            texttools.md5_long(F.concat_ws(" ", F.slice(t, i, SPAN_W))).alias("wk"),
        ),
    )
    return (
        load_table(spark, sf_dir, "documents", spread_scan=True)
        .filter(F.size(t) >= SPAN_W)
        .select("doc_id", F.explode(wins).alias("w"))
        .select("doc_id", "w.i", "w.wk")
    )


@register(
    "text_repeated_spans",
    category="text",
    bench=True,
    oracle=f"""
    WITH w AS ({_SPAN_POST_SQL}),
    dfq AS (SELECT wk, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY wk)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           CAST(round(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                AS DOUBLE) AS dup_span_ratio
    FROM w JOIN dfq USING (wk)
    GROUP BY doc_id
    """,
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated long-span signal (the Lee-et-al substring-dedup cut):
    per document, the fraction of its fixed-stride {SPAN_W}-token
    windows whose exact token content appears in at least one OTHER
    document. This is the curation signal between doc-level near-dup
    (whole documents too similar) and 3-gram boilerplate ratio
    (text_dup_shingle_ratio): a doc can be globally unique yet carry a
    long syndicated span — this flags the span carrier so a filter can
    drop or trim it.

    Semantics that differ from text_dup_shingle_ratio, deliberately:
    windows are POSITIONAL (every token position starts one, not
    per-doc distinct — a doc whose second half repeats a syndicated
    span 3× counts each occurrence's windows), so the stride-1 grid is
    alignment-exact (see SPAN_S), and duplication counts DISTINCT documents
    (COUNT(DISTINCT doc_id) >= 2), so self-repetition alone never marks
    a window — that is text_repetition's job. Docs shorter than
    {SPAN_W} tokens have no windows and are span-clean by construction
    (absent from the output, like every window-less doc in the
    reference pipelines).

    Scale: one map-side window pass (sequence+transform, no explode
    until the posting list), one inverted-index shuffle on the 60-bit
    window key to count distinct docs, one shuffle back to doc grain —
    the text_dup_shingle_ratio plan family, never pairwise. The
    posting list is ~n_tokens/{SPAN_S} rows per doc of (id, 60-bit
    key): at 100 TB the exchange carries fixed-width keys, not text;
    decade leg measured in scale_probe.py."""
    post = tracked_persist(_span_postings(spark, sf_dir).select("doc_id", "wk"))
    # "appears in >= 2 distinct docs" ⟺ min(doc_id) != max(doc_id): two
    # cheap map-side-partial aggregates instead of a COUNT(DISTINCT)
    # expand over the full posting list (r10 trim re-measure)
    dfq = post.groupBy("wk").agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    dup = (F.col("mn") != F.col("mx")).cast("long")
    return (
        post.join(dfq, "wk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(dup).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") * 1.0 / F.col("n_windows"), 6)
            .cast("double")
            .alias("dup_span_ratio"),
        )
    )


@register(
    "text_repeated_spans_trim",
    category="text",
    bench=True,
    oracle=f"""
    WITH w AS ({_SPAN_POST_SQL}),
    stats AS (
        SELECT wk, COUNT(DISTINCT doc_id) AS ndocs, MIN(doc_id) AS keeper
        FROM w GROUP BY wk
    ),
    base AS (
        SELECT doc_id, CAST(MAX(i) + {SPAN_W - 1} AS BIGINT) AS n_tokens
        FROM w GROUP BY doc_id
    ),
    cutw AS (
        SELECT w.doc_id, unnest(range(w.i, w.i + {SPAN_W})) AS pos
        FROM w JOIN stats USING (wk)
        WHERE ndocs >= 2 AND w.doc_id <> keeper
    ),
    cut AS (
        SELECT doc_id, COUNT(DISTINCT pos) AS tokens_cut FROM cutw GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           CAST(COALESCE(c.tokens_cut, 0) AS BIGINT) AS tokens_cut,
           CAST(b.n_tokens - COALESCE(c.tokens_cut, 0) AS BIGINT) AS tokens_kept
    FROM base b LEFT JOIN cut c USING (doc_id)
    """,
)
def text_repeated_spans_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION form of text_repeated_spans — Lee-et-al substring
    deduplication as a token-budget operator: every duplicated
    {SPAN_W}-token window keeps its FIRST occurrence (the lowest-doc_id
    carrier keeps the span; every other carrier cuts it) and each doc
    reports exactly how many token positions the cut removes —
    overlapping marked windows are merged by counting DISTINCT
    positions, so the accounting equals the length of the union of cut
    runs, not a double-counted window sum. tokens_kept is the post-trim
    training budget a mixture planner consumes.

    Keep-first semantics, precisely: the keeper is elected per window
    CONTENT (min doc_id over its carriers); a keeper doc that
    self-repeats the span keeps every occurrence (doc-grain keep — the
    within-doc signal is text_repetition's job), and a non-keeper doc
    cuts all of its occurrences. Docs shorter than {SPAN_W} tokens
    have no windows and no row (span-clean by construction, as in the
    signal form).

    Scale: the posting list is the shared _span_postings pass (one row
    per token position, 60-bit keys); the keeper election is one
    inverted-index aggregation; the position union is an explode
    bounded by {SPAN_W}× the MARKED windows only (duplicated spans,
    not the corpus) followed by a doc-grain distinct count. n_tokens
    is derived from the posting list itself (max start + {SPAN_W} - 1
    — exact at stride 1), so no second documents scan exists."""
    post = tracked_persist(_span_postings(spark, sf_dir))
    # keeper = min carrier; ">= 2 distinct docs" ⟺ max != min — no
    # COUNT(DISTINCT) expand (r10 trim re-measure; same trick as the
    # signal form, oracle text unchanged because the forms are
    # equivalent by definition)
    stats = post.groupBy("wk").agg(
        F.min("doc_id").alias("keeper"), F.max("doc_id").alias("mx")
    )
    base = post.groupBy("doc_id").agg(
        (F.max("i") + F.lit(SPAN_W - 1)).cast("long").alias("n_tokens")
    )
    # tokens_cut = |union of the marked [i, i+W-1] windows| computed as
    # a per-doc interval merge: sorted by start, each window contributes
    # min(W, next_start - start), the last a full W — exact for
    # fixed-width intervals and replaces the former W-fold position
    # explode + COUNT(DISTINCT pos) (20× fewer rows, no expand; the
    # window partitions by doc_id, never corpus-global)
    wd = Window.partitionBy("doc_id").orderBy("i")
    cuts = (
        post.join(stats, "wk")
        .filter((F.col("mx") != F.col("keeper")) & (F.col("doc_id") != F.col("keeper")))
        .select("doc_id", "i")
        .withColumn(
            "cov",
            F.least(F.lit(SPAN_W), F.coalesce(F.lead("i").over(wd) - F.col("i"), F.lit(SPAN_W))),
        )
        .groupBy("doc_id")
        .agg(F.sum("cov").alias("tokens_cut"))
    )
    return base.join(cuts, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("tokens_cut", F.lit(0)).cast("long").alias("tokens_cut"),
        (F.col("n_tokens") - F.coalesce("tokens_cut", F.lit(0)))
        .cast("long")
        .alias("tokens_kept"),
    )


def _semdedup_oracle() -> str:
    return f"""
    WITH el AS ({_km_el_sql()}),
    sizes AS (SELECT label, COUNT(DISTINCT vec_id) AS n FROM el GROUP BY label),
    cent AS (
        SELECT el.label AS k, i, CAST(FLOOR(SUM(e) * 1.0 / MIN(n) + 0.5) AS BIGINT) AS c
        FROM el JOIN sizes ON sizes.label = el.label GROUP BY el.label, i
    ),
    dist AS (
        SELECT el.vec_id, cent.k, SUM((el.e - cent.c) * (el.e - cent.c)) AS d2
        FROM el JOIN cent USING (i) GROUP BY el.vec_id, cent.k
    ),
    assigned AS (
        SELECT vec_id, k FROM (
            SELECT vec_id, k, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, k ASC) AS rn
            FROM dist
        ) WHERE rn = 1
    ),
    ae AS (SELECT a.k, el.vec_id, el.i, el.e FROM assigned a JOIN el ON el.vec_id = a.vec_id),
    n2 AS (SELECT vec_id, SUM(e * e) AS n2 FROM ae GROUP BY vec_id),
    pairs AS (
        SELECT a.k, a.vec_id AS va, b.vec_id AS vb, SUM(a.e * b.e) AS dot
        FROM ae a JOIN ae b ON a.k = b.k AND a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.k, a.vec_id, b.vec_id
    ),
    scored AS (
        SELECT k, va, vb, round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cos
        FROM pairs JOIN n2 na ON na.vec_id = va JOIN n2 nb ON nb.vec_id = vb
    )
    SELECT CAST(k AS INTEGER) AS cluster,
           CAST(vb AS BIGINT) AS pruned_vec,
           CAST(COUNT(*) AS BIGINT) AS n_dup_partners,
           CAST(MAX(cos) AS DOUBLE) AS max_cos
    FROM scored WHERE cos >= {SEMDEDUP_TAU}
    GROUP BY k, vb
    """


@register(
    "semdedup_centroid_prune", category="similarity", bench=True, oracle=_semdedup_oracle()
)
def semdedup_centroid_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (Abbas et al. 2023): assign every embedding to its nearest
    centroid, compare pairs ONLY within a cluster, and drop the
    higher-id member of any pair whose cosine exceeds τ — semantic
    deduplication at a cost bounded by Σ(cluster size²), never corpus².
    Output: one row per pruned vector with its cluster, how many
    smaller-id in-cluster partners crossed τ (pair hits — in a
    similarity chain a partner may itself be pruned), and the strongest
    similarity.

    Clusters here are the label-seeded integer centroids shared with
    embedding_centroid_confusion / embedding_kmeans_lloyd (the Lloyd
    assignment step IS the SemDedup blocking step). Determinism: exact
    BIGINT milli-unit elements, integer dot products and squared norms,
    cosine = dot/(√n2a·√n2b) where sqrt and division are IEEE-exact on
    identical integer inputs, rounded to 4dp before thresholding.

    Scale: vectors stay ARRAY-NATIVE (exact milli-unit array<long>, dots
    via zip_with/aggregate — JVM codegen), so every shuffle carries one
    row per vector, never one per (vector, dim). The centroid table is
    #labels rows of arrays (tiny — broadcast); assignment is a broadcast
    nested-loop over the k candidates + per-vector min(struct). The
    within-cluster pair join keys on cluster so its row volume is
    Σ|cluster|² — a factor dim smaller than the exploded formulation —
    and production SemDedup sizes k ≈ √N exactly so this stays
    linear-ish; the cluster count is the knob, not the code shape.
    Norms ride along inside the pair rows (computed once per vector in
    the persisted frame), so no norm-table join exists at all."""
    # spread_scan: the single-row-group scan plans to ONE task, which
    # would serialize the interpreted nearest-centroid pass; the
    # repartition lives inside the cache build (post-cache plan unchanged)
    emb = load_table(spark, sf_dir, "embeddings", spread_scan=True)
    ev = tracked_persist(
        emb.select("vec_id", "label", as_milli("embedding").alias("mv"))
    )
    # assignment = the kmeans/confusion helpers: one-row broadcast
    # centroid model + per-row array_min argmin (same (d2 ASC, k ASC)
    # tie-break as the previous min(struct) form) — a groupBy(vec_id)
    # over N×k scored rows plus a join-back would add two corpus-scale
    # exchanges to the cache build for the identical result
    best = _nearest_centroid("mv")
    ae = tracked_persist(
        ev.crossJoin(F.broadcast(_centroid_set(_label_centroid_arrays(ev, "k"))))
        .select(
            best["k"].alias("k"),
            "vec_id",
            "mv",
            dot_long(F.col("mv"), F.col("mv")).alias("n2"),
        )
    )
    a = ae.select(
        "k",
        F.col("vec_id").alias("va"),
        F.col("mv").alias("ma"),
        F.col("n2").alias("n2a"),
    )
    b = ae.select(
        F.col("k").alias("kb"),
        F.col("vec_id").alias("vb"),
        F.col("mv").alias("mb"),
        F.col("n2").alias("n2b"),
    )
    cos = F.round(
        dot_long(F.col("ma"), F.col("mb"))
        / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))),
        4,
    )
    return (
        a.join(b, (F.col("k") == F.col("kb")) & (F.col("va") < F.col("vb")))
        .select("k", "vb", cos.alias("cos"))
        .filter(F.col("cos") >= SEMDEDUP_TAU)
        .groupBy(F.col("k").cast("int").alias("cluster"), F.col("vb").alias("pruned_vec"))
        .agg(
            F.count(F.lit(1)).alias("n_dup_partners"),
            F.max("cos").cast("double").alias("max_cos"),
        )
    )


# THE split rule lives in sampling.py (split_train_val_test's rule);
# importing it here is what makes the leakage audit audit the SHIPPED
# split — a local copy could silently drift.
from hyperloglog_pyspark_spark.operators.sampling import (  # noqa: E402
    split_case_sql as _split_case_sql,
    split_expr as _split_expr,
)


@register(
    "split_leakage_audit",
    category="sampling",
    oracle=f"""
    WITH pairs AS ({{minhash}}),
    lab AS (
        SELECT jaccard,
               {_split_case_sql("doc_a")} AS sa,
               {_split_case_sql("doc_b")} AS sb
        FROM pairs
    )
    SELECT least(sa, sb) AS split_lo,
           greatest(sa, sb) AS split_hi,
           least(sa, sb) <> greatest(sa, sb) AS is_leak,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MAX(jaccard) AS DOUBLE) AS max_jaccard
    FROM lab GROUP BY 1, 2, 3
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: count near-duplicate pairs
    (MinHash-LSH, Jaccard ≥ 0.8 — the same pair set as dedup_minhash_lsh)
    whose endpoints land in DIFFERENT splits of the 90/5/5 doc_id-hash
    split (split_train_val_test's rule). A cross-split near-dup means the
    eval set leaks into training — rows with is_leak = true are the
    benchmark-integrity violations, reported per split pair with the
    worst similarity.

    Scale: split assignment is a map-side hash of the doc id — the audit
    costs exactly one LSH pass (already bounded) plus a pair-grain
    aggregation over the tiny pair set; no new shuffle over the corpus."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    sa = _split_expr(F.col("doc_a"))
    sb = _split_expr(F.col("doc_b"))
    lo, hi = F.least(sa, sb), F.greatest(sa, sb)
    return (
        pairs.select(
            lo.alias("split_lo"),
            hi.alias("split_hi"),
            (lo != hi).alias("is_leak"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi", "is_leak")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").cast("double").alias("max_jaccard"),
        )
    )


def _doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens) — whitespace token counts per document, the
    one copy shared by the CC-consuming accounting operators (text
    canonical pick, soft-dedup weights)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )


@register(
    "dedup_canonical_pick",
    category="dedup",
    bench=True,
    oracle="""
    WITH RECURSIVE pairs AS ({minhash}),
    {cc},
    m AS (
        SELECT c.cluster_id, c.doc_id, len(string_split(d.text, ' ')) AS n_tokens
        FROM comp c JOIN documents d USING (doc_id)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY n_tokens DESC, doc_id ASC) AS rn
        FROM m
    ),
    g AS (
        SELECT cluster_id, COUNT(*) AS n_members, SUM(n_tokens) AS total_tokens
        FROM m GROUP BY cluster_id
    )
    SELECT CAST(g.cluster_id AS BIGINT) AS cluster_id,
           CAST(g.n_members AS BIGINT) AS n_members,
           CAST(r.doc_id AS BIGINT) AS canonical_doc,
           CAST(r.n_tokens AS BIGINT) AS kept_tokens,
           CAST(g.total_tokens - r.n_tokens AS BIGINT) AS dropped_tokens
    FROM g JOIN ranked r ON r.cluster_id = g.cluster_id AND r.rn = 1
    """,
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster: for every near-duplicate cluster (connected
    components over the MinHash-LSH pair graph), elect the canonical copy
    — longest document, ties to the smallest doc_id — and account for the
    tokens the dedup decision drops. This is the row a curation pipeline
    actually writes: cluster → survivor + reclaimed budget.

    Scale: components run on the LSH pair graph (≪ corpus); the member
    table joins cluster ids to per-doc token counts on the doc key with
    the tiny component map broadcast. The canonical election is a single
    max-of-struct aggregation per cluster — no window over the corpus,
    no second shuffle."""
    # the cluster map IS dedup_cluster_components' output — calling the
    # raw operator (not the registry wrapper) keeps the edge
    # construction and column contract in exactly one place; the CC memo
    # makes the shared fixpoint free across both consumers
    comp = dedup_cluster_components(spark, sf_dir)
    m = _doc_token_counts(spark, sf_dir).join(F.broadcast(comp), "doc_id")
    best = F.max(F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id")))
    return (
        m.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_tokens").alias("total_tokens"),
            best.alias("c"),
        )
        .select(
            "cluster_id",
            "n_members",
            (-F.col("c.neg_id")).cast("long").alias("canonical_doc"),
            F.col("c.n_tokens").alias("kept_tokens"),
            (F.col("total_tokens") - F.col("c.n_tokens")).alias("dropped_tokens"),
        )
    )


@register(
    "sample_dedup_weighted",
    category="sampling",
    oracle="""
    WITH RECURSIVE pairs AS ({minhash}),
    {cc},
    sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM comp GROUP BY cluster_id),
    d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
    SELECT d.doc_id,
           CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size,
           CAST(ROUND(1.0 / COALESCE(s.csize, 1), 6) AS DOUBLE) AS weight,
           CAST(d.n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(d.n_tokens * 1.0 / COALESCE(s.csize, 1), 6) AS DOUBLE)
               AS effective_tokens
    FROM d
    LEFT JOIN comp c ON c.doc_id = d.doc_id
    LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
    """,
)
def sample_dedup_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication as a per-document training-weight table: every
    member of a near-duplicate cluster (connected components over the
    MinHash-LSH pair graph) carries weight 1/cluster_size, unclustered
    docs weight 1 — so each distinct CONTENT contributes exactly one
    unit of sampling mass regardless of how many copies exist. This is
    the down-weight-don't-drop alternative to dedup_canonical_pick's
    keep-one election (the D4/SlimPajama-style soft dedup): a sampler
    or mixture planner joins this table instead of filtering, keeping
    copy diversity (formatting/boilerplate variants) while unbiasing
    content frequency. effective_tokens = n_tokens/cluster_size is the
    per-doc token mass a budget planner sums (each cluster's members
    together contribute ~its mean length once).

    Weights and effective tokens are independently rounded 6dp ratios
    (the engine's standard ratio discipline) so the row hash-matches
    the oracle exactly.

    Scale: components run on the LSH pair graph (≪ corpus, memoized
    across the four CC consumers); the cluster-size map is node-sized
    and broadcast onto the one documents pass — no corpus shuffle, no
    window. The output is the same cardinality as the corpus: at 100 TB
    it is written as a companion column table (or joined in-flight),
    never collected."""
    comp = dedup_cluster_components(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    cmap = comp.join(sizes, "cluster_id").select("doc_id", "csize")
    docs = _doc_token_counts(spark, sf_dir)
    csize = F.coalesce("csize", F.lit(1))
    return docs.join(F.broadcast(cmap), "doc_id", "left").select(
        "doc_id",
        csize.cast("long").alias("cluster_size"),
        F.round(F.lit(1.0) / csize, 6).cast("double").alias("weight"),
        "n_tokens",
        F.round(F.col("n_tokens") * 1.0 / csize, 6)
        .cast("double")
        .alias("effective_tokens"),
    )


# The LSH-pair consumers share dedup_minhash_lsh's oracle as a CTE.
from hyperloglog_pyspark_spark.registry import REGISTRY  # noqa: E402

REGISTRY["split_leakage_audit"].oracle = REGISTRY["split_leakage_audit"].oracle.format(
    minhash=_minhash_oracle_cte()
)
REGISTRY["dedup_canonical_pick"].oracle = REGISTRY["dedup_canonical_pick"].oracle.format(
    minhash=_minhash_oracle_cte(), cc=_cc_oracle_ctes()
)
REGISTRY["sample_dedup_weighted"].oracle = REGISTRY["sample_dedup_weighted"].oracle.format(
    minhash=_minhash_oracle_cte(), cc=_cc_oracle_ctes()
)


RRF_K = 60  # reciprocal-rank-fusion constant (Cormack et al. 2009)
RRF_TOPK = 10  # fused list depth; both input rankings use the same depth


def _rrf_oracle(dense_query: str = "similarity_topk_bruteforce") -> str:
    # curation loads before textops alphabetically; importing it here
    # registers text_bm25_topk so its oracle is reusable as a CTE.
    from hyperloglog_pyspark_spark.operators import textops as _textops  # noqa: F401
    from hyperloglog_pyspark_spark.registry import REGISTRY as _REG

    bm25 = _REG["text_bm25_topk"].oracle
    # The dense side IS the named similarity query's contract (queries
    # 0..2 ⊂ its query set, RRF_TOPK ≤ its TOP_K) — reuse its oracle so
    # each ranking definition lives in exactly one place.
    dense_sql = _REG[dense_query].oracle
    return f"""
    WITH lex AS (
        SELECT * FROM ({bm25}) WHERE rank <= {RRF_TOPK}
    ),
    dense AS (
        SELECT query_id, vec_id AS doc_id, rank
        FROM ({dense_sql})
        WHERE query_id <= 2 AND rank <= {RRF_TOPK}
    ),
    fused AS (
        SELECT COALESCE(l.query_id, d.query_id) AS query_id,
               COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.rank AS lex_rank, d.rank AS dense_rank,
               round(COALESCE(1.0 / ({RRF_K} + l.rank), 0)
                     + COALESCE(1.0 / ({RRF_K} + d.rank), 0), 6) AS rrf
        FROM lex l FULL OUTER JOIN dense d
            ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rank AS BIGINT) AS fused_rank,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rrf AS DOUBLE) AS rrf_score,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(dense_rank AS BIGINT) AS dense_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    ) WHERE rank <= {RRF_TOPK}
    """


@register("similarity_hybrid_rrf", category="similarity", bench=True, oracle=_rrf_oracle())
def similarity_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion: the BM25 lexical
    top-{RRF_TOPK} (text_bm25_topk's ranking, shared query ids) fused
    with a dense cosine top-{RRF_TOPK} (query vectors = embeddings
    0..2 over the embedding corpus, vec_id as the shared item id) by
    RRF(d) = Σ 1/(k + rank_i(d)), k={RRF_K} — the standard two-tower +
    keyword search stack every RAG retrieval layer runs.

    Determinism: fusion scores are sums of at most two 1/(k+rank) terms
    (rank integers — IEEE-exact), rounded to 6dp before the final
    ranking, ties to the smaller doc id; the dense ranking reuses the
    4dp-rounded cosine contract proven by dedup_embedding_cosine.

    Scale: each ranking arrives top-k per query (bounded); fusion is a
    full-outer join on (query, doc) over ≤ 2·k·|queries| rows — the
    expensive parts are the upstream retrievals, which keep their own
    bounded constructions (query-term-restricted inverted index; ANN
    buckets in production instead of this exact dense scan)."""
    from hyperloglog_pyspark_spark.operators.similarity import (
        similarity_topk_bruteforce,
    )

    # Dense side = the bruteforce baseline's own ranking, restricted to
    # the shared query ids — one copy of the cosine/tie-break contract.
    return _rrf_fuse(spark, sf_dir, similarity_topk_bruteforce(spark, sf_dir))


def _rrf_fuse(spark: SparkSession, sf_dir: str, dense_ranking: DataFrame) -> DataFrame:
    """RRF fusion body shared by the exact and ANN-dense hybrid forms:
    BM25 lexical top-k ⊕ the given (query_id, vec_id, rank) dense
    ranking, both depth-{RRF_TOPK}, fused per (query, doc).

    The fusion is a union + one (query, doc) aggregation rather than a
    full-outer join: each ranking holds a (query, doc) at most once, so
    min-over-union is exactly the join's coalesce semantics for HALF the
    shuffles (a full outer can't broadcast either side, so it costs one
    exchange per input; the union costs one total)."""
    from hyperloglog_pyspark_spark.operators.textops import text_bm25_topk

    nolong = F.lit(None).cast("long")
    # explicit depth clamp on BOTH legs: the lexical side happens to
    # arrive BM25_TOPK-deep (= RRF_TOPK today), but the fusion contract
    # is "both rankings at the same depth k" and must survive a deeper
    # BM25 cut
    lex = (
        text_bm25_topk(spark, sf_dir)
        .filter(F.col("rank") <= RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            F.col("rank").cast("long").alias("lex_rank"),
            nolong.alias("dense_rank"),
        )
    )
    dense = (
        dense_ranking
        .filter((F.col("query_id") <= 2) & (F.col("rank") <= RRF_TOPK))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            nolong.alias("lex_rank"),
            F.col("rank").cast("long").alias("dense_rank"),
        )
    )
    fused = (
        lex.unionByName(dense)
        .groupBy("query_id", "doc_id")
        .agg(
            F.min("lex_rank").alias("lex_rank"),
            F.min("dense_rank").alias("dense_rank"),
        )
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .select(
            "query_id",
            "fused_rank",
            "doc_id",
            F.col("rrf").cast("double").alias("rrf_score"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
        )
    )


@register(
    "similarity_hybrid_rrf_ann",
    category="similarity",
    bench=True,
    oracle=_rrf_oracle("similarity_ann_lsh"),
)
def similarity_hybrid_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with a BUCKETED dense leg: the same RRF fusion as
    similarity_hybrid_rrf, but the dense ranking is similarity_ann_lsh's
    multi-probe LSH top-k instead of the exact corpus scan — the 100 TB
    production form the exact query's docstring promises (the exact twin
    stays registered as the oracle anchor for the fusion contract).

    Scale: the dense leg's candidate generation is an equi-join of
    (query × probes) against the LSH-bucketed corpus — probed buckets
    only, never the full scan — and the fusion still sees a bounded
    top-k per ranking, so the whole plan is bounded work over ONE corpus
    bucketing pass plus the shared BM25 inverted-index pass. Recall
    follows the ANN leg's contract (multi-probe over uniform-random
    embeddings is LSH's worst case; tests assert the recall floor), and
    fused ranks shift only where the ANN leg's candidate set differs
    from exact — the oracle composes the ANN oracle verbatim, so the
    driver checks THIS form's semantics, not exact-leg parity."""
    from hyperloglog_pyspark_spark.operators.similarity import (
        similarity_ann_lsh,
    )

    return _rrf_fuse(spark, sf_dir, similarity_ann_lsh(spark, sf_dir))


@register(
    "text_ngram_novelty",
    category="text",
    bench=True,
    oracle=f"""
    WITH docs AS ({_SHINGLED_SQL}),
    post AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    firsts AS (SELECT s, MIN(doc_id) AS first_doc FROM post GROUP BY s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(round(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS DOUBLE) AS novelty
    FROM post JOIN firsts USING (s)
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-order marginal novelty per document: the fraction of a
    doc's distinct word 3-grams whose FIRST corpus occurrence (min
    doc_id) is this document — the order-dependent complement to
    text_dup_shingle_ratio's symmetric document-frequency view. This is
    the credit-assignment signal a growing-corpus pipeline ranks
    ingests by (how much of this batch is content we did not already
    have) and the curve that flattens as a crawl saturates; under
    keep-first dedup it is exactly the surviving fraction.

    Scale: same plan family as the dup-ratio — one inverted-index
    shuffle on the shingle key (MIN(doc_id) instead of df, equally
    map-side mergeable), one shuffle back to doc grain; never pairwise.
    Round-15: the per-shingle first_doc is a window MIN over the shingle
    partition instead of a groupBy + join-back — the former plan paid the
    aggregate exchange AND a ~25 MB broadcast build of the 800k-row
    firsts table per rep; the window reuses the single shingle exchange
    (3 exchanges + broadcast → 3 exchanges, one of them the tiny
    doc-grain agg; values identical — MIN over the same partition).
    """
    post = tracked_persist(
        _shingled(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("s"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        post.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(F.sum(novel) / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring: the fastText/CCNet-style linear classifier
# over the SAME hashed uni+bigram feature space text_hashed_ngram_features
# audits (textops.FEAT_B buckets, shared 60-bit md5 bucketing). The weight
# vector stands in for a trained model artifact: FEAT_B milli-unit integer
# weights, derived deterministically from the bucket id so Spark and the
# DuckDB oracle share the identical table without a sidecar file. Scores
# are exact BIGINT margins (milli-weights x gram occurrences), mean-pooled
# per document the way fastText mean-pools its input layer.

from hyperloglog_pyspark_spark.operators.textops import FEAT_B  # noqa: E402

QM_W_MOD = 2001  # weights uniform over [-1000, 1000] milli-units
QM_BIAS_MILLI = 25  # affine bias added to the mean-pooled margin
QM_THRESHOLDS = [-60, -30, 0, 30, 60]  # swept decision thresholds (milli)
QM_N_BINS = 4  # curriculum bins over the model score

# Shared CTE chain ending in `scored(doc_id, source, score_milli)` — the
# doc-grain model output both registered consumers (keep/drop sweep,
# curriculum bins) compose, the oracle twin of _qm_doc_scores below.
_QM_SCORED_SQL = f"""toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT doc_id, source, unnest(t) AS gram FROM toks),
    bi AS (
        SELECT doc_id, source, t[i] || ' ' || t[i + 1] AS gram
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    grams AS (
        SELECT doc_id, source, {texttools.md5_long_sql("gram")} % {FEAT_B} AS bucket
        FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
    ),
    w AS (
        SELECT i AS bucket,
               {texttools.md5_long_sql("'qw:' || CAST(i AS VARCHAR)")} % {QM_W_MOD} - 1000 AS w_milli
        FROM range({FEAT_B}) AS r(i)
    ),
    doc AS (
        SELECT doc_id, source,
               COUNT(*) AS n_grams,
               SUM(w_milli) AS margin_milli
        FROM grams JOIN w USING (bucket)
        GROUP BY doc_id, source
    ),
    scored AS (
        SELECT doc_id, source,
               {QM_BIAS_MILLI} + CAST(FLOOR(margin_milli * 1.0 / n_grams) AS BIGINT)
                   AS score_milli
        FROM doc
    )"""


def _qm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, score_milli) — the linear model's mean-pooled
    margin per document, exact integer milli-units. One documents scan:
    uni+bigrams concat-exploded from a single token array, bucketed by
    the shared 60-bit md5 hash, dotted against the broadcast FEAT_B-row
    weight vector, mean-pooled with one floor division. tracked_persist
    so the sweep and curriculum consumers share one computation."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    t = F.split("text", " ")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        "doc_id", "source", F.explode(F.concat(t, bigrams)).alias("gram")
    ).select(
        "doc_id",
        "source",
        (texttools.md5_long(F.col("gram")) % FEAT_B).alias("bucket"),
    )
    weights = spark.range(FEAT_B).select(
        F.col("id").alias("bucket"),
        (
            texttools.md5_long(
                F.concat(F.lit("qw:"), F.col("id").cast("string"))
            )
            % QM_W_MOD
            - 1000
        ).alias("w_milli"),
    )
    doc = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_milli").alias("margin_milli"),
        )
    )
    return tracked_persist(
        doc.select(
            "doc_id",
            "source",
            (
                F.lit(QM_BIAS_MILLI)
                + F.floor(F.col("margin_milli") * 1.0 / F.col("n_grams"))
            )
            .cast("long")
            .alias("score_milli"),
        )
    )


@register(
    "quality_model_score",
    category="text",
    bench=True,
    oracle=f"""
    WITH {_QM_SCORED_SQL},
    thr AS (SELECT unnest({QM_THRESHOLDS}) AS threshold_milli)
    SELECT source,
           CAST(threshold_milli AS BIGINT) AS threshold_milli,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_milli >= threshold_milli THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           ROUND(SUM(CASE WHEN score_milli >= threshold_milli THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS keep_rate
    FROM scored CROSS JOIN thr
    GROUP BY source, threshold_milli
    """,
)
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter — the linear (fastText/CCNet-style)
    quality classifier applied at corpus scale: every document is scored
    by a broadcast weight vector over the hashed uni+bigram feature space
    ({FEAT_B} buckets, the exact featurization text_hashed_ngram_features
    audits), and the output is the table a curation pipeline acts on —
    per-source keep/drop rates under a sweep of {QM_THRESHOLDS} milli-unit
    decision thresholds. Per-source keep curves are how a threshold is
    actually chosen: pick the cut where the low-quality source's keep
    rate collapses while the reference source's survives.

    Determinism: weights are integer milli-units derived from the bucket
    id (md5 % {QM_W_MOD} - 1000 — the deterministic stand-in for a trained
    artifact, constructed identically on both engines); each document's
    margin is an exact BIGINT dot product (weight x occurrence), mean-
    pooled with one floor division — the same single-quantization
    discipline as text_unigram_logprob. No floats until the final
    keep_rate rounding.

    Scale: ONE documents scan (uni+bigrams concat-exploded from the same
    token array — no second scan for bigrams); the {FEAT_B}-row weight
    vector is broadcast (a model artifact is KBs — never shuffle the
    corpus to meet it); the per-doc margin aggregate is map-side
    combinable; the threshold sweep is a conditional-sum pivot at SOURCE
    grain (5 counters per source) followed by a constant-width explode —
    the corpus is never replicated per threshold. Output is bounded by
    #sources x {QM_THRESHOLDS} rows, not data size."""
    scored = _qm_doc_scores(spark, sf_dir)
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum((F.col("score_milli") >= F.lit(T)).cast("long"))
            .cast("long")
            .alias(f"k_{i}")
            for i, T in enumerate(QM_THRESHOLDS)
        ],
    )
    sweep = F.array(
        *[
            F.struct(
                F.lit(T).cast("long").alias("threshold_milli"),
                F.col(f"k_{i}").alias("n_keep"),
            )
            for i, T in enumerate(QM_THRESHOLDS)
        ]
    )
    return (
        per_src.select("source", "n_docs", F.explode(sweep).alias("p"))
        .select(
            "source",
            F.col("p.threshold_milli").alias("threshold_milli"),
            "n_docs",
            F.col("p.n_keep").alias("n_keep"),
            F.round(F.col("p.n_keep") / F.col("n_docs"), 6)
            .cast("double")
            .alias("keep_rate"),
        )
    )


@register(
    "curriculum_model_bins",
    category="trainprep",
    oracle=f"""
    WITH {_QM_SCORED_SQL},
    binned AS (
        SELECT source, score_milli,
               NTILE({QM_N_BINS}) OVER (PARTITION BY source
                   ORDER BY score_milli, doc_id) AS bin
        FROM scored
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(score_milli) AS BIGINT) AS min_score_milli,
           CAST(MAX(score_milli) AS BIGINT) AS max_score_milli,
           ROUND(AVG(score_milli), 6) AS avg_score_milli
    FROM binned GROUP BY source, bin
    """,
)
def curriculum_model_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule driven by the MODEL quality score: NTILE
    {QM_N_BINS} bins per source over quality_model_score's doc-grain
    margin (curriculum_quality_bins' heuristic twin, upgraded to the
    classifier signal) — the integration that makes the model score a
    pipeline input, not just a report: feed bin 1 early epochs, bin
    {QM_N_BINS} late. doc_id tiebreak makes bin assignment total-order
    deterministic cross-engine; bin envelopes are exact BIGINT.

    Scale: the doc-grain score frame is shared (one persisted pass, see
    _qm_doc_scores); the only added work is ONE window partitioned by
    source — bounded partitions, no global sort — and a grouped
    aggregate to #sources x {QM_N_BINS} rows."""
    scored = _qm_doc_scores(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("score_milli", "doc_id")
    return (
        scored.withColumn("bin", F.ntile(QM_N_BINS).over(w))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("score_milli").alias("min_score_milli"),
            F.max("score_milli").alias("max_score_milli"),
            F.round(F.avg("score_milli"), 6).alias("avg_score_milli"),
        )
        .select(
            "source",
            F.col("bin").cast("long").alias("bin"),
            "n_docs",
            "min_score_milli",
            "max_score_milli",
            "avg_score_milli",
        )
    )


def _frac_ranks2(df: DataFrame, val: str, out: str) -> DataFrame:
    """Doubled fractional (average) ranks of ``val`` within each source,
    computed at VALUE grain: per (source, val) tie-group of size c with
    cum docs before it, every member's doubled average rank is
    2*cum + c + 1 (= 2*RANK() + c - 1, exactly the window-RANK identity
    the oracle uses). The running sum and the rank table live at
    distinct-value grain — the corpus never passes through a window."""
    g = df.groupBy("source", val).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return g.select(
        "source",
        val,
        (
            2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
        ).alias(out),
    )


@register(
    "quality_signal_agreement",
    category="text",
    oracle=f"""
    WITH {_QM_SCORED_SQL},
    {_SURP_CTES},
    docsurp AS (
        SELECT doc_id, CAST(FLOOR(SUM(surp) * 1.0 / COUNT(*)) AS BIGINT) AS y
        FROM tok JOIN surp USING (w)
        GROUP BY doc_id
    ),
    j AS (
        SELECT s.source, s.score_milli AS x, d.y
        FROM scored s JOIN docsurp d USING (doc_id)
    ),
    r AS (
        SELECT source,
               2 * RANK() OVER (PARTITION BY source ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY source, x) - 1 AS rx,
               2 * RANK() OVER (PARTITION BY source ORDER BY y)
                   + COUNT(*) OVER (PARTITION BY source, y) - 1 AS ry
        FROM j
    ),
    m AS (
        SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(CAST(rx AS HUGEINT)) AS sx,
               SUM(CAST(ry AS HUGEINT)) AS sy,
               SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
               SUM(CAST(ry AS HUGEINT) * ry) AS syy,
               SUM(CAST(rx AS HUGEINT) * ry) AS sxy
        FROM r GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS spearman_rho
    FROM m
    """,
)
def quality_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Spearman rank correlation between the two independent
    quality signals the pipeline computes — the model score
    (quality_model_score's mean-pooled linear margin) and the unigram-LM
    surprisal (text_unigram_logprob) — the signal-QA table that says
    whether the cheap heuristic and the classifier would keep the same
    documents: rho near +-1 means one signal is redundant, rho near 0
    means the filters disagree and the intersection/union choice
    actually matters per source.

    Determinism: Spearman is Pearson on fractional (average) ranks;
    DOUBLED ranks (2*cum_before + ties + 1) stay integer, so all five
    moments are exact integer sums (decimal(38,0) on Spark, HUGEINT in
    the oracle — the widen-before-multiply discipline); the only floats
    are one sqrt of a product of exact-integer-valued doubles and one
    division, both IEEE-identical cross-engine, rounded to 6dp.
    Degenerate sources (a constant signal) yield NULL on both engines.

    Scale: ranks are computed at VALUE grain — per (source, value) tie
    counts plus a running sum over the distinct-value frame (bounded by
    the milli-unit score range, thousands of rows, NOT corpus rows) —
    then joined back to the doc-grain pairing; the only corpus-scale
    work is two small-table joins and one five-moment aggregate. A
    doc-grain RANK() window (the oracle's formulation) would instead
    sort every source's documents in one task — the value-grain
    construction is the same identity without the sort."""
    scored = _qm_doc_scores(spark, sf_dir)
    surp = text_unigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("avg_surprisal_milli").alias("y")
    )
    j = tracked_persist(
        scored.select("doc_id", "source", F.col("score_milli").alias("x"))
        .join(surp, "doc_id")
    )
    rx = _frac_ranks2(j, "x", "rx")
    ry = _frac_ranks2(j, "y", "ry")
    ranked = j.join(rx, ["source", "x"]).join(ry, ["source", "y"])
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("rx")).alias("sx"),
        F.sum(dec("ry")).alias("sy"),
        F.sum(dec("rx") * F.col("rx")).alias("sxx"),
        F.sum(dec("ry") * F.col("ry")).alias("syy"),
        F.sum(dec("rx") * F.col("ry")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            )
        )
        .alias("spearman_rho"),
    )
