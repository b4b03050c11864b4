"""Text analysis operators: token statistics, quality scoring, language-ID
heuristic, document fingerprinting (BASELINE.json north-star set).

All built-in column expressions (split / higher-order list functions /
regexp / md5) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.texttools import (
    NORMALIZED_SQL,
    STOPWORDS,
    adjacent_pairs,
    md5_long,
    md5_long_sql,
    normalized_text,
    run_boundaries,
    shingles_sql,
    word_shingles,
)
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import literal_frame, load_table

_STOP_SQL = "(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "text_stats",
    category="text",
    bench=True,
    oracle=f"""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS punct_chars,
           CAST(round(CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS DOUBLE) AS stop_ratio,
           CAST(round(0.5 * (CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL})) AS DOUBLE)
                             / len(string_split(text, ' ')))
                 + 0.5 * (least(len(string_split(text, ' ')), 100) / 100.0), 6) AS DOUBLE) AS quality
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts, punctuation density, stopword ratio and
    a deterministic [0,1] quality score (stopword-ratio + length terms) —
    the filter signal a pretraining pipeline thresholds on."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    quality = 0.5 * stop_ratio + 0.5 * (F.least(n_tokens, F.lit(100)) / 100.0)
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).alias("punct_chars"),
        F.round(stop_ratio, 6).cast("double").alias("stop_ratio"),
        F.round(quality, 6).cast("double").alias("quality"),
    )


_MARKERS = {"en": ["the", "a", "of"], "de": ["der", "die", "und"], "fr": ["le", "la", "et"]}


def _marker_count_sql(lang: str) -> str:
    lst = "(" + ",".join(f"'{w}'" for w in _MARKERS[lang]) + ")"
    return f"len(list_filter(string_split(text, ' '), t -> t IN {lst}))"


# The ONE classifier definition (marker argmax, deterministic tie-break
# en > de > fr) — text_langid and text_lang_confusion must agree on it.
_PRED_SQL = f"""CASE WHEN {_marker_count_sql("en")} >= {_marker_count_sql("de")}
                 AND {_marker_count_sql("en")} >= {_marker_count_sql("fr")} THEN 'en'
                WHEN {_marker_count_sql("de")} >= {_marker_count_sql("fr")} THEN 'de'
                ELSE 'fr' END"""


def _pred_lang() -> F.Column:
    """Spark column form of the same classifier."""
    toks = F.split("text", " ")

    def marker_count(ws):
        # NB: single-arg lambda — F.filter treats a two-arg lambda as
        # (element, index), so capturing via default arg breaks.
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    counts = {lang: marker_count(ws) for lang, ws in _MARKERS.items()}
    return (
        F.when((counts["en"] >= counts["de"]) & (counts["en"] >= counts["fr"]), "en")
        .when(counts["de"] >= counts["fr"], "de")
        .otherwise("fr")
    )


@register(
    "text_langid",
    category="text",
    oracle=f"""
    SELECT doc_id, lang,
           {_PRED_SQL} AS pred_lang,
           ({_PRED_SQL}) = lang AS correct
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (argmax of stopword-list hits,
    deterministic tie-break en > de > fr).

    The synthetic corpus shares one vocabulary across langs, so accuracy
    is meaningless here — the operator demonstrates the deterministic
    classifier plumbing (n-gram/marker scoring, argmax with stable ties)
    that a real lang-ID pass uses.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    pred = _pred_lang()
    return docs.select("doc_id", "lang", pred.alias("pred_lang"), (pred == F.col("lang")).alias("correct"))


@register(
    "text_fingerprint",
    category="text",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5({NORMALIZED_SQL})) AS n_fingerprints
    FROM documents
    GROUP BY source
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprints (lowercase, punctuation
    stripped, whitespace collapsed → md5), counted per source — the
    near-exact dedup key that survives formatting noise."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5(normalized_text("text"))).alias("n_fingerprints"),
    )


@register(
    "text_token_freq",
    category="text",
    oracle="""
    SELECT token, n FROM (
        SELECT token, COUNT(*) AS n,
               row_number() OVER (ORDER BY COUNT(*) DESC, token) AS rn
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ) WHERE rn <= 20
    """,
)
def text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-20 (explode → count → ranked with a
    lexicographic tiebreak so the cut is deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
        .select("token", "n")
    )


# GPT-2-style coarse pretokenizer classes, restricted to constructs RE2
# (DuckDB) and Java regex (Spark) interpret identically.
BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "text_token_bpe",
    category="text",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{BPE_PAT}'))) AS BIGINT) AS n_bpe_distinct
    FROM documents
    """,
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways per document: whitespace split vs a BPE-ish
    regex pretokenizer (letter runs / digit runs / single punctuation —
    the coarse classes a byte-pair tokenizer merges within). The ratio of
    the two is the classic tokens-per-word cost estimate for LLM training
    budgets; all counting stays in JVM regexp, no UDF."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    bpe = F.regexp_extract_all("text", F.lit(BPE_PAT), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).cast("long").alias("n_bpe_distinct"),
    )


DECON_N = 5
BENCH_SOURCE = "src0"


@register(
    "text_decontaminate",
    category="text",
    bench=True,
    oracle=f"""
    WITH bench AS (
        SELECT DISTINCT unnest({shingles_sql(DECON_N)}) AS gram
        FROM documents
        WHERE source = '{BENCH_SOURCE}' AND len(string_split(text, ' ')) >= {DECON_N}
    ),
    corpus AS (
        SELECT doc_id, unnest({shingles_sql(DECON_N)}) AS gram,
               len({shingles_sql(DECON_N)}) AS n_grams
        FROM documents
        WHERE source <> '{BENCH_SOURCE}' AND len(string_split(text, ' ')) >= {DECON_N}
    )
    SELECT c.doc_id,
           COUNT(*) AS n_contaminated_grams,
           CAST(round(COUNT(*) * 1.0 / ANY_VALUE(c.n_grams), 6) AS DOUBLE) AS contamination
    FROM corpus c JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    5-gram with the held-out benchmark set (source=src0) and score the
    overlap fraction — the standard n-gram contamination check run before
    training.

    Scale: the benchmark gram set is small (it's the eval suite) →
    broadcast hash join against the exploded corpus grams; the corpus side
    is ONE pass — the shingles are already distinct per doc, so a LEFT
    broadcast join + one groupBy yields both the per-doc gram total and
    the hit count without carrying anything through the Generate. (An
    earlier staged-n_grams form was collapsed by CollapseProject into a
    per-exploded-row re-evaluation of the whole shingle expression —
    O(len²) per doc; counting after the explode sidesteps the trap.)
    At 100 TB the gram explosion streams through the scan; only
    (doc_id, hit) pairs reach the single doc_id shuffle.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    eligible = docs.filter(F.size(F.split("text", " ")) >= DECON_N)
    grams = word_shingles("text", DECON_N)
    bench = (
        eligible.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = (
        eligible.filter(F.col("source") != BENCH_SOURCE)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    return (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_contaminated_grams"),
        )
        .filter(F.col("n_contaminated_grams") > 0)
        .select(
            "doc_id",
            "n_contaminated_grams",
            F.round(F.col("n_contaminated_grams") / F.col("n_grams"), 6)
            .cast("double")
            .alias("contamination"),
        )
    )


Z_CUT = 1.5


@register(
    "text_outlier_zscore",
    category="text",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
               AVG(len(string_split(text, ' '))) OVER (PARTITION BY lang) AS mu,
               stddev_samp(len(string_split(text, ' '))) OVER (PARTITION BY lang) AS sigma
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(round((n_tokens - mu) / sigma, 4) AS DOUBLE) AS z
    FROM stats
    WHERE sigma > 0 AND abs(round((n_tokens - mu) / sigma, 4)) > {Z_CUT}
    """,
)
def text_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier documents per language: |z-score| > Z_CUT against
    the per-language token-count distribution — the cheap statistical
    filter that catches truncated/concatenated documents before training.

    Determinism/robustness: the filter tests the 4dp-ROUNDED z (the
    registry's round-before-compare discipline — a borderline doc whose
    unrounded z differs from the oracle's by ulps of stddev accumulation
    order must not flip the row set), and sigma > 0 guards both the
    degenerate constant-length language (under ANSI the division would
    CRASH Spark while DuckDB emits inf/NaN rows — neither is an outlier
    verdict) and single-doc languages (sigma NULL, dropped on both
    engines).

    Scale: one window over lang (a handful of partitions — salt if a
    language dominates); no second scan, the stats ride the same pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    w = Window.partitionBy("lang")
    stats = docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.avg(n).over(w).alias("mu"),
        F.stddev_samp(n).over(w).alias("sigma"),
    )
    # the division lives INSIDE the when branch: a bare filter
    # conjunction could be reordered by the optimizer, re-exposing the
    # ANSI divide-by-zero; CaseWhen never evaluates the branch unless
    # the condition holds
    z = F.when(
        F.col("sigma") > 0,
        F.round((F.col("n_tokens") - F.col("mu")) / F.col("sigma"), 4),
    )
    return (
        stats.filter(F.abs(z) > Z_CUT)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            z.cast("double").alias("z"),
        )
    )


@register(
    "corpus_dashboard",
    category="text",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(round(AVG(len(string_split(text, ' '))), 4) AS DOUBLE) AS avg_tokens,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS BIGINT)
               AS n_unique_fingerprints
    FROM documents
    GROUP BY source
    """,
)
def corpus_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard: volume, token budget, language
    mix, and unique-fingerprint count (n_docs − n_unique_fingerprints =
    exact-dup rate) — the one-pass summary a data-curation run logs per
    ingestion source."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    n_tok = F.size(F.split("text", " "))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
        F.round(F.avg(n_tok), 4).cast("double").alias("avg_tokens"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("n_en"),
        F.count_distinct(F.md5(normalized_text("text"))).alias("n_unique_fingerprints"),
    )


@register(
    "text_repetition",
    category="text",
    bench=True,
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(words) AS word FROM w
    ),
    top_word AS (
        SELECT doc_id, MAX(c) AS max_word_cnt, CAST(SUM(c) AS BIGINT) AS n_words
        FROM (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word)
        GROUP BY doc_id
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                                     i -> words[i] || ' ' || words[i + 1])) AS bg
        FROM w WHERE len(words) > 1
    ),
    bstats AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
        FROM big GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_words,
           CAST(round(CAST(t.max_word_cnt AS DOUBLE) / t.n_words, 6) AS DOUBLE) AS top_word_frac,
           CAST(round(1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6) AS DOUBLE) AS dup_bigram_frac,
           (CAST(t.max_word_cnt AS DOUBLE) / t.n_words > 0.10
            OR 1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams > 0.50) AS flagged
    FROM top_word t JOIN bstats b USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction of
    tokens taken by the single most frequent word, and the duplicate-bigram
    fraction (1 − distinct/total). Docs exceeding either threshold are
    flagged — the standard pretraining filter for degenerate/repetitive
    text (cf. Rae et al. 2021 "Gopher" §A.1.1, public).

    Scale: ENTIRELY map-side — both signals are per-document and a
    document's tokens are co-located in its row, so no explode, no
    groupBy, no join: the top-word count is the longest run of the
    sorted token array (the _tf_table boundary trick), the bigram
    distinct count is size(array_distinct(...)) of the zipped adjacent
    pairs. One scan, zero exchanges; the explode+groupBy form shuffled
    one row per token occurrence and joined the two profiles back. All
    codegen expressions, no UDFs.
    """
    docs = (
        load_table(spark, sf_dir, "documents", spread_scan=True)
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") > 1)  # the oracle's bigram join drops 1-token docs
        .withColumn("s", F.array_sort("words"))
        .withColumn("b", run_boundaries("s"))
        .select(
            "doc_id",
            F.size("words").cast("long").alias("n_words"),
            F.expr(
                "array_max(transform(sequence(0, size(b) - 2), k -> b[k + 1] - b[k]))"
            ).alias("max_word_cnt"),
            (F.size("words") - 1).cast("long").alias("n_bigrams"),
            F.size(
                F.array_distinct(adjacent_pairs("words", "concat(x, ' ', y)"))
            ).cast("long").alias("n_distinct_bigrams"),
        )
    )
    top_frac = F.col("max_word_cnt").cast("double") / F.col("n_words")
    dup_frac = F.lit(1.0) - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams")
    return docs.select(
        "doc_id",
        "n_words",
        F.round(top_frac, 6).cast("double").alias("top_word_frac"),
        F.round(dup_frac, 6).cast("double").alias("dup_bigram_frac"),
        ((top_frac > 0.10) | (dup_frac > 0.50)).alias("flagged"),
    )


@register(
    "text_pii_redact",
    category="text",
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                    || ' ref ' || CAST(doc_id * 7919 AS VARCHAR) AS text
        FROM documents
    ),
    redacted AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                   '\\b555-[0-9]{4}\\b', '<PHONE>', 'g') AS clean
        FROM enriched
    )
    SELECT doc_id,
           length(clean) AS clean_len,
           CAST(len(regexp_extract_all(clean, '<EMAIL>')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(clean, '<PHONE>')) AS BIGINT) AS n_phones,
           NOT regexp_matches(clean, '@') AS email_free
    FROM redacted
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails and phone numbers with
    per-document audit counts — a standard pre-training compliance pass.
    The corpus is synthetic word-soup, so deterministic PII is injected
    from doc_id first (same expression on both engines), then redacted;
    the audit asserts zero surviving '@'.

    Scale: pure regexp_replace/regexp_count projections — codegen'd,
    no shuffle, no UDF; regex patterns are RE2/Java-compatible subset so
    the pass is portable. At 100 TB this is a map-only stage that
    pipelines with any downstream filter.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            F.lit(" ref "), (F.col("doc_id") * 7919).cast("string"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", r"[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>"),
        r"\b555-[0-9]{4}\b",
        "<PHONE>",
    )
    return enriched.select(
        "doc_id",
        F.length(clean).alias("clean_len"),
        F.size(F.regexp_extract_all(clean, F.lit("<EMAIL>"), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(clean, F.lit("<PHONE>"), F.lit(0))).cast("bigint").alias("n_phones"),
        (~clean.rlike("@")).alias("email_free"),
    )


# --- BM25 retrieval -------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# (query_id, term) pairs — terms drawn from the corpus vocabulary.
def _tf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, token, tf) term-frequency table — the one
    corpus tokenization pass shared by BM25 scoring and the MRR report
    (tracked_persist's plan-canonical lookup reuses the cache when both
    run in one job).

    Computed ENTIRELY map-side: a document's tokens are co-located in
    its own row, so per-(doc, token) counts never need a shuffle —
    sort the token array, take run boundaries, emit (token, run length)
    structs, explode. The explode+groupBy form shuffles one row per
    token occurrence (corpus-token-scale — the single largest exchange
    in the BM25/MRR/NDCG family at 100 TB); this form's only exchange
    is whatever the consumer adds. The run-boundary arithmetic lives in
    texttools.run_boundaries (shared with text_repetition) — see its
    docstring for the i = 0 short-circuit caution.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    sorted_toks = docs.select(
        "doc_id", F.array_sort(F.split("text", " ")).alias("s")
    )
    bounded = sorted_toks.select(
        "doc_id", "s", run_boundaries("s").alias("b")
    )
    return tracked_persist(
        bounded.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(b) - 2),"
                    "          k -> struct(s[b[k]] AS token, b[k + 1] - b[k] AS tf))"
                )
            ).alias("e"),
        ).select("doc_id", "e.token", F.col("e.tf").cast("long").alias("tf"))
    )


def _doc_len_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, dl) document lengths for BM25, computed
    MAP-SIDE from a thin documents scan: dl = size(split(text)) — the
    same value as SUM(tf) over the doc's term-frequency rows (run
    lengths partition the token array), without re-reading the
    corpus-token-scale tf table and shuffling it down to doc grain.
    Persisted because the BM25 plan references it twice (the N/avgdl
    scalar and the per-doc norm join) — doc-grain, two longs per row.
    NULL-text docs are excluded to keep n_docs/avgdl aligned with the
    oracle's tf-derived dl CTE (unnest(NULL) yields zero rows there;
    keeping them here would count them into n_docs but not avgdl and
    shift every idf)."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    return tracked_persist(
        docs.filter(F.col("text").isNotNull()).select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
        )
    )


BM25_QUERIES = [
    (0, "hash"), (0, "join"), (0, "merge"),
    (1, "scan"), (1, "filter"), (1, "column"),
    (2, "stream"), (2, "window"), (2, "batch"),
]

_BM25_Q_VALUES = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERIES)


def _tfq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (term, doc_id, tf): the tf table restricted to the
    distinct BM25 query terms — docs-containing-query-terms scale, the
    ONE corpus-token-scale pass the whole retrieval-eval family (BM25 /
    MRR / NDCG / hybrid-RRF) pays. Each consumer joins the broadcast
    (query_id, term) map back on; before this was factored out, every
    report re-read the full tf cache for the same restriction."""
    terms = literal_frame(
        spark, [(t,) for t in sorted({t for _, t in BM25_QUERIES})], "term string"
    )
    tf = _tf_table(spark, sf_dir)
    return tracked_persist(
        tf.join(F.broadcast(terms), tf["token"] == terms["term"]).select(
            "term", "doc_id", "tf"
        )
    )


@register(
    "text_bm25_topk",
    category="text",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tfq AS (
        SELECT q.query_id, q.term, tf.doc_id, tf.tf
        FROM q JOIN tf ON tf.token = q.term
    ),
    dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tfq GROUP BY term),
    scored AS (
        SELECT tfq.query_id, tfq.doc_id,
               SUM(
                   ln((stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                   * tfq.tf * {BM25_K1 + 1}
                   / (tfq.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM tfq
        JOIN dfq ON dfq.term = tfq.term
        JOIN dl ON dl.doc_id = tfq.doc_id
        CROSS JOIN stats
        GROUP BY tfq.query_id, tfq.doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY round(score, 4) DESC, doc_id) AS rank
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
           doc_id, CAST(round(score, 4) AS DOUBLE) AS score
    FROM ranked WHERE rank <= {BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (k1={BM25_K1}, b={BM25_B}, Lucene idf form
    ln(1+(N−df+0.5)/(df+0.5))) for a fixed query set over the documents
    corpus — the lexical-retrieval half of every RAG / data-curation
    search stack, built purely from JVM relational ops.

    Construction order is the scale story: term frequencies reduce once
    per (doc, token); the QUERY-TERM semi-restriction happens before any
    doc-level join, so everything downstream of the broadcast query join
    is bounded by docs-containing-query-terms, not corpus size. Document
    lengths come MAP-SIDE from a thin documents scan (dl = token count —
    no tf-scale re-read or reduction; see ``_doc_len_table``); N/avgdl
    ride a broadcast scalar; df per query term comes from the restricted
    table. Ties and float-sum order are pinned
    cross-engine by ranking on (round(score,4), doc_id). The final
    per-query top-k is a window over query-id partitions — at production
    scale swap in a two-phase TakeOrdered (per-partition local top-k,
    then merge) if the candidate sets stop fitting a partition.
    """
    dl = _doc_len_table(spark, sf_dir)
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qterms = literal_frame(spark, BM25_QUERIES, "query_id long, term string")
    tfq = _tfq_table(spark, sf_dir).join(F.broadcast(qterms), "term").select(
        "query_id", "term", "doc_id", "tf"
    )
    # df per term: _tfq_table is UNIQUE per (term, doc_id) by
    # construction (tf-table grain), so the distinct count is a plain
    # row count taken BEFORE the query join duplicates rows per
    # query_id — one HashAggregate exchange instead of the two-level
    # Expand-distinct over the duplicated frame (guide §2.3: aggregate
    # before you shuffle). Same value as the oracle's
    # COUNT(DISTINCT doc_id) over the query-joined CTE.
    dfq = (
        _tfq_table(spark, sf_dir)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    # Round-16 (guide §2.4 "two operations keyed the same way share one
    # exchange"): the score aggregation and the rank window used to pay
    # one exchange EACH — hash(query_id, doc_id) for the groupBy, then
    # hash(query_id) for the window. Repartitioning by query_id first
    # satisfies both (hash(query_id) clusters (query_id, doc_id) groups
    # too), so ONE exchange serves agg + window — in this query and in
    # every composer (hybrid RRF pair, MRR/NDCG reports). Shuffled rows
    # are the pre-agg tfq join (bounded at ≤|query terms| per (q, d)
    # pair = 3 here) instead of the post-agg pairs — worst-case FEWER
    # bytes than the old two-exchange sum (|tfq| vs |tfq|+|pairs|); the
    # per-query concentration is the same one the rank window always
    # had. Values unchanged: same per-group float sums, rounded to 4dp
    # before ranking as before.
    scored = (
        tfq.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / norm).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 4).desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "rank", "doc_id", F.round("score", 4).alias("score"))
    )


PMI_MIN_SUPPORT = 5


@register(
    "text_pmi_collocations",
    category="text",
    bench=True,
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    uni AS (SELECT unnest(toks) AS w FROM t),
    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT COUNT(*) AS n_uni FROM uni),
    bi AS (
        SELECT toks[pos + 1] AS w1, toks[pos + 2] AS w2
        FROM (SELECT toks, unnest(range(0, greatest(len(toks) - 1, 0))) AS pos FROM t)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bi GROUP BY w1, w2),
    nb AS (SELECT COUNT(*) AS n_bi FROM bi)
    SELECT w1, w2,
           CAST(c_ab AS BIGINT) AS c_ab,
           CAST(u1.c AS BIGINT) AS c_a,
           CAST(u2.c AS BIGINT) AS c_b,
           ROUND(LN((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
                    / (CAST(n_bi AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM bc
    JOIN uc u1 ON u1.w = w1
    JOIN uc u2 ON u2.w = w2
    CROSS JOIN nu CROSS JOIN nb
    WHERE c_ab >= {PMI_MIN_SUPPORT}
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: the top-20
    adjacent word pairs whose co-occurrence most exceeds chance
    (PMI = ln(p(ab) / (p(a)·p(b)))), with a minimum-support cut so rare
    accidental pairs don't dominate — the classic phrase-discovery signal
    feeding tokenizer vocab curation and stopword-phrase lists.

    Scale: unigram and bigram counts are two explode+groupBy passes over
    the corpus (all JVM split/slice/zip_with — no Python), persisted at
    their VOCABULARY size; the scalar corpus totals are then SUMS OF THE
    COUNT TABLES (Σc over unigrams, Σc_ab over uncut pairs), never a
    re-scan of the corpus — the naive form re-embeds the document scan
    in every total and join leg (5 corpus scans in the executed plan vs
    2 here). The unigram table can be 100M+ rows over web text, so its
    join onto the min-support-cut pair table is left to AQE — broadcast
    at small vocab, shuffle on the token key at web vocab; the support
    cut runs before the join either way. The PMI expression is evaluated
    in the same IEEE double operation order on both engines and rounded
    once, so the ranked cut hash-matches."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    toks = docs.select(F.split("text", " ").alias("toks"))
    uni = toks.select(F.explode("toks").alias("w"))
    uc = tracked_persist(uni.groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    nu = uc.agg(F.sum("c").alias("n_uni"))
    bi = toks.select(
        F.explode(
            adjacent_pairs("toks", "named_struct('w1', x, 'w2', y)")
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = tracked_persist(bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab")))
    nb = bc.agg(F.sum("c_ab").alias("n_bi"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        bc.filter(F.col("c_ab") >= PMI_MIN_SUPPORT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.expr(
                "round(ln((cast(c_ab as double) * n_uni * n_uni)"
                "        / (cast(n_bi as double) * c_a * c_b)), 6)"
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "text_lang_confusion",
    category="text",
    oracle=f"""
    WITH pred AS (
        SELECT lang, {_PRED_SQL} AS pred_lang
        FROM documents
    )
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY lang), 6)
               AS row_share
    FROM pred
    GROUP BY lang, pred_lang
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: declared corpus language vs the
    marker-word classifier's prediction, with per-true-language row
    shares — the QA report that catches mislabeled corpora and classifier
    drift before a language-filtered training mix is built on bad labels.

    Scale: one fact pass scores each document (JVM token filters), then a
    |langs|² aggregate; the normalizing window runs on the matrix, not
    the corpus (same shape as event_transition_matrix)."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    cells = docs.select("lang", _pred_lang().alias("pred_lang")).groupBy(
        "lang", "pred_lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    wl = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wl), 6).alias("row_share"),
    )


TFIDF_TOPK = 3


@register(
    "text_tfidf_topk",
    category="text",
    bench=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               ROUND(tf.tf * LN(((SELECT n FROM n) + 1.0) / (dfreq.df + 1.0)), 6) AS score
        FROM tf JOIN dfreq USING (term)
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           CAST(tf AS BIGINT) AS tf, score
    FROM (
        SELECT doc_id, term, tf, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term ASC) AS rnk
        FROM scored
    )
    WHERE rnk <= {TFIDF_TOPK}
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k TF-IDF terms per document (tf × ln((N+1)/(df+1)), rounded,
    ties broken lexicographically): the keyword-extraction summary used
    for topic tagging and as the sparse-retrieval feature beside BM25
    (``text_bm25_topk`` is the query-time half; this is the corpus-side
    term importance table).

    Plan: one explode + (doc, term) count, a term-keyed join against the
    document-frequency table (vocabulary-sized — AQE picks the join
    strategy; at 100 TB this is the classic vocab broadcast-or-shuffle
    decision), a single-row N broadcast, and a per-document top-k window
    (partitioned — never a global sort). Scores are rounded BEFORE
    ranking so the ordering is identical in both engines.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tracked_persist(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.count_distinct("doc_id").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select(
            "doc_id",
            F.col("rnk").cast("long").alias("rnk"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
        )
    )


LINE_WORDS = 8  # words per pseudo-line (the repeated-chunk unit)
BOILER_MIN_DOCS = 3  # a line in >= this many distinct docs is boilerplate


@register(
    "text_boilerplate_lines",
    category="text",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) // {LINE_WORDS} AS n_lines
        FROM documents
    ),
    lines AS (
        SELECT doc_id, source,
               md5(array_to_string(list_slice(tk, k * {LINE_WORDS} + 1,
                                              k * {LINE_WORDS} + {LINE_WORDS}), ' ')) AS lh
        FROM (SELECT doc_id, source, tk, unnest(range(0, n_lines)) AS k
              FROM toks WHERE n_lines > 0)
    ),
    freq AS (
        SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM lines GROUP BY lh
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN f.n_docs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler_lines,
           ROUND(SUM(CASE WHEN f.n_docs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS boiler_fraction
    FROM lines JOIN freq f USING (lh)
    GROUP BY source
    """,
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-repeated-line detection (the CCNet/RefinedWeb boilerplate
    stage): documents are cut into fixed 8-word pseudo-lines, each line
    hashed, and a line occurring in ≥ 3 DISTINCT documents is
    boilerplate; the report is each source's boilerplate fraction — the
    signal that one feed is shipping navigation chrome / license headers
    / templated text that per-document dedup never sees.

    Scale: explode → line-hash groupBy (the inverted index — one shuffle
    keyed on the hash, high cardinality, low skew) → hash-keyed join back
    to occurrences → source-sized report. This is line-level dedup's
    counting pass; the removal pass is the same join with a filter. All
    JVM split/slice/md5 — no Python.
    """
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    toks = F.split("text", " ")
    lines = (
        docs.select(
            "doc_id",
            "source",
            toks.alias("tk"),
            (F.size(toks) / LINE_WORDS).cast("long").alias("n_lines"),
        )
        .filter(F.col("n_lines") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), (F.col("n_lines") - 1).cast("int"))).alias("k"),
            F.col("tk"),
        )
        .select(
            "doc_id",
            "source",
            F.md5(
                F.concat_ws(
                    " ", F.slice("tk", F.col("k") * LINE_WORDS + 1, LINE_WORDS)
                )
            ).alias("lh"),
        )
    )
    lines = tracked_persist(lines)
    freq = lines.groupBy("lh").agg(F.count_distinct("doc_id").alias("n_docs"))
    boiler = F.when(F.col("n_docs") >= BOILER_MIN_DOCS, 1).otherwise(0)
    return (
        lines.join(freq, "lh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(boiler).alias("n_boiler_lines"),
            F.round(F.sum(boiler) / F.count(F.lit(1)), 6).alias("boiler_fraction"),
        )
    )


def _mrr_oracle() -> str:
    from hyperloglog_pyspark_spark.registry import REGISTRY

    bm25 = REGISTRY["text_bm25_topk"].oracle
    return f"""
    WITH lex AS ({bm25}),
    q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
    qn AS (SELECT query_id, COUNT(*) AS n_terms FROM q GROUP BY query_id),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY doc_id, token
    ),
    rel AS (
        SELECT q.query_id, tf.doc_id
        FROM q JOIN tf ON tf.token = q.term
        JOIN qn ON qn.query_id = q.query_id
        GROUP BY q.query_id, tf.doc_id, qn.n_terms
        HAVING COUNT(DISTINCT q.term) = qn.n_terms
    ),
    totals AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_total FROM rel GROUP BY query_id),
    hits AS (
        SELECT lex.query_id,
               MIN(CASE WHEN rel.doc_id IS NOT NULL THEN lex.rank END) AS first_rel_rank,
               CAST(SUM(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_in_topk
        FROM lex LEFT JOIN rel
            ON rel.query_id = lex.query_id AND rel.doc_id = lex.doc_id
        GROUP BY lex.query_id
    )
    SELECT qn.query_id,
           CAST(COALESCE(t.n_rel_total, 0) AS BIGINT) AS n_rel_total,
           CAST(COALESCE(h.n_rel_in_topk, 0) AS BIGINT) AS n_rel_in_topk,
           CAST(COALESCE(h.first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
           CAST(COALESCE(round(1.0 / h.first_rel_rank, 6), 0) AS DOUBLE) AS reciprocal_rank
    FROM qn
    LEFT JOIN hits h USING (query_id)
    LEFT JOIN totals t USING (query_id)
    """


@register("retrieval_mrr_report", category="text", oracle=_mrr_oracle())
def retrieval_mrr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality report for the BM25 ranking: per query, the rank
    of the first RELEVANT document (relevance rule: the document contains
    ALL the query's terms — deterministic, no human labels), its
    reciprocal rank, and top-k/corpus-wide relevant counts. Averaging
    reciprocal_rank gives MRR — the eval loop every retrieval stack runs
    after an index or scoring change, next to similarity_recall_report
    on the dense side.

    Scale: the relevance set reads the SAME persisted query-term-
    restricted tf rows the BM25 call uses (``_tfq_table`` — one corpus
    tokenization + one restriction pass, reused via the plan-canonical
    cache) — never corpus × queries; the metric join runs over the
    top-k rows only. Every query id appears in the output — a query with zero
    relevant documents (or zero index hits) reports n_rel_total = 0 and
    reciprocal_rank = 0 instead of silently vanishing, which would
    overstate MRR. The relevance threshold is each query's OWN term
    count, not a constant. Reciprocal ranks are 1/BIGINT rounded to 6dp
    — cross-engine exact."""
    lex = text_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "rank")
    qterms = literal_frame(spark, BM25_QUERIES, "query_id long, term string")
    qn = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    # the joined frame is UNIQUE per (query_id, term, doc_id) — tf-table
    # grain × the (query_id, term) map — so the distinct term count per
    # (query_id, doc_id) is a plain row count: one exchange, no Expand
    # (guide §2.3).
    rel = (
        _tfq_table(spark, sf_dir)
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("nt") == F.col("n_terms"))
        .select("query_id", F.col("doc_id").alias("rel_doc"))
    )
    rel = tracked_persist(rel)
    totals = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel_total"))
    hits = (
        lex.join(
            rel,
            (lex.query_id == rel.query_id) & (lex.doc_id == rel.rel_doc),
            "left",
        )
        .drop(rel.query_id)
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("rel_doc").isNotNull(), F.col("rank"))).alias(
                "first_rel_rank"
            ),
            F.sum(F.col("rel_doc").isNotNull().cast("long")).alias("n_rel_in_topk"),
        )
    )
    return (
        qn.select("query_id")
        .join(hits, "query_id", "left")
        .join(totals, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_rel_total"), F.lit(0)).cast("long").alias("n_rel_total"),
            F.coalesce(F.col("n_rel_in_topk"), F.lit(0)).cast("long").alias("n_rel_in_topk"),
            F.coalesce(F.col("first_rel_rank"), F.lit(0)).cast("long").alias("first_rel_rank"),
            F.coalesce(F.round(1.0 / F.col("first_rel_rank"), 6), F.lit(0.0))
            .cast("double")
            .alias("reciprocal_rank"),
        )
    )


# NDCG position discounts 1/log2(rank+1) pre-quantized to micro-units and
# inlined as LITERALS into both engines — no runtime transcendental, so
# DCG sums are exact BIGINTs with zero cross-engine float risk.
NDCG_DISCOUNT_MICRO = [1000000, 630930, 500000, 430677, 386853,
                       356207, 333333, 315465, 301030, 289065]
# The rank joins silently drop ranks beyond this table in BOTH engines
# (the oracle could not catch it) — fail fast instead. A bare assert
# would be stripped under python -O, exactly when the silent truncation
# could ship.
if len(NDCG_DISCOUNT_MICRO) < BM25_TOPK:
    raise ValueError(
        f"NDCG_DISCOUNT_MICRO covers {len(NDCG_DISCOUNT_MICRO)} ranks but "
        f"BM25_TOPK={BM25_TOPK}: extend the discount table or NDCG will "
        "silently drop the deeper ranks in both engines"
    )

_NDCG_D_VALUES = ", ".join(
    f"({r + 1}, {d})" for r, d in enumerate(NDCG_DISCOUNT_MICRO)
)


def _ndcg_oracle() -> str:
    from hyperloglog_pyspark_spark.registry import REGISTRY

    bm25 = REGISTRY["text_bm25_topk"].oracle
    return f"""
    WITH lex AS ({bm25}),
    q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
    disc(rank, d) AS (VALUES {_NDCG_D_VALUES}),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY doc_id, token
    ),
    fixed AS (
        SELECT query_id, rank,
               (1 << COUNT(*) FILTER (WHERE matched)) - 1 AS gain
        FROM (
            SELECT lex.query_id, lex.rank, q.term,
                   BOOL_OR(tf.doc_id IS NOT NULL) AS matched
            FROM lex
            JOIN q ON q.query_id = lex.query_id
            LEFT JOIN tf ON tf.doc_id = lex.doc_id AND tf.token = q.term
            GROUP BY lex.query_id, lex.rank, q.term
        ) GROUP BY query_id, rank
    ),
    dcg AS (
        SELECT f.query_id,
               CAST(SUM(f.gain * disc.d) AS BIGINT) AS dcg_micro
        FROM fixed f JOIN disc ON disc.rank = f.rank
        GROUP BY f.query_id
    ),
    ideal AS (
        SELECT query_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY gain DESC, rank ASC) AS irank,
               gain
        FROM fixed
    ),
    idcg AS (
        SELECT i.query_id,
               CAST(SUM(i.gain * disc.d) AS BIGINT) AS idcg_micro
        FROM ideal i JOIN disc ON disc.rank = i.irank
        GROUP BY i.query_id
    )
    SELECT qn.query_id,
           CAST(COALESCE(d.dcg_micro, 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(g.idcg_micro, 0) AS BIGINT) AS idcg_micro,
           CAST(CASE WHEN COALESCE(g.idcg_micro, 0) = 0 THEN 0
                ELSE round(d.dcg_micro * 1.0 / g.idcg_micro, 6) END AS DOUBLE) AS ndcg
    FROM (SELECT query_id FROM q GROUP BY query_id) qn
    LEFT JOIN dcg d USING (query_id)
    LEFT JOIN idcg g USING (query_id)
    """


@register("retrieval_ndcg_report", category="text", bench=True, oracle=_ndcg_oracle())
def retrieval_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k of the BM25 ranking with graded relevance: each retrieved
    document's grade is how many of the query's terms it contains, gain
    = 2^grade − 1, and NDCG divides the ranked DCG by the ideal
    (grade-sorted) reordering of the SAME retrieved set (the local
    NDCG@k variant — it scores ordering quality, recall is
    retrieval_mrr_report's n_rel_in_topk). Completes the eval suite:
    recall (similarity_recall_report), MRR, NDCG.

    Determinism: position discounts 1/log2(rank+1) are PRE-QUANTIZED
    micro-unit literals shared by both engines, gains are integers, so
    DCG/IDCG are exact BIGINT sums — no runtime log, no float
    accumulation. Scale: everything runs on top-k rows per query; the
    grade join reuses the persisted tf table restricted by the broadcast
    query terms."""
    lex = text_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "rank")
    qterms = literal_frame(spark, BM25_QUERIES, "query_id long, term string")
    # The grade join runs over the persisted query-term-restricted tf
    # rows (docs-containing-query-terms scale, shared with BM25/MRR via
    # the plan-canonical cache) — never the full tf table.
    tfq = _tfq_table(spark, sf_dir).select(
        F.col("doc_id").alias("td"), F.col("term").alias("tt")
    )
    matches = (
        lex.join(F.broadcast(qterms), "query_id")
        .join(
            tfq,
            (F.col("doc_id") == F.col("td")) & (F.col("term") == F.col("tt")),
            "left",
        )
        .groupBy("query_id", "rank", "term")
        .agg(F.max(F.col("td").isNotNull().cast("int")).alias("matched"))
    )
    fixed = matches.groupBy("query_id", "rank").agg(
        F.expr("shiftleft(1, sum(matched)) - 1").alias("gain")
    )
    disc = literal_frame(
        spark, [(r + 1, d) for r, d in enumerate(NDCG_DISCOUNT_MICRO)], "rank int, d long"
    )
    fixed = tracked_persist(fixed)
    dcg = (
        fixed.join(F.broadcast(disc), "rank")
        .groupBy("query_id")
        .agg(F.sum(F.col("gain") * F.col("d")).cast("long").alias("dcg_micro"))
    )
    wi = Window.partitionBy("query_id").orderBy(F.desc("gain"), F.asc("rank"))
    idcg = (
        fixed.withColumn("irank", F.row_number().over(wi))
        .join(F.broadcast(disc.withColumnRenamed("rank", "irank")), "irank")
        .groupBy("query_id")
        .agg(F.sum(F.col("gain") * F.col("d")).cast("long").alias("idcg_micro"))
    )
    qn = qterms.select("query_id").distinct()
    return (
        qn.join(dcg, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("long").alias("dcg_micro"),
            F.coalesce(F.col("idcg_micro"), F.lit(0)).cast("long").alias("idcg_micro"),
            F.when(F.coalesce(F.col("idcg_micro"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(F.col("dcg_micro") * 1.0 / F.col("idcg_micro"), 6))
            .cast("double")
            .alias("ndcg"),
        )
    )


# Zipf-law audit: micro-unit quantization for the log values so the
# regression sums are exact BIGINT (a double SUM would be association-
# order-dependent across engines).
_ZIPF_Q = 1_000_000


@register(
    "quality_zipf_audit",
    category="quality",
    oracle=f"""
    WITH counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ),
    ranked AS (
        SELECT token, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
        FROM counts
    ),
    q AS (
        SELECT token, n, rank,
               CAST(ROUND(ln(CAST(rank AS DOUBLE)) * {_ZIPF_Q}, 0) AS BIGINT) AS x,
               CAST(ROUND(ln(CAST(n AS DOUBLE)) * {_ZIPF_Q}, 0) AS BIGINT) AS y
        FROM ranked
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS k,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM q
    ),
    stat AS (
        SELECT k * sxy - sx * sy AS num,
               k * sxx - sx * sx AS dx,
               k * syy - sy * sy AS dy
        FROM fit
    )
    SELECT q.rank, q.token, q.n,
           CAST(s.num AS DOUBLE) / NULLIF(CAST(s.dx AS DOUBLE), 0) AS zipf_slope,
           (CAST(s.num AS DOUBLE) * CAST(s.num AS DOUBLE))
               / NULLIF(CAST(s.dx AS DOUBLE) * CAST(s.dy AS DOUBLE), 0) AS r2,
           (CAST(s.num AS DOUBLE) / NULLIF(CAST(s.dx AS DOUBLE), 0)
                BETWEEN -1.5 AND -0.5)
               AND (CAST(s.num AS DOUBLE) * CAST(s.num AS DOUBLE))
                   / NULLIF(CAST(s.dx AS DOUBLE) * CAST(s.dy AS DOUBLE), 0) > 0.9
               AS is_zipfian
    FROM q CROSS JOIN stat s
    """,
)
def quality_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law rank-frequency audit over the corpus vocabulary — the
    text-side companion to quality_benford_audit's digit test: natural
    text follows freq ∝ rank^s with s ≈ −1; a log-log least-squares
    slope far from −1 (or a poor fit) flags synthetic, boilerplate, or
    truncated corpora. Emits the full rank table plus the fitted slope,
    R², and an is_zipfian verdict (slope in [−1.5, −0.5] AND R² > 0.9).
    This synthetic word-soup corpus deliberately FAILS the test — near-
    uniform frequencies fit a shallow slope — which is the signal the
    audit exists to raise.

    Determinism: ln() is the only transcendental — applied once per
    value and immediately quantized to exact BIGINT micro-units; the
    regression moments Σx, Σy, Σxy, Σx², Σy² and the stat products
    k·Σxx − Σx² accumulate in decimal(38,0) (DuckDB HUGEINT) so they
    stay exact through |V| ~ 1e7 (int64 would overflow at |V| ~ 600;
    a double SUM would be at the mercy of partial-agg order). Slope
    and R² are double ratios of those bit-identical exact operands
    (the micro-unit scale cancels in both ratios).

    Scale: explode → vocabulary-sized count agg (map-side combine does
    the heavy lift); ranking, quantized logs, and the moment agg all run
    on the vocab-sized frame (the global window orders |V| rows — for
    real corpora |V| ~ 10⁵-10⁷, still metadata-scale next to the corpus;
    at that size swap row_number for a rank from a count-distribution
    prefix sum if the single-partition sort ever shows up in profiles).
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ranked = counts.select(
        "token", "n",
        F.row_number().over(Window.orderBy(F.col("n").desc(), "token"))
        .cast("long").alias("rank"),
    )
    q = tracked_persist(
        ranked.select(
            "token", "n", "rank",
            F.round(F.log(F.col("rank").cast("double")) * _ZIPF_Q, 0)
            .cast("long").alias("x"),
            F.round(F.log(F.col("n").cast("double")) * _ZIPF_Q, 0)
            .cast("long").alias("y"),
        )
    )
    # Moments and stat products in decimal(38,0) (DuckDB: HUGEINT): with
    # micro-unit logs, k*sxx ~ |V|^2 * 1e12 * ln^2|V| blows past int64
    # at |V| ~ 600 — decimal keeps the docstring's 1e5-1e7 vocab exact
    # (k*sxx <= ~3e28 at |V|=1e7, well inside 38 digits).
    dec = "decimal(38,0)"
    fit = q.agg(
        F.count(F.lit(1)).cast(dec).alias("k"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        # widen one operand BEFORE each product: micro-unit logs keep
        # x,y < ~4e7 so long*long is safe today, but the oracle squares
        # in HUGEINT — cast-before-multiply keeps the shapes symmetric
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    stat = fit.select(
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(dec).alias("num"),
        (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(dec).alias("dx"),
        (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast(dec).alias("dy"),
    )
    # NULLIF on the denominators: a degenerate fit (constant x or y —
    # e.g. a one-token vocabulary) must yield NULL on BOTH engines, not
    # an ANSI DIVIDE_BY_ZERO on Spark vs NaN on DuckDB (the driver hands
    # a bare ANSI-on session). num^2 would need 57 digits at |V|=1e7, so
    # r2 squares in double AFTER the exact-decimal operands are fixed
    # (dec->double is exact below 2^53 — every test SF — and a half-ulp
    # of a monitor ratio beyond that).
    numd = F.col("num").cast("double")
    slope = numd / F.nullif(F.col("dx").cast("double"), F.lit(0.0))
    r2 = (numd * numd) / F.nullif(
        F.col("dx").cast("double") * F.col("dy").cast("double"), F.lit(0.0)
    )
    return q.crossJoin(F.broadcast(stat)).select(
        "rank", "token", "n",
        slope.alias("zipf_slope"),
        r2.alias("r2"),
        (slope.between(F.lit(-1.5), F.lit(-0.5)) & (r2 > F.lit(0.9)))
        .alias("is_zipfian"),
    )


# Feature-hashing (hashing-trick) audit: the fixed-width featurization a
# fastText-style quality classifier uses at corpus scale. Buckets are a
# shared 60-bit md5 hash mod FEAT_B on both engines.
FEAT_B = 4096  # feature-vector width (buckets)
FEAT_TOP = 20  # most-loaded buckets reported


@register(
    "text_hashed_ngram_features",
    category="text",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT unnest(t) AS gram FROM toks),
    bi AS (
        SELECT t[i] || ' ' || t[i + 1] AS gram
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    grams AS (SELECT gram FROM uni UNION ALL SELECT gram FROM bi),
    buckets AS (
        SELECT {md5_long_sql("gram")} % {FEAT_B} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct_grams
        FROM grams GROUP BY 1
    ),
    ranked AS (
        SELECT bucket, n_occurrences, n_distinct_grams,
               ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, bucket) AS rnk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets_used,
               CAST(SUM(CASE WHEN n_distinct_grams >= 2 THEN 1 ELSE 0 END)
                        OVER () AS BIGINT) AS n_colliding_buckets,
               CAST(SUM(n_distinct_grams - 1) OVER () AS BIGINT) AS lost,
               CAST(SUM(n_distinct_grams) OVER () AS BIGINT) AS vocab
        FROM buckets
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, bucket, n_occurrences,
           n_distinct_grams, n_buckets_used, n_colliding_buckets,
           CAST(lost AS DOUBLE) / vocab AS gram_collision_rate,
           CAST(n_buckets_used AS DOUBLE) / {FEAT_B} AS load_factor
    FROM ranked WHERE rnk <= {FEAT_TOP}
    """,
)
def text_hashed_ngram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing audit for the hashing-trick featurization
    (uni+bigram grams hashed into a fixed {FEAT_B}-wide vector — the
    fastText/Vowpal-Wabbit input layer a corpus-scale quality classifier
    trains on): per bucket, occurrence load and distinct-gram count; the
    {FEAT_TOP} most-loaded buckets are reported alongside corpus-level
    collision metrics — gram_collision_rate (share of distinct grams
    that lost identity to a shared bucket) and load_factor. This is the
    audit that sizes the hash width: a collision rate creeping up as the
    corpus grows says widen FEAT_B before classifier quality silently
    degrades.

    Determinism: bucket = shared 60-bit md5 hash mod {FEAT_B} (identical
    literal construction on both engines); every metric is an exact
    integer aggregate with at most one final division; ranking ties
    break on bucket id.

    Scale: gram explode → ONE (bucket, gram)-grain aggregation with
    map-side combine, collapsing to ≤ {FEAT_B} bucket rows; the summary
    windows run over that constant-width frame (GWIN-allowlisted), never
    the corpus. At 100 TB the explode is the scan cost; the feature
    table stays {FEAT_B} rows no matter the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # uni- and bigrams from ONE scan: concat the token array with the
    # bigram array and explode once (a UNION of two selects re-scans
    # the fact table — the multi-fact-scan audit rejects that shape)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    buckets = (
        docs.select(F.explode(F.concat(t, bigrams)).alias("gram"))
        .select((md5_long(F.col("gram")) % FEAT_B).alias("bucket"), "gram")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("gram").cast("long").alias("n_distinct_grams"),
        )
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("n_occurrences").desc(), "bucket")
    lost = F.sum(F.col("n_distinct_grams") - 1).over(w_all)
    vocab = F.sum("n_distinct_grams").over(w_all)
    return (
        buckets.select(
            F.row_number().over(w_rank).cast("long").alias("rnk"),
            "bucket",
            "n_occurrences",
            "n_distinct_grams",
            F.count(F.lit(1)).over(w_all).cast("long").alias("n_buckets_used"),
            F.sum(F.when(F.col("n_distinct_grams") >= 2, 1).otherwise(0))
            .over(w_all).cast("long").alias("n_colliding_buckets"),
            (lost.cast("double") / vocab).alias("gram_collision_rate"),
            (
                F.count(F.lit(1)).over(w_all).cast("double") / F.lit(float(FEAT_B))
            ).alias("load_factor"),
        )
        .filter(F.col("rnk") <= FEAT_TOP)
    )


# Heaps'-law audit constants: bucketed prefix sums (the scalable
# cumulative — per-bucket windows + a #buckets-row offset table) and the
# same micro-unit ln quantization discipline as the Zipf audit.
HEAPS_B = 256     # docs per prefix-sum bucket
HEAPS_Q = 10_000  # ln quantization (0.1 milli-nats): keeps the moment
#                   sums inside BIGINT at 10^4-doc corpora


@register(
    "quality_heaps_law",
    category="quality",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    counts AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
    el AS (SELECT doc_id, unnest(list_distinct(t)) AS w FROM toks),
    firsts AS (SELECT w, MIN(doc_id) AS first_doc FROM el GROUP BY w),
    news AS (
        SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY 1
    ),
    base AS (
        SELECT c.doc_id, c.n_tokens, COALESCE(n.n_new, 0) AS n_new_types
        FROM counts c LEFT JOIN news n USING (doc_id)
    ),
    cum AS (
        SELECT doc_id, n_tokens, n_new_types,
               CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
               CAST(SUM(n_new_types) OVER w AS BIGINT) AS cum_vocab
        FROM base WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    ),
    q AS (
        SELECT *,
               CAST(ROUND(ln(CAST(cum_tokens AS DOUBLE)) * {HEAPS_Q}, 0)
                    AS BIGINT) AS x,
               CAST(ROUND(ln(CAST(cum_vocab AS DOUBLE)) * {HEAPS_Q}, 0)
                    AS BIGINT) AS y
        FROM cum
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM q
    ),
    stat AS (
        SELECT k * sxy - sx * sy AS num,
               k * sxx - sx * sx AS dx,
               k * syy - sy * sy AS dy
        FROM fit
    )
    SELECT q.doc_id, q.n_tokens, q.n_new_types, q.cum_tokens, q.cum_vocab,
           CAST(s.num AS DOUBLE) / NULLIF(s.dx, 0) AS heaps_beta,
           CAST(CAST(s.num AS HUGEINT) * s.num AS DOUBLE)
               / NULLIF(CAST(CAST(s.dx AS HUGEINT) * s.dy AS DOUBLE), 0) AS r2,
           (CAST(s.num AS DOUBLE) / NULLIF(s.dx, 0) BETWEEN 0.3 AND 0.9)
               AND CAST(CAST(s.num AS HUGEINT) * s.num AS DOUBLE)
                   / NULLIF(CAST(CAST(s.dx AS HUGEINT) * s.dy AS DOUBLE), 0) > 0.9
               AS is_heapsian
    FROM q CROSS JOIN stat s
    """,
)
def quality_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth audit — the third leg of the corpus
    statistics trio (Benford on money digits, Zipf on rank-frequency,
    Heaps on vocabulary growth): natural text grows distinct vocabulary
    as V(N) ≈ K·N^β with β ≈ 0.4-0.6; a saturating curve (β → 0, this
    synthetic fixed-vocab corpus) or a non-power-law fit flags
    synthetic, templated, or exhausted crawls. Emits the full per-doc
    ingest curve (tokens, new types, cumulative tokens/vocab) plus the
    log-log fitted β, R², and an is_heapsian verdict (β ∈ [0.3, 0.9]
    AND R² > 0.9).

    Determinism: new-type counts come from the MIN(doc_id) inverted
    index (text_ngram_novelty's plan family at unigram grain);
    cumulatives are exact integer prefix sums; ln values quantize to
    BIGINT tenth-milli-nats before the moment sums (association-free,
    the Zipf discipline); β and R² are single divisions of
    integer-derived operands.

    Scale: the cumulative is the SCALABLE two-level prefix sum — a
    window inside each {HEAPS_B}-doc bucket plus one #buckets-row
    offset table (the only global window, metadata-scale at any corpus)
    — never a corpus-wide single-partition sort. The fit here runs at
    doc grain (BIGINT-safe to ~10^4 curve points with HEAPS_Q
    quantization); a 100 TB deployment fits the SAME regression over
    the bucket-grain curve — the prefix machinery already emits it —
    keeping the moment sums metadata-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = tracked_persist(
        docs.select("doc_id", F.size(t).cast("long").alias("n_tokens"),
                    F.array_distinct(t).alias("tw"))
    )
    firsts = (
        toks.select("doc_id", F.explode("tw").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    news = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    base = (
        toks.select("doc_id", "n_tokens")
        .join(news, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long")
            .alias("n_new_types"),
            F.expr(f"doc_id div {HEAPS_B}").alias("b"),
        )
    )
    w_in = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    inb = base.select(
        "*",
        F.sum("n_tokens").over(w_in).alias("ct_in"),
        F.sum("n_new_types").over(w_in).alias("cv_in"),
    )
    w_off = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = (
        base.groupBy("b")
        .agg(F.sum("n_tokens").alias("bt"), F.sum("n_new_types").alias("bv"))
        .select(
            "b",
            (F.sum("bt").over(w_off) - F.col("bt")).alias("off_t"),
            (F.sum("bv").over(w_off) - F.col("bv")).alias("off_v"),
        )
    )
    cum = inb.join(F.broadcast(offs), "b").select(
        "doc_id", "n_tokens", "n_new_types",
        (F.col("ct_in") + F.col("off_t")).cast("long").alias("cum_tokens"),
        (F.col("cv_in") + F.col("off_v")).cast("long").alias("cum_vocab"),
    )
    q = tracked_persist(
        cum.select(
            "*",
            F.round(F.log(F.col("cum_tokens").cast("double")) * HEAPS_Q, 0)
            .cast("long").alias("x"),
            F.round(F.log(F.col("cum_vocab").cast("double")) * HEAPS_Q, 0)
            .cast("long").alias("y"),
        )
    )
    fit = q.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        # products widened to decimal BEFORE multiplying (the oracle's
        # SUM(x*x) accumulates in HUGEINT); the final cast to long is
        # the oracle's CAST(... AS BIGINT) and is exact in-domain
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("long").alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("long").alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("long").alias("syy"),
    )
    stat = fit.select(
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dx"),
        (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")).alias("dy"),
    )
    # NULLIF guards: a degenerate fit (single doc, or a vocabulary
    # saturated at doc 0 making cum_vocab constant) yields NULL on both
    # engines instead of an ANSI DIVIDE_BY_ZERO / NaN divergence
    beta = F.col("num").cast("double") / F.nullif(F.col("dx"), F.lit(0))
    r2 = (
        (F.col("num").cast("decimal(38,0)") * F.col("num")).cast("double")
        / F.nullif(
            (F.col("dx").cast("decimal(38,0)") * F.col("dy")).cast("double"),
            F.lit(0.0),
        )
    )
    return q.crossJoin(F.broadcast(stat)).select(
        "doc_id", "n_tokens", "n_new_types", "cum_tokens", "cum_vocab",
        beta.alias("heaps_beta"),
        r2.alias("r2"),
        (beta.between(F.lit(0.3), F.lit(0.9)) & (r2 > F.lit(0.9)))
        .alias("is_heapsian"),
    )
