"""Training-run preparation operators: sequence packing, domain-mixture
rebalancing, and cross-corpus overlap auditing — the steps between "curated
corpus" and "tokens on the training cluster".

These extend the LLM-pipeline surface (SURVEY.md §2.2 north-star extras;
the reference at /root/reference/ has no counterpart — it is an HLL sketch
library, examples.py:16-83). Everything here is deterministic (md5-anchored
or order-anchored) so results are reproducible across engines, runs, and
cluster layouts, and every query is built from JVM-side expressions only.

Scale posture (100 TB):
- Packing windows are partitioned by source — packs never span a partition
  key, so the sort is per-group, not global. For a pathologically large
  single source, sub-partition the pack space by a hash bucket of doc_id
  (each bucket packs independently; budget waste is one tail pack per
  bucket) — same expression shape, noted below.
- Mixture rates are computed on a #sources-row aggregate (an all-rows
  window over that tiny frame is a driver-sized operation, not a data-sized
  one) and broadcast back; the scan side is a stateless hash predicate.
- Overlap joins are keyed on the n-gram (high cardinality, low skew) over
  DISTINCT (source, gram) postings — work is bounded by vocabulary size
  per source, never by document pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hyperloglog_pyspark_spark.functions.texttools import (
    STOPWORDS,
    md5_long,
    md5_long_sql,
    shingles_sql,
    word_shingles,
)
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import literal_frame, load_table

PACK_BUDGET = 2048  # tokens per pack (context-window accounting unit)


@register(
    "pack_sequences_greedy",
    category="trainprep",
    bench=True,
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS toks
        FROM documents
    ), packed AS (
        SELECT source, toks,
               CAST(FLOOR((SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) - toks)
                          / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT source, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS pack_tokens,
           ROUND(SUM(toks) / {PACK_BUDGET}.0, 6) AS fill_ratio
    FROM packed
    GROUP BY source, pack_id
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents in deterministic
    doc_id order within each source and cut a new pack every PACK_BUDGET
    tokens (a document whose start offset lies in pack k belongs to pack
    k, so packs can overflow by one tail document — concat-then-chunk
    accounting). pack_id = floor(preceding_cumsum / budget) needs only a
    per-source ordered running sum: one window, partitioned by source, no
    global sort. Output is per-pack fill accounting — the input to
    choosing a packing budget that minimizes padding waste."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("toks").over(w)
    return (
        docs.select("source", "doc_id", toks.alias("toks"))
        .withColumn("pack_id", F.floor((cum - F.col("toks")) / float(PACK_BUDGET)).cast("long"))
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("pack_tokens"),
            F.round(F.sum("toks") / float(PACK_BUDGET), 6).alias("fill_ratio"),
        )
    )


@register(
    "mixture_downsample_temperature",
    category="trainprep",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source
    ), rates AS (
        SELECT source, n_orig,
               sqrt((SELECT MIN(n_orig) FROM counts) * 1.0 / n_orig) AS rate
        FROM counts
    )
    SELECT r.source,
           CAST(r.n_orig AS BIGINT) AS n_orig,
           CAST(COUNT(d.doc_id) AS BIGINT) AS n_kept,
           ROUND(r.rate, 6) AS rate
    FROM rates r
    LEFT JOIN documents d
      ON d.source = r.source
     AND {md5_long_sql("CAST(d.doc_id AS VARCHAR)")} % 1000000
         < CAST(FLOOR(r.rate * 1000000) AS BIGINT)
    GROUP BY r.source, r.n_orig, r.rate
    """,
)
def mixture_downsample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixture by downsampling: keep rate
    r_s = (n_min / n_s)^0.5 per source (tau = 0.5 flattening — the
    smallest domain is kept whole, larger domains are square-root
    compressed toward it). The exponent is exactly 0.5 on purpose: sqrt
    and IEEE division are correctly-rounded in both Spark and DuckDB, so
    the per-source threshold floor(r*1e6) is bit-identical cross-engine
    (a generic pow() would not be). Row selection is the md5 hash
    predicate — stateless, partition-independent, reproducible. The
    rates frame has #sources rows, so the all-rows window over it is
    trivially small; it broadcasts back onto the scan. It is persisted:
    both its uses (the keep-filter join and the report join) would
    otherwise re-run the corpus-scale count behind it."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_orig"))
    rates = tracked_persist(counts.withColumn(
        "rate",
        F.sqrt(F.min("n_orig").over(Window.partitionBy()).cast("double") / F.col("n_orig")),
    ).withColumn("thr", F.floor(F.col("rate") * 1000000).cast("long")))
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(md5_long(F.col("doc_id").cast("string")) % 1000000 < F.col("thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n_orig").cast("long").alias("n_orig"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


N_SHARDS = 8


@register(
    "shard_manifest_balanced",
    category="trainprep",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents
    ), ranked AS (
        SELECT doc_id, toks,
               (ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) - 1) % {N_SHARDS} AS shard_id
        FROM toks
    ), shards AS (
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS shard_tokens
        FROM ranked GROUP BY shard_id
    )
    SELECT shard_id, n_docs, shard_tokens,
           ROUND(shard_tokens / (SUM(shard_tokens) OVER () / {N_SHARDS}.0), 6) AS balance
    FROM shards
    """,
)
def shard_manifest_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard manifest: stripe documents across N_SHARDS by
    descending token count (rank mod N — the striped cousin of LPT greedy
    packing: each shard gets one doc from every size tier, so shard token
    totals are near-equal without any driver-side bin state). Output is
    the manifest accounting — per-shard doc/token totals and the balance
    ratio vs the ideal equal split, the number an operator alerts on.

    Scale note: the global row_number is NOT a global window (which
    Spark executes in ONE task — the pattern that dies at 100 TB); it is
    decomposed as histogram-offset + within-tier rank: a (toks → count)
    histogram gives each size tier's starting rank via a running sum
    over the tiny tier table, and a PARTITIONED window
    (partitionBy(toks) orderBy(doc_id)) ranks within the tier — the
    distributed two-phase ranking every engine uses for dense global
    ranks. Identical ranks, no single-task stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    # persisted: both the tier histogram and the rank join consume it,
    # and recomputing it re-parses the full corpus text a second time
    sized = tracked_persist(docs.select("doc_id", toks.alias("toks")))
    # tier table: one row per distinct token count — bounded by the token
    # domain (thousands), never by corpus rows
    tier_w = Window.orderBy(F.col("toks").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    tiers = (
        sized.groupBy("toks")
        .agg(F.count(F.lit(1)).alias("tier_n"))
        .withColumn("tier_offset", F.coalesce(F.sum("tier_n").over(tier_w), F.lit(0)))
        .select("toks", "tier_offset")
    )
    local_w = Window.partitionBy("toks").orderBy("doc_id")
    shards = (
        sized.join(F.broadcast(tiers), "toks")
        .withColumn(
            "shard_id",
            (F.col("tier_offset") + F.row_number().over(local_w) - 1) % N_SHARDS,
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("shard_tokens"),
        )
    )
    ideal = F.sum("shard_tokens").over(Window.partitionBy()) / float(N_SHARDS)
    return shards.select(
        "shard_id",
        "n_docs",
        "shard_tokens",
        F.round(F.col("shard_tokens") / ideal, 6).alias("balance"),
    )


N_BINS = 4
_STOP_SQL = "(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "curriculum_quality_bins",
    category="trainprep",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               0.5 * (CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL})) AS DOUBLE)
                      / len(string_split(text, ' ')))
               + 0.5 * (least(len(string_split(text, ' ')), 100) / 100.0) AS quality
        FROM documents
    ), binned AS (
        SELECT lang, quality,
               NTILE({N_BINS}) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS bin
        FROM scored
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality), 6) AS avg_quality,
           ROUND(MIN(quality), 6) AS min_quality,
           ROUND(MAX(quality), 6) AS max_quality
    FROM binned GROUP BY lang, bin
    """,
)
def curriculum_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: NTILE quality quartiles per language (the same
    deterministic quality score text_stats emits), with per-bin size and
    score envelope — the schedule table a curriculum sampler consumes
    (feed bin 1 early epochs, bin 4 late, or reverse). doc_id tiebreak
    makes bin assignment total-order deterministic cross-engine.

    Scale: one window partitioned by lang (bounded partitions), one
    grouped aggregate — no global sort, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens
    quality = 0.5 * stop_ratio + 0.5 * (F.least(n_tokens, F.lit(100)) / 100.0)
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        docs.select("doc_id", "lang", quality.alias("quality"))
        .withColumn("bin", F.ntile(N_BINS).over(w))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
        )
    )


OVERLAP_N = 3


@register(
    "corpus_overlap_grams",
    category="trainprep",
    bench=True,
    oracle=f"""
    WITH sg AS (
        SELECT DISTINCT source, unnest({shingles_sql(OVERLAP_N)}) AS gram
        FROM documents
        WHERE len(string_split(text, ' ')) >= {OVERLAP_N}
    ), tot AS (
        SELECT source, COUNT(*) AS n FROM sg GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_grams,
           ROUND(COUNT(*) * 1.0 / (ta.n + tb.n - COUNT(*)), 6) AS jaccard
    FROM sg a
    JOIN sg b ON a.gram = b.gram AND a.source < b.source
    JOIN tot ta ON ta.source = a.source
    JOIN tot tb ON tb.source = b.source
    GROUP BY a.source, b.source, ta.n, tb.n
    """,
)
def corpus_overlap_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every pair of sources, the
    number of distinct word 3-grams they share and the gram-level Jaccard
    similarity — the corpus-to-corpus generalization of
    text_decontaminate's corpus-to-benchmark check. Built as an
    inverted-index count join over DISTINCT (source, gram) postings: the
    join key is the gram (high cardinality), each shared gram contributes
    exactly one row per source pair, and no gram array is ever pairwise
    intersected. Work is Sum_g df(g)^2 with df bounded by #sources —
    linear in vocabulary, independent of document count."""
    docs = load_table(spark, sf_dir, "documents", spread_scan=True)
    # Persisted (tracked): the distinct postings feed both join sides and
    # the per-source totals — one explode+dedup instead of three.
    sg = tracked_persist(
        docs.filter(F.size(F.split("text", " ")) >= OVERLAP_N)
        .select("source", F.explode(word_shingles("text", OVERLAP_N)).alias("gram"))
        .distinct()
    )
    tot = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sg.select(F.col("source").alias("source_a"), "gram")
    b = sg.select(F.col("source").alias("source_b"), "gram")
    shared = F.count(F.lit(1))
    return (
        a.join(b, (a["gram"] == b["gram"]) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(shared.alias("shared_grams"))
        .join(F.broadcast(tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))), "source_a")
        .join(F.broadcast(tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared_grams").cast("long").alias("shared_grams"),
            F.round(
                F.col("shared_grams") / (F.col("n_a") + F.col("n_b") - F.col("shared_grams")),
                6,
            ).alias("jaccard"),
        )
    )


CHUNK_SIZE = 400  # characters per retrieval chunk
CHUNK_STRIDE = 300  # step between chunk starts → 100-char overlap


@register(
    "chunk_documents_overlap",
    category="trainprep",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, text,
               1 + CASE WHEN n_chars > {CHUNK_SIZE}
                        THEN (n_chars - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
                        ELSE 0 END AS n_chunks
        FROM documents
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(length(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS INTEGER), {CHUNK_SIZE})) AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS INTEGER), {CHUNK_SIZE})) AS chunk_md5
    FROM (SELECT doc_id, text, unnest(range(0, n_chunks)) AS i FROM n)
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size document chunking (400-char windows, 300-char
    stride → 100-char overlap): the retrieval/RAG preprocessing step that
    turns a corpus into embeddable passages. Emits one row per chunk with
    its offset, realized length, and content digest (md5 — the cross-engine
    equality anchor, so the oracle verifies the chunk BYTES, not just
    counts).

    Chunk count per document is closed-form integer arithmetic (never a
    while-loop), so the whole operator is sequence+explode+substr — one
    narrow map stage, no shuffle, embarrassingly parallel at 100 TB. The
    final chunk is taken as-is (shorter than CHUNK_SIZE, never padded);
    documents shorter than one window yield exactly one chunk.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.lit(1) + F.when(
        F.col("n_chars") > CHUNK_SIZE,
        F.expr(f"(n_chars - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}"),
    ).otherwise(F.lit(0))
    chunk = F.expr(f"substr(text, cast(chunk_idx * {CHUNK_STRIDE} + 1 as int), {CHUNK_SIZE})")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * CHUNK_STRIDE).cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


_LANG_TOKENS_SQL = """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        FROM documents GROUP BY lang"""


def _lang_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-language (n_docs, token) totals — the one corpus
    scan shared by the mixture operators (plan-canonical cache reuse,
    the _tf_table precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    return tracked_persist(
        docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("toks"),
        )
    )


# Target mixture shares (percent) for the budgeted data order; must sum
# to 100. 'de' is deliberately over-weighted beyond its corpus supply
# (~14% of tokens, but 35% of a 50% budget = 17.5% of the corpus) so the
# supply-cap + deficit-redistribution path actually executes on the
# fixtures; a language caps iff its token share < pct·budget%/10000.
MIX_TARGET_PCT = {"en": 20, "de": 35, "es": 15, "fr": 15, "zh": 15}
MIX_BUDGET_PCT = 50  # global token budget as a percent of the corpus

_MIX_PCT_VALUES = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGET_PCT.items())


@register(
    "mixture_budget_rates",
    category="trainprep",
    oracle=f"""
    WITH lt AS ({_LANG_TOKENS_SQL}),
    tgt(lang, pct) AS (VALUES {_MIX_PCT_VALUES}),
    tot AS (SELECT SUM(toks) * {MIX_BUDGET_PCT} // 100 AS budget FROM lt),
    base AS (
        SELECT lt.lang, lt.toks, tgt.pct,
               (tot.budget * tgt.pct) // 100 AS desired
        FROM lt JOIN tgt USING (lang) CROSS JOIN tot
    ),
    caps AS (
        SELECT SUM(CASE WHEN toks < desired THEN desired - toks ELSE 0 END) AS deficit,
               SUM(CASE WHEN toks >= desired THEN desired ELSE 0 END) AS u
        FROM base
    )
    SELECT b.lang,
           b.toks AS tokens_available,
           CAST(b.pct AS INTEGER) AS target_pct,
           CAST(b.desired AS BIGINT) AS desired_tokens,
           CAST(LEAST(b.toks,
                b.desired + CASE WHEN b.toks < b.desired OR c.u = 0 THEN 0
                                 ELSE (c.deficit * b.desired) // c.u END) AS BIGINT)
               AS granted_tokens,
           CAST(round(LEAST(b.toks,
                b.desired + CASE WHEN b.toks < b.desired OR c.u = 0 THEN 0
                                 ELSE (c.deficit * b.desired) // c.u END) * 1.0
                / b.desired, 6) AS DOUBLE) AS fill_rate,
           b.toks < b.desired AS capped
    FROM base b CROSS JOIN caps c
    """,
)
def mixture_budget_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mixture allocation — the data-order solver: given
    per-language token supply, target shares, and a global token budget
    (here 50% of the corpus), grant each language min(supply, its share of
    the budget), then redistribute the deficit of supply-capped languages
    to the uncapped ones proportionally to their targets (one waterfill
    round; a second-round cap surfaces as fill_rate > 1 supply permitting,
    or stays unfilled and visible in Σ granted < budget). This is the
    table a rate-based sampler (sample_stratified / the temperature
    mixture) executes against.

    All integer arithmetic (floor divisions, exact BIGINT token sums) —
    bit-identical cross-engine. Scale: one corpus scan reduces to #langs
    rows; everything after is arithmetic on a broadcast frame."""
    lt = _lang_tokens(spark, sf_dir)
    tgt = literal_frame(
        spark, list(MIX_TARGET_PCT.items()), "lang string, pct int"
    )
    tot = lt.agg(
        F.expr(f"sum(toks) * {MIX_BUDGET_PCT} div 100").alias("budget")
    )
    base = (
        lt.join(F.broadcast(tgt), "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn("desired", F.expr("(budget * pct) div 100"))
    )
    caps = base.agg(
        F.sum(
            F.when(F.col("toks") < F.col("desired"), F.col("desired") - F.col("toks"))
            .otherwise(0)
        ).alias("deficit"),
        F.sum(
            F.when(F.col("toks") >= F.col("desired"), F.col("desired")).otherwise(0)
        ).alias("u"),
    )
    extra = F.when(
        (F.col("toks") < F.col("desired")) | (F.col("u") == 0), F.lit(0)
    ).otherwise(F.expr("(deficit * desired) div u"))
    granted = F.least(F.col("toks"), F.col("desired") + extra)
    return base.crossJoin(F.broadcast(caps)).select(
        "lang",
        F.col("toks").alias("tokens_available"),
        F.col("pct").cast("int").alias("target_pct"),
        F.col("desired").cast("long").alias("desired_tokens"),
        granted.cast("long").alias("granted_tokens"),
        F.round(granted * 1.0 / F.col("desired"), 6).cast("double").alias("fill_rate"),
        (F.col("toks") < F.col("desired")).alias("capped"),
    )


# Gopher-style per-source share cap: no single source may exceed this
# percent of the KEPT token mixture (not of the raw corpus — capping
# against the raw total lets a dominant source still dominate what
# remains). 5% sits just under this corpus's ~5.3-5.9% top shares, so
# the cap-and-redistribute fixpoint actually executes at every SF.
SRC_CAP_PCT = 5


@register(
    "mixture_source_share_cap",
    category="trainprep",
    oracle=f"""
    WITH st AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(toks) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_src,
               CAST(MIN(toks) AS BIGINT) AS min_toks
        FROM st
    ),
    ranked AS (
        SELECT source, n_docs, toks,
               ROW_NUMBER() OVER (ORDER BY toks DESC, source) AS r,
               CAST(SUM(toks) OVER (ORDER BY toks DESC, source
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS pfx,
               LAG(toks) OVER (ORDER BY toks DESC, source) AS t_last_cap
        FROM st
    ),
    cand AS (
        SELECT r - 1 AS m, total - (pfx - toks) AS s_u,
               100 - (r - 1) * {SRC_CAP_PCT} AS d,
               toks AS t_first_unc, t_last_cap
        FROM ranked CROSS JOIN tot
        UNION ALL
        -- drop-all fallback: ALWAYS selectable (synthetic d = 1 -> cap
        -- = 0 since s_u = 0), ordered last so any separating cut wins
        -- first. Practical trigger: n*c < 100 with every source
        -- over-cap (e.g. 3 equal whales -> only fixpoint is K = 0);
        -- the unconditional form is defense-in-depth so the operator
        -- can never return an empty frame.
        SELECT n_src AS m, CAST(0 AS BIGINT) AS s_u,
               CAST(1 AS BIGINT) AS d,
               CAST(0 AS BIGINT) AS t_first_unc, min_toks AS t_last_cap
        FROM tot
    ),
    pick AS (
        SELECT m, s_u, d FROM cand
        WHERE d > 0
          AND t_first_unc * d <= {SRC_CAP_PCT} * s_u
          AND (m = 0 OR t_last_cap * d > {SRC_CAP_PCT} * s_u)
        ORDER BY m LIMIT 1
    ),
    cap AS (SELECT ({SRC_CAP_PCT} * s_u) // d AS cap_tokens FROM pick),
    g AS (
        SELECT st.source, st.n_docs, st.toks,
               LEAST(st.toks, cap.cap_tokens) AS granted
        FROM st CROSS JOIN cap
    ),
    kept AS (SELECT CAST(SUM(granted) AS BIGINT) AS kept_total FROM g)
    SELECT g.source, g.n_docs, g.toks AS tokens_available,
           CAST(g.granted AS BIGINT) AS granted_tokens,
           g.toks > cap.cap_tokens AS capped,
           CAST(cap.cap_tokens AS BIGINT) AS cap_tokens,
           kept.kept_total AS kept_total_tokens,
           CAST(round(g.toks * 100.0 / tot.total, 6) AS DOUBLE)
               AS share_before_pct,
           CAST(round(g.granted * 100.0 / NULLIF(kept.kept_total, 0), 6)
               AS DOUBLE) AS share_after_pct
    FROM g CROSS JOIN cap CROSS JOIN kept CROSS JOIN tot
    """,
)
def mixture_source_share_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share cap (the Gopher-style domain budget, the
    domain-diversity twin of mixture_budget_rates): no source may exceed
    SRC_CAP_PCT percent (currently 5%) of the KEPT tokens — the oracle
    f-string is what freezes the value. That is a fixpoint, not a simple
    clip — g_s = min(t_s, c·K) with K = Σ g_s — solved closed-form: sort
    sources by tokens descending; if the top m are capped, the kept
    total is K(m) = Σ_uncapped t / (1 − m·c), and m is valid iff the
    implied cap separates the sort at position m (smallest valid m wins,
    keeping the most data — a deterministic pick both engines share).
    Validity tests cross-multiply (t·d ≷ c·S_u) so the whole solve is
    exact integer arithmetic; an always-selectable "cap unsatisfiable,
    drop all" fallback row (ordered last, so any separating cut wins)
    keeps the operator total on degenerate corpora — fewer than 1/c
    sources with every one over-cap (e.g. 3 equal whales) has K = 0 as
    its only fixpoint, and the unconditional fallback guarantees a
    non-empty result frame on ANY input.
    Emits per source: supply, grant, capped flag, the realized cap and
    kept totals, and before/after mixture shares.

    On this near-uniform 20-source corpus at c = 1/n the fixpoint trims
    every source to the smallest one's share — the correct (and harsh)
    boundary behavior; real crawls with one dominant domain cap only
    the head and redistribute the rest untouched.

    Scale: one corpus scan reduces to #sources rows (map-side combine);
    the solve is window arithmetic on that metadata-scale frame (the
    global window orders #sources rows — domains, not documents), then
    one broadcast of the scalar cap back onto the per-source grants.
    Integer headroom: products are tokens × 100 — int64-safe to ~9e16
    tokens, two orders past a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    st = tracked_persist(
        docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("toks"),
        )
    )
    tot = st.agg(
        F.sum("toks").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_src"),
        F.min("toks").cast("long").alias("min_toks"),
    )
    w = Window.orderBy(F.col("toks").desc(), "source")
    ranked = st.select(
        "source", "n_docs", "toks",
        F.row_number().over(w).cast("long").alias("r"),
        F.sum("toks").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("pfx"),
        F.lag("toks").over(w).alias("t_last_cap"),
    )
    cand = ranked.crossJoin(F.broadcast(tot)).select(
        (F.col("r") - 1).alias("m"),
        (F.col("total") - (F.col("pfx") - F.col("toks"))).alias("s_u"),
        (F.lit(100) - (F.col("r") - 1) * SRC_CAP_PCT).alias("d"),
        F.col("toks").alias("t_first_unc"),
        "t_last_cap",
    ).unionByName(
        # drop-all fallback: ALWAYS selectable (synthetic d = 1 → cap
        # = 0 since s_u = 0), ordered last so any separating cut wins
        # first. Practical trigger: n·c < 100 with every source
        # over-cap (e.g. 3 equal whales → only fixpoint is K = 0); the
        # unconditional form is defense-in-depth so the operator can
        # never return an empty frame
        tot.select(
            F.col("n_src").alias("m"),
            F.lit(0).cast("long").alias("s_u"),
            F.lit(1).cast("long").alias("d"),
            F.lit(0).cast("long").alias("t_first_unc"),
            F.col("min_toks").alias("t_last_cap"),
        )
    )
    pick = (
        cand.filter(
            (F.col("d") > 0)
            & (F.col("t_first_unc") * F.col("d")
               <= F.lit(SRC_CAP_PCT) * F.col("s_u"))
            & (
                (F.col("m") == 0)
                | (F.col("t_last_cap") * F.col("d")
                   > F.lit(SRC_CAP_PCT) * F.col("s_u"))
            )
        )
        .orderBy("m")
        .limit(1)
    )
    cap = pick.select(
        F.expr(f"({SRC_CAP_PCT} * s_u) div d").cast("long").alias("cap_tokens")
    )
    g = st.crossJoin(F.broadcast(cap)).select(
        "source", "n_docs", "toks",
        F.least(F.col("toks"), F.col("cap_tokens")).alias("granted"),
        "cap_tokens",
    )
    kept = g.agg(F.sum("granted").cast("long").alias("kept_total"))
    return (
        g.crossJoin(F.broadcast(kept))
        .crossJoin(F.broadcast(tot.select("total")))
        .select(
            "source", "n_docs",
            F.col("toks").alias("tokens_available"),
            F.col("granted").cast("long").alias("granted_tokens"),
            (F.col("toks") > F.col("cap_tokens")).alias("capped"),
            F.col("cap_tokens").cast("long").alias("cap_tokens"),
            F.col("kept_total").alias("kept_total_tokens"),
            F.round(F.col("toks") * 100.0 / F.col("total"), 6)
            .cast("double").alias("share_before_pct"),
            F.round(
                F.col("granted") * 100.0 / F.nullif(F.col("kept_total"), F.lit(0)),
                6,
            ).cast("double").alias("share_after_pct"),
        )
    )


IW_CLIP_MILLI = 3000  # importance-weight ceiling (3.0x) in milli-units


@register(
    "mixture_importance_weights",
    category="trainprep",
    oracle=f"""
    WITH lt AS ({_LANG_TOKENS_SQL}),
    tgt(lang, pct) AS (VALUES {_MIX_PCT_VALUES}),
    tot AS (SELECT SUM(toks) AS t FROM lt),
    w AS (
        SELECT lt.lang, lt.n_docs, lt.toks, tgt.pct,
               (tgt.pct * tot.t * 1000) // (100 * lt.toks) AS w_milli,
               LEAST((tgt.pct * tot.t * 1000) // (100 * lt.toks),
                     {IW_CLIP_MILLI}) AS w_clipped
        FROM lt JOIN tgt USING (lang) CROSS JOIN tot
    ),
    ess AS (
        -- sums exact (HUGEINT), the ratio computed in DOUBLE from the
        -- SAME integers on both engines: overflow-proof at any corpus
        -- size, and bit-identical cross-engine because the doubles are
        -- cast from equal exact values.
        SELECT CAST(FLOOR(
                   CAST(SUM(CAST(n_docs AS HUGEINT) * w_clipped) AS DOUBLE)
                   * CAST(SUM(CAST(n_docs AS HUGEINT) * w_clipped) AS DOUBLE)
                   / CAST(SUM(CAST(n_docs AS HUGEINT) * w_clipped * w_clipped) AS DOUBLE)
               ) AS BIGINT) AS ess_docs,
               SUM(n_docs) AS n_total
        FROM w
    )
    SELECT w.lang,
           CAST(w.n_docs AS BIGINT) AS n_docs,
           w.toks AS tokens,
           CAST(w.pct AS INTEGER) AS target_pct,
           CAST(w.w_milli AS BIGINT) AS weight_milli,
           CAST(w.w_clipped AS BIGINT) AS weight_clipped_milli,
           w.w_milli > {IW_CLIP_MILLI} AS clipped,
           CAST(e.ess_docs AS BIGINT) AS ess_docs,
           CAST(round(e.ess_docs * 1.0 / e.n_total, 6) AS DOUBLE) AS ess_fraction
    FROM w CROSS JOIN ess e
    """,
)
def mixture_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighting diagnostics — the alternative to downsampling:
    instead of dropping documents to hit the target mixture, weight each
    language by target-share / corpus-share (clipped at 3.0× to bound
    gradient variance) and report the effective sample size
    ESS = (Σ n·w)² / Σ n·w² — the number that says how much statistical
    power the reweighted corpus actually retains (ess_fraction near 1 =
    cheap fix; low = resample instead). Shares are measured on tokens;
    weights land in exact integer milli-units so clipping, ESS, and both
    engines agree bit-for-bit.

    Scale: one corpus scan reduces to #languages rows; weights and ESS
    are arithmetic on a broadcast frame."""
    lt = _lang_tokens(spark, sf_dir)
    tgt = literal_frame(spark, list(MIX_TARGET_PCT.items()), "lang string, pct int")
    tot = lt.agg(F.sum("toks").alias("t"))
    w = (
        lt.join(F.broadcast(tgt), "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn("w_milli", F.expr("(pct * t * 1000) div (100 * toks)"))
        .withColumn("w_clipped", F.least(F.col("w_milli"), F.lit(IW_CLIP_MILLI)))
    )
    s_exact = F.sum(
        (F.col("n_docs").cast("decimal(38,0)") * F.col("w_clipped"))
    )
    q_exact = F.sum(
        F.col("n_docs").cast("decimal(38,0)")
        * F.col("w_clipped")
        * F.col("w_clipped")
    )
    ess = w.agg(
        F.floor(
            s_exact.cast("double") * s_exact.cast("double") / q_exact.cast("double")
        )
        .cast("long")
        .alias("ess_docs"),
        F.sum("n_docs").alias("n_total"),
    )
    return w.crossJoin(F.broadcast(ess)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("toks").alias("tokens"),
        F.col("pct").cast("int").alias("target_pct"),
        F.col("w_milli").cast("long").alias("weight_milli"),
        F.col("w_clipped").cast("long").alias("weight_clipped_milli"),
        (F.col("w_milli") > IW_CLIP_MILLI).alias("clipped"),
        F.col("ess_docs").cast("long").alias("ess_docs"),
        F.round(F.col("ess_docs") * 1.0 / F.col("n_total"), 6)
        .cast("double")
        .alias("ess_fraction"),
    )
