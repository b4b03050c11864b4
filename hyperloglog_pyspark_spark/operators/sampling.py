"""Deterministic sampling and dataset splitting — the selection operators
a training-data pipeline runs constantly, built on content hashes so they
are reproducible across engines, runs, and cluster sizes (unlike
df.sample(), whose output depends on partitioning).

Scale: both are stateless row-local predicates/projections over a hash of
the primary key — embarrassingly parallel, no shuffle except the final
summary aggregation, and stable under repartitioning (the property that
matters when the same split must be recomputed months later on different
hardware).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.functions.texttools import md5_long, md5_long_sql
from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

SAMPLE_PCT = 5


@register(
    "sample_deterministic",
    category="sampling",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_sampled,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE {md5_long_sql("CAST(event_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
    GROUP BY event_type
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic ~5% sample by hash bucket of the primary key: the same
    rows are selected on any engine, any partitioning, any run — the
    reproducible alternative to TABLESAMPLE/df.sample for pipeline
    debugging and holdout carving."""
    ev = load_table(spark, sf_dir, "events")
    bucket = md5_long(F.col("event_id").cast("string")) % 100
    return (
        ev.filter(bucket < SAMPLE_PCT)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def split_case_sql(doc: str) -> str:
    """The 90/5/5 doc-hash split rule as DuckDB SQL — the canonical
    definition (split_train_val_test's rule). curation.split_leakage_audit
    composes this into its oracle so a future percentage/hash change here
    automatically changes what the audit audits."""
    b = f"{md5_long_sql(f'CAST({doc} AS VARCHAR)')} % 100"
    return f"CASE WHEN {b} < 90 THEN 'train' WHEN {b} < 95 THEN 'val' ELSE 'test' END"


def split_expr(doc: F.Column) -> F.Column:
    """Spark twin of ``split_case_sql`` — one rule, two engines."""
    b = md5_long(doc.cast("string")) % 100
    return F.when(b < 90, "train").when(b < 95, "val").otherwise("test")


@register(
    "split_train_val_test",
    category="sampling",
    oracle=f"""
    SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM (
        SELECT text, {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
        FROM documents
    )
    GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split by doc_id hash bucket, with token
    accounting per split. Hash-bucket assignment keeps every document in
    the same split forever (append-only corpora never leak val→train on
    re-runs). ``split_expr``/``split_case_sql`` below are THE canonical
    split-rule definition — curation's leakage audit imports them, so the
    audited split can never silently drift from the shipped one."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            split_expr(F.col("doc_id")).alias("split"),
            F.size(F.split("text", " ")).alias("toks"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )


@register(
    "sample_stratified",
    category="sampling",
    bench=True,
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language sampling rates (10 %
    for the dominant 'en' stratum, 50 % for the long tail) keyed on a
    deterministic function of the row id — the downsample-the-head /
    upsample-the-tail move every corpus-balancing pipeline needs.

    Scale: a pure filter — no shuffle, no state; reproducible across runs
    and engines because the keep-decision depends only on (doc_id, lang).
    For rate-by-fraction semantics Spark's sampleBy(col, fractions, seed)
    is the built-in, but its Bernoulli draw is seed-dependent, not
    cross-engine checkable — the modulo form is the auditable variant.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return docs.filter(F.pmod("doc_id", F.lit(100)) < rate).select("doc_id", "lang", "source")


SYS_TARGET = 500  # target sample size for the systematic weighted draw
N_MASS_BUCKETS = 32  # prefix-sum fan-out; raise with cluster size at scale


@register(
    "sample_weighted_systematic",
    category="sampling",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi,
               (SELECT SUM(n_chars) FROM documents) // {SYS_TARGET} AS step
        FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM w
    WHERE step > 0 AND cum_hi // step > (cum_hi - n_chars) // step
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional systematic sampling: documents are laid end to
    end on the character-mass axis (deterministic doc_id order) and one is
    taken at every stride of total_mass/target — longer documents are
    proportionally likelier, and the sample is uniform in TOKEN MASS
    rather than document count (the budget-correct way to subsample a
    pretraining corpus). All arithmetic is exact BIGINT (cumulative sums,
    integer division), so the draw is reproducible on any engine — no
    seed, no float, no transcendental.

    Scale: DISTRIBUTED two-pass prefix sum, never a global ordered window.
    Rows map to ``N_MASS_BUCKETS`` contiguous doc_id ranges (bucket id is
    pure arithmetic on doc_id — deterministic, order-preserving, no
    sampling-based range partitioner). Pass 1 computes per-bucket running
    sums (window PARTITIONED by bucket — parallel across buckets); pass 2
    folds the tiny per-bucket totals (≤N_MASS_BUCKETS rows) into prefix
    offsets via a broadcast triangular self-join and broadcasts them back.
    The global cumulative position is then local_cumsum + bucket_offset,
    a map-side add; selection stays a map-side predicate. No Window node
    in the plan has an empty partition spec (locked by
    tests/test_layout.py::test_systematic_sampler_has_no_global_window).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    bucketed = (
        docs.select("doc_id", "source", "n_chars")
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.floor(
                (F.col("doc_id") - F.col("lo")) * N_MASS_BUCKETS
                / (F.col("hi") - F.col("lo") + 1)
            ),
        )
        .drop("lo", "hi")
    )
    wloc = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = tracked_persist(
        bucketed.withColumn("cum_local", F.sum("n_chars").over(wloc))
    )
    ptot = local.groupBy("bucket").agg(F.max("cum_local").alias("ptotal"))
    # Prefix offsets over ≤N_MASS_BUCKETS rows: triangular broadcast
    # self-join (sum of strictly-earlier bucket totals), deliberately not
    # an empty-partition window so NO operator in the plan is a global sort.
    earlier = ptot.select(
        F.col("bucket").alias("e_bucket"), F.col("ptotal").alias("e_total")
    )
    offsets = (
        ptot.join(F.broadcast(earlier), F.col("e_bucket") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("e_total"), F.lit(0)).alias("offset"))
    )
    total = ptot.agg(F.sum("ptotal").alias("total"))
    cum = (
        local.join(F.broadcast(offsets), "bucket")
        .withColumn("cum_hi", F.col("cum_local") + F.col("offset"))
        .crossJoin(F.broadcast(total))
        .withColumn("step", F.expr(f"total div {SYS_TARGET}"))
    )
    return (
        cum.filter(
            (F.col("step") > 0)
            & (
                F.expr("cum_hi div step")
                > F.expr("(cum_hi - n_chars) div step")
            )
        )
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )


STRATUM_K = 40  # exact per-stratum sample size


@register(
    "sample_exact_k_stratified",
    category="sampling",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY {md5_long_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS pick
        FROM documents
    )
    SELECT lang, CAST(pick AS BIGINT) AS pick, doc_id
    FROM ranked WHERE pick <= {STRATUM_K}
    """,
)
def sample_exact_k_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k documents per stratum (language), reproducibly: rank each
    stratum by md5(doc_id) — a deterministic uniform draw, engine- and
    partitioning-independent — and keep the first {STRATUM_K}. The
    "give me exactly 100 per language, the same 100 forever" operator
    that fraction-based sampling (sample_stratified) can't express.

    Scale: strata are FEW and huge (languages over 100 TB), so a single
    window per stratum is a hot-partition trap. This runs the two-phase
    exact top-k instead: phase 1 ranks within (stratum, scan partition)
    — any local keep of its top k is a superset of the stratum's global
    top k, REGARDLESS of how rows land in partitions, so determinism
    survives repartitioning — and filters to ≤k rows per task; phase 2
    ranks the ≤ k·n_partitions survivors per stratum. The global window
    therefore sees k-scale data, never corpus-scale (the same
    local-prune-then-merge shape as TakeOrderedAndProject).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread_scan=True).select(
        "doc_id", "lang", md5_long(F.col("doc_id").cast("string")).alias("h")
    )
    w_local = Window.partitionBy("lang", F.spark_partition_id()).orderBy("h", "doc_id")
    survivors = docs.withColumn("lpick", F.row_number().over(w_local)).filter(
        F.col("lpick") <= STRATUM_K
    )
    w_global = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("pick", F.row_number().over(w_global).cast("long"))
        .filter(F.col("pick") <= STRATUM_K)
        .select("lang", "pick", "doc_id")
    )


ARES_K = 200  # weighted-reservoir sample size
_ARES_P = 1000000007  # fold md5 into (0,1) uniform: (h % P + 1)/(P + 1)


@register(
    "sample_weighted_reservoir",
    category="sampling",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               ROUND(LN(({md5_long_sql("CAST(doc_id AS VARCHAR)")} % {_ARES_P} + 1.0)
                        / {_ARES_P + 1}.0) / n_chars, 9) AS k
        FROM documents
    ),
    pick AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (ORDER BY k DESC, doc_id) AS rn FROM keyed
        ) WHERE rn <= {ARES_K}
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM pick GROUP BY lang
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement by the
    Efraimidis-Spirakis A-RES scheme: every doc draws a deterministic
    md5-uniform u and competes on key = ln(u)/weight (weight = n_chars);
    the k LARGEST keys are the sample — heavier docs win proportionally
    more often, no global pass over cumulative mass needed (the
    complementary design to sample_weighted_systematic's prefix-sum).

    Scale: the key is map-side arithmetic and the selection is a global
    TOP-K (TakeOrderedAndProject — per-partition heaps merged on the
    driver, never a total sort). Keys are rounded to 9dp before ranking
    with a doc_id tie-break, so the cross-engine cut is deterministic.
    The md5-uniform makes the draw reproducible run-to-run and
    engine-to-engine — the property every training-data subsample audit
    needs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    u = (md5_long(F.col("doc_id").cast("string")) % _ARES_P + 1.0) / float(_ARES_P + 1)
    keyed = docs.select(
        "doc_id", "lang", "n_chars", F.round(F.log(u) / F.col("n_chars"), 9).alias("k")
    )
    pick = keyed.orderBy(F.col("k").desc(), "doc_id").limit(ARES_K)
    return pick.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


# Poisson(1) inverse-CDF thresholds at 2^60 scale (cumulative P(X <= k)
# for k = 0..7, precomputed once, inlined into BOTH engines): a 60-bit
# md5-uniform draw u maps to weight w = #{k: u >= ths[k]} — the online
# bootstrap's per-row replicate multiplicity, fully deterministic.
BOOT_THS = (
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776,
)
BOOT_B = 32  # bootstrap replicates
BOOT_CI = (0.025, 0.975)


def _boot_w_sql(u: str) -> str:
    return "(" + " + ".join(
        f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in BOOT_THS
    ) + ")"


@register(
    "sample_bootstrap_ci",
    category="sampling",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        FROM events
    ),
    reps AS (
        SELECT event_type, b, c,
               {_boot_w_sql(f"CAST('0x' || substring(md5(event_id || ':' || b), 1, 15) AS BIGINT)")} AS w
        FROM obs CROSS JOIN (SELECT unnest(range(0, {BOOT_B})) AS b)
    ),
    rep_means AS (
        SELECT event_type, b, SUM(CAST(w AS HUGEINT) * c) * 1.0 / (SUM(w) * 100) AS m
        FROM reps GROUP BY event_type, b
    ),
    orig AS (
        SELECT event_type, SUM(c) * 1.0 / (COUNT(*) * 100) AS mean_orig
        FROM obs GROUP BY event_type
    )
    SELECT r.event_type,
           ROUND(MIN(o.mean_orig), 4) AS mean_value,
           ROUND(quantile_cont(r.m, {BOOT_CI[0]}), 4) AS ci_lo,
           ROUND(quantile_cont(r.m, {BOOT_CI[1]}), 4) AS ci_hi
    FROM rep_means r JOIN orig o USING (event_type)
    GROUP BY r.event_type
    """,
)
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for each metric's mean: every
    row gets a Poisson(1) multiplicity per replicate (the online/streaming
    bootstrap — no resampling pass over the data), replicate means form
    the sampling distribution, and the 2.5/97.5 interpolated percentiles
    are the 95% CI. Error bars for dashboards at 100 TB, where classic
    resample-with-replacement is impossible.

    Determinism: the Poisson draw is a 60-bit md5-uniform per (row,
    replicate) compared against precomputed INTEGER inverse-CDF
    thresholds — both engines produce identical multiplicities, weighted
    sums stay exact BIGINT, and only the final means/percentiles are
    (identically rounded) doubles.

    Scale: the replicate explosion is map-side (B× rows into the same
    single aggregation — partial-aggregated before the shuffle, so the
    exchange carries #groups × B rows, not B× the data); the percentile
    runs over B values per group. The ORIGINAL mean rides the same pass
    as an identity replicate (b = −1, weight 1) — exactly the
    all-weights-one bootstrap draw — so the fact table is scanned once,
    not once more for a separate baseline aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    reps = obs.select(
        "event_type",
        "c",
        F.explode(F.sequence(F.lit(-1), F.lit(BOOT_B - 1))).alias("b"),
        F.col("event_id"),
    ).select(
        "event_type",
        "b",
        "c",
        F.when(F.col("b") == -1, F.lit(1).cast("long"))
        .otherwise(
            F.expr(
                _boot_w_sql(
                    "cast(conv(substring(md5(concat(event_id, ':', b)), 1, 15), 16, 10) as bigint)"
                )
            )
        )
        .alias("w"),
    )
    rep_means = reps.groupBy("event_type", "b").agg(
        # widen before multiplying (r14 sweep): w*c in long wraps above
        # ~4e10-per-row corpora while the oracle's HUGEINT stays exact;
        # the decimal sum casts to double exactly in-domain (< 2^53)
        (
            F.sum(F.col("w").cast("decimal(38,0)") * F.col("c")).cast("double")
            / (F.sum("w") * 100)
        ).alias("m")
    )
    pct = F.expr(
        f"percentile(case when b >= 0 then m end, array({BOOT_CI[0]}, {BOOT_CI[1]}))"
    )
    return rep_means.groupBy("event_type").agg(
        F.round(F.max(F.when(F.col("b") == -1, F.col("m"))), 4).alias("mean_value"),
        F.round(pct[0], 4).alias("ci_lo"),
        F.round(pct[1], 4).alias("ci_hi"),
    )


NEYMAN_BUDGET = 1000  # total sample size to allocate across strata


@register(
    "sample_neyman_allocation",
    category="sampling",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS nh,
               SUM(CAST(ROUND(value * 100, 0) AS HUGEINT)) AS s1,
               SUM(CAST(ROUND(value * 100, 0) AS HUGEINT)
                   * CAST(ROUND(value * 100, 0) AS BIGINT)) AS s2
        FROM events GROUP BY event_type
    ),
    sized AS (
        SELECT event_type, nh,
               sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / nh) / (nh - 1)) / 100 AS sigma_h,
               nh * (sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / nh) / (nh - 1)) / 100) AS weight
        FROM stats
    )
    SELECT event_type,
           CAST(nh AS BIGINT) AS n_stratum,
           ROUND(sigma_h, 6) AS sigma_h,
           CAST(FLOOR({NEYMAN_BUDGET} * weight / (SELECT SUM(weight) FROM sized) + 0.5)
                AS BIGINT) AS n_alloc,
           ROUND({NEYMAN_BUDGET} * weight / (SELECT SUM(weight) FROM sized) / nh, 6)
               AS sampling_rate
    FROM sized
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample design: each stratum's share of
    the total budget is proportional to N_h·σ_h (bigger and more
    variable strata get more samples — the allocation that minimizes the
    estimator's variance at fixed budget), computed from EXACT integer
    cent moments so σ_h derives from two exact decimal(38,0)/HUGEINT
    integers per stratum (int64 Σc² would overflow at ~1e9 rows). The
    output is the allocation table (stratum size, σ, allocated n,
    per-stratum rate) that a deterministic-rate sampler
    (``sample_stratified``) then executes.

    One moment-aggregation scan + arithmetic on #strata rows; the
    weight total is a window sum over the same #strata rows (a separate
    totals agg + broadcast-back re-embedded the fact scan twice).
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("c")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        # decimal moments: int64 Σc² dies at ~1e9 rows per stratum
        # (r13 moment-sizing sweep); the cents product itself is safe
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        # widen before multiplying: long*long wraps above ~3.0e9 cents
        # where the oracle's HUGEINT square stays exact
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    sigma = (
        F.sqrt(
            (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("nh"))
            / (F.col("nh") - 1)
        )
        / 100
    )
    sized = stats.select(
        "event_type", "nh", sigma.alias("sigma_h"), (F.col("nh") * sigma).alias("weight")
    )
    from pyspark.sql import Window

    wtot = F.sum("weight").over(Window.partitionBy())  # #strata rows
    return (
        sized.withColumn("wtot", wtot)
        .select(
            "event_type",
            F.col("nh").alias("n_stratum"),
            F.round("sigma_h", 6).alias("sigma_h"),
            F.floor(NEYMAN_BUDGET * F.col("weight") / F.col("wtot") + F.lit(0.5))
            .cast("long")
            .alias("n_alloc"),
            F.round(NEYMAN_BUDGET * F.col("weight") / F.col("wtot") / F.col("nh"), 6)
            .alias("sampling_rate"),
        )
    )


SAFE_SPLIT_TRAIN_PCT = 8  # md5(cluster) % 10 < 8 -> train, else test


@register(
    "split_cluster_safe",
    category="sampling",
    bench=False,  # embeds the quadratic minhash pair oracle (banded at sf0.1)
    oracle=None,  # composed below from the minhash + CC oracle CTEs
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-PROOF train/test split: the unit of assignment is the
    near-duplicate CLUSTER, not the document — every LSH connected
    component lands wholly on one side (side = md5 of the cluster label,
    so the split is reproducible and grows stably as the corpus grows),
    singleton docs are their own cluster. split_leakage_audit MEASURES
    the near-dup leakage a naive doc-hash split causes; this op is the
    constructive fix, and it emits the measured cross-split near-dup
    pair count (zero BY CONSTRUCTION — a nonzero value means the
    cluster assignment itself broke, which the oracle would catch as a
    hash mismatch).

    Scale: clustering reuses the LSH candidate pipeline (bucketed,
    never all-pairs) and the O(log² n) star CC; assignment is one hash
    on the cluster label and one broadcast-scalar join for the audit
    count — no new corpus-scale shuffles beyond what dedup already
    pays, which is the point: the split is a free by-product of the
    dedup pipeline every corpus runs anyway."""
    from hyperloglog_pyspark_spark.operators.dedup import (
        connected_components,
        dedup_minhash_lsh,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = tracked_persist(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    )
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).select(F.col("node").alias("doc_id"), "component")
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    side = F.when(
        F.pmod(
            md5_long(F.concat(F.lit("split:"), cluster.cast("string"))),
            F.lit(10),
        )
        < SAFE_SPLIT_TRAIN_PCT,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    sided = tracked_persist(
        docs.join(comp, "doc_id", "left").select(
            "doc_id",
            "n_chars",
            cluster.alias("cluster_id"),
            side.alias("split"),
        )
    )
    cross = (
        pairs.join(
            sided.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            sided.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("cross_split_pairs"))
    )
    return (
        sided.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
            F.sum("n_chars").cast("long").alias("n_chars_total"),
        )
        .crossJoin(F.broadcast(cross))
    )


def _install_split_cluster_safe_oracle() -> None:
    from hyperloglog_pyspark_spark.registry import REGISTRY

    from hyperloglog_pyspark_spark.operators.dedup import _cc_oracle_ctes

    REGISTRY["split_cluster_safe"].oracle = """
    WITH RECURSIVE pairs AS ({minhash}),
    {cc},
    assign AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    sided AS (
        SELECT doc_id, n_chars, cluster_id,
               CASE WHEN ({md5}) %% 10 < {train_pct}
                    THEN 'train' ELSE 'test' END AS split
        FROM assign
    ),
    cross_cnt AS (
        SELECT COUNT(*) AS x FROM pairs p
        JOIN sided a ON a.doc_id = p.doc_a
        JOIN sided b ON b.doc_id = p.doc_b
        WHERE a.split <> b.split
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           CAST((SELECT x FROM cross_cnt) AS BIGINT) AS cross_split_pairs
    FROM sided GROUP BY split
    """.replace("%%", "%").format(
        minhash=REGISTRY["dedup_minhash_lsh"].oracle,
        cc=_cc_oracle_ctes(),
        md5=md5_long_sql("'split:' || CAST(cluster_id AS VARCHAR)"),
        train_pct=SAFE_SPLIT_TRAIN_PCT,
    )


_install_split_cluster_safe_oracle()
