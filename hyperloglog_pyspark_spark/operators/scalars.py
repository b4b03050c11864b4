"""Scalar function coverage: string / date / math / array / JSON / map
(SURVEY.md §2.2 row "scalar functions"). The reference's only scalar ops
are str() canonicalization + sha1 (HLL/HyperLogLog.py:110-111).

Everything here is a built-in pyspark.sql.functions expression — JVM-side,
inside whole-stage codegen; no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.functions.money import dec_price
from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table


@register(
    "string_funcs",
    category="scalar",
    bench=True,
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 1, 5) AS name_prefix,
           concat_ws('-', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, ' ', '_') AS name_snake,
           reverse(p_brand) AS brand_rev
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/concat_ws/length/regexp_extract/regexp_replace/reverse."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "date_funcs",
    category="scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter/day extraction, date_trunc, last_day, datediff."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "math_funcs",
    category="scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(sqrt(l_quantity), 6) AS DOUBLE) AS qty_sqrt,
           CAST(round(ln(l_extendedprice), 6) AS DOUBLE) AS price_ln,
           CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    WHERE l_linenumber = 1 AND l_returnflag = 'N'
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/ln/abs/ceil/floor/mod/sign (transcendentals rounded to 6dp —
    libm implementations may differ in the last ulp across engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_returnflag") == "N")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).cast("double").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).cast("double").alias("price_ln"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_k_floor"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "array_funcs",
    category="scalar",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3
    FROM documents
    WHERE lang = 'en'
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → size/array_distinct/element_at/array_contains/slice/array_join —
    higher-order array ops, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@register(
    "json_funcs",
    category="scalar",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object) + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k_bucket", F.get_json_object("props", "$.k").cast("int") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec_price("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "map_funcs",
    category="scalar",
    oracle="""
    SELECT k AS prop_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS INTEGER)) AS BIGINT) AS total
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType via from_json, exploded to (key, value) pairs
    and aggregated — MapType + generator coverage."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(F.explode(m).alias("prop_key", "prop_val"))
        .groupBy("prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("prop_val").alias("total"))
    )


@register(
    "explode_positional",
    category="scalar",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(list_slice(string_split(text, ' '), 1, 5)) AS token FROM documents)
    GROUP BY token
    HAVING COUNT(*) >= 10
    """,
)
def explode_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over tokenized documents: token frequency within the
    first five positions, with HAVING."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.posexplode(F.split("text", " ")).alias("pos0", "token"))
        .filter(F.col("pos0") < 5)  # posexplode is 0-based; oracle's WITH ORDINALITY is 1-based
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
    )


_PROFILE_COLS = ["event_id", "user_id", "event_type", "value"]


@register(
    "profile_table",
    category="scalar",
    oracle="""
    SELECT 'event_id' AS col, COUNT(*) AS n, COUNT(*) - COUNT(event_id) AS n_null,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(MIN(event_id) AS VARCHAR) AS min_val, CAST(MAX(event_id) AS VARCHAR) AS max_val
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(MIN(value) AS VARCHAR), CAST(MAX(value) AS VARCHAR)
    FROM events
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (count / nulls / distincts / min / max per column,
    long format) — the data-quality snapshot every ingestion run records.

    Built as ONE wide aggregation then unpivoted — a single scan, not one
    scan per column (df.summary() does the same trick); at 100 TB replace
    exact distincts with approx_count_distinct.

    Float-to-string caveat: value min/max are integer-valued doubles here;
    Spark renders 7.0 and DuckDB 7.0 identically. Arbitrary doubles would
    need explicit format_number discipline.
    """
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = ev.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@register(
    "array_higher_order",
    category="scalar",
    oracle="""
    SELECT vec_id,
           CAST(round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS DOUBLE) AS l2_norm,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS BIGINT) AS n_positive,
           CAST(round(list_max(embedding::DOUBLE[]), 4) AS DOUBLE) AS max_dim,
           len(embedding) > 0 AND list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0.45 AS has_large_dim
    FROM embeddings
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings: transform/aggregate
    (L2 norm), filter (positive-dim count), array_max, exists-style
    predicate — all JVM-side lambda expressions inside codegen, the
    no-UDF way to do vector math."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    sumsq = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sumsq), 4).cast("double").alias("l2_norm"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(F.array_max(e), 4).cast("double").alias("max_dim"),
        ((F.size(e) > 0) & F.exists(e, lambda x: F.abs(x) > 0.45)).alias("has_large_dim"),
    )


@register(
    "null_safe_arithmetic",
    category="scalar",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(round(SUM(CASE WHEN user_id % 5 = 0 THEN NULL
                         ELSE CAST(value AS DECIMAL(12,2)) / (user_id % 5) END), 3) AS DOUBLE)
               AS safe_ratio_sum,
           CAST(SUM(CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_zero,
           CAST(SUM(COALESCE(NULLIF(user_id % 3, 0), -1)) AS BIGINT) AS coalesce_sum
    FROM events GROUP BY event_type
    """,
)
def null_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe expression semantics: try_divide (NULL on /0 instead of
    error or ±Inf), NULLIF/COALESCE — three-valued logic behaving
    identically across engines. Nulls skip aggregation on both; the
    div-by-zero rows are counted separately to prove they were nulled,
    not dropped."""
    ev = load_table(spark, sf_dir, "events")
    denom = F.col("user_id") % 5
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.try_divide(F.col("value").cast("decimal(12,2)"), F.nullif(denom, F.lit(0)))), 3
        )
        .cast("double")
        .alias("safe_ratio_sum"),
        F.sum(F.when(denom == 0, 1).otherwise(0)).alias("n_div_zero"),
        F.sum(F.coalesce(F.nullif(F.col("user_id") % 3, F.lit(0)), F.lit(-1))).alias("coalesce_sum"),
    )


@register(
    "bitwise_funcs",
    category="scalar",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS band,
           CAST(bit_or(user_id)  AS BIGINT) AS bor,
           CAST(bit_xor(user_id) AS BIGINT) AS bxor,
           CAST(SUM(CAST(bit_count(user_id) AS BIGINT)) AS BIGINT) AS popcount_sum,
           CAST(bit_or(user_id << 3) AS BIGINT) AS bor_shifted,
           CAST(bit_xor(xor(user_id, 255)) AS BIGINT) AS bxor_masked
    FROM events
    GROUP BY event_type
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate (BIT_AND/OR/XOR) + scalar (shift, xor, popcount)
    coverage — the building blocks of bitmap-index and feature-flag
    analytics. All JVM-side codegen expressions.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
        F.sum(F.bit_count("user_id").cast("bigint")).alias("popcount_sum"),
        F.bit_or(F.shiftleft("user_id", 3).cast("bigint")).alias("bor_shifted"),
        F.bit_xor(F.col("user_id").bitwiseXOR(F.lit(255))).alias("bxor_masked"),
    )


@register(
    "map_higher_order",
    category="scalar",
    oracle="""
    SELECT user_id, event_type,
           CAST(round(CAST(count(*) AS DOUBLE) / 100.0, 6) AS DOUBLE) AS rate
    FROM events
    GROUP BY user_id, event_type
    HAVING count(*) > 1
    """,
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end-to-end: build a per-user
    event_type→count map with map_from_entries(collect_list(struct)), scale
    every value with transform_values, drop rare entries with map_filter,
    then explode back to rows. The oracle is the equivalent flat GROUP BY —
    proving the map pipeline is lossless.

    Scale: the map per user is bounded by the event-type vocabulary (tiny),
    so state never grows with row count; one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    scaled = mapped.withColumn(
        "m2",
        F.map_filter(
            F.transform_values(F.col("m"), lambda k, v: F.round(v.cast("double") / 100.0, 6)),
            lambda k, v: v > 0.01,
        ),
    )
    return scaled.select("user_id", F.explode("m2").alias("event_type", "rate"))


@register(
    "lateral_topk",
    category="join",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
    """,
)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join: top-3 richest customers per
    nation, written as the SQL-standard lateral form (Spark ≥3.2 supports
    JOIN LATERAL with correlated references and LIMIT).

    Scale: Catalyst decorrelates this into a window-rank + filter plan —
    same shape as window_topk_per_group — so it does NOT execute as a
    per-nation re-scan of customer.
    """
    from hyperloglog_pyspark_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n JOIN LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
    """)


@register(
    "json_variant",
    category="scalar",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 90
    GROUP BY 1
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    VARIANT column, then typed variant_get extraction — the engine-native
    way to query ragged JSON without a fixed schema.

    Scale: VARIANT stores a parsed binary form, so repeated path reads skip
    re-tokenizing the JSON text (vs get_json_object which re-parses per
    call) — at 100 TB parse-once beats parse-per-expression. The predicate
    on the extracted field still prunes before the aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("pv"))
    k = F.expr("variant_get(pv, '$.k', 'bigint')")
    return (
        v.select("event_id", k.alias("k"))
        .filter(F.col("k") >= 90)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_event"))
    )


@register(
    "scalar_serde_roundtrip",
    category="scalar",
    oracle="""
    SELECT c_custkey,
           c_name AS name_json, c_name AS name_csv, c_name AS name_xml,
           c_acctbal AS bal_json
    FROM customer
    """,
)
def scalar_serde_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row serde functions as lossless roundtrips: each customer row goes
    through to_json→from_json, to_csv→from_csv, and (Spark-4 native XML)
    to_xml→from_xml, and the recovered fields are emitted directly — the
    identity oracle hash-checks that every encoder/decoder pair preserves
    strings AND doubles bit-for-bit (Spark prints doubles with
    shortest-roundtrip precision).

    Scale: pure JVM expressions inside one whole-stage-codegen projection
    — the serde cost rides the scan, no shuffle at all.
    """
    cust = load_table(spark, sf_dir, "customer")
    s = F.struct("c_custkey", "c_name", "c_acctbal")
    ddl = "c_custkey bigint, c_name string, c_acctbal double"
    return cust.select(
        "c_custkey",
        F.from_json(F.to_json(s), ddl).getField("c_name").alias("name_json"),
        F.from_csv(F.to_csv(s), ddl).getField("c_name").alias("name_csv"),
        F.from_xml(F.to_xml(s), ddl).getField("c_name").alias("name_xml"),
        F.from_json(F.to_json(s), ddl).getField("c_acctbal").alias("bal_json"),
    )


@register(
    "scalar_try_errors",
    category="scalar",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS json_int_ok,
           CAST(SUM(CASE WHEN TRY_CAST(substr(props, 1, 3) AS INTEGER)
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS corrupt_cast_null,
           CAST(SUM(CASE WHEN value / (FLOOR(value) - FLOOR(value)) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS div_zero_null,
           CAST(SUM(CASE WHEN TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_reparse_ok,
           CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS overflow_null
    FROM events
    """,
)
def scalar_try_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface (Spark's TRY_* family): counts of
    successful vs null-on-failure outcomes for fallible operations — JSON
    field to int cast, deliberately corrupt cast, divide-by-zero, string
    timestamp re-parse, and bigint overflow — over one scan. This is how
    an ANSI-mode pipeline ingests dirty data without task-killing
    exceptions: every failure becomes a countable NULL, and this audit is
    the failure-rate report.

    Cross-engine note: DuckDB's plain ``/`` and TRY_CAST already have
    null-on-failure semantics; bigint overflow (which DuckDB raises on)
    is expressed as the equivalent CASE in the oracle — the Spark side is
    the real ``try_add`` at the int64 boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    max_i64 = 9223372036854775807
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.expr("try_cast(get_json_object(props, '$.k') as int)").isNotNull(), 1
            ).otherwise(0)
        ).alias("json_int_ok"),
        F.sum(
            F.when(F.expr("try_cast(substr(props, 1, 3) as int)").isNull(), 1).otherwise(0)
        ).alias("corrupt_cast_null"),
        F.sum(
            F.when(
                F.expr("try_divide(value, floor(value) - floor(value))").isNull(), 1
            ).otherwise(0)
        ).alias("div_zero_null"),
        F.sum(
            F.when(
                F.expr("try_to_timestamp(cast(ts as string))").isNotNull(), 1
            ).otherwise(0)
        ).alias("ts_reparse_ok"),
        F.sum(
            F.when(F.expr(f"try_add({max_i64}L, event_id % 2)").isNull(), 1).otherwise(0)
        ).alias("overflow_null"),
    )
