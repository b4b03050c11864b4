"""Shared text expressions: tokenization, shingling, deterministic hashing.

All JVM-side column expressions (no Python UDFs): tokenize with split,
shingle with sequence+transform+slice (higher-order functions), hash with
md5. md5 is the cross-engine determinism anchor — Spark and DuckDB produce
identical hex, so MinHash/SimHash signatures built from md5 hash-match the
DuckDB oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_shingles(col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles: positions 1..len-n+1, each joined by
    a single space. Requires len >= n (filter upstream)."""
    t = tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


def shingles_sql(n: int = 3, text: str = "text") -> str:
    """DuckDB expression equivalent to word_shingles (list_slice bounds are
    inclusive, hence i .. i+n-1)."""
    words = f"string_split({text}, ' ')"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({words})-{n - 1},0)+1), "
        f"i -> array_to_string(list_slice({words}, i, i+{n - 1}), ' ')))"
    )


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared with DuckDB oracles:
    first 15 hex chars of md5 (fits a signed BIGINT).
    DuckDB equivalent: CAST('0x' || substring(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def normalized_text(col: str | Column = "text") -> Column:
    """Canonical form for fingerprinting: lowercase, punctuation stripped,
    whitespace collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""), r" +", " "))


NORMALIZED_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


def run_boundaries(col: str) -> Column:
    """Boundary indexes of the equal-element runs of a SORTED array
    column (by NAME — this is an F.expr SQL string, the cheap-to-build
    form; see dedup's py4j note), with the array size appended as the
    terminating boundary: run k spans [b[k], b[k+1]) and its length is
    b[k+1] − b[k]. Shared by the map-side term-frequency pass
    (textops._tf_table) and the repetition signals (text_repetition) —
    one copy of the boundary arithmetic. CAUTION: the i−1 probe is safe
    at i = 0 ONLY because the disjunction short-circuits (the left
    disjunct accepts the row first); try_element_at itself RAISES
    INVALID_INDEX_OF_ZERO at index 0 — never reorder the disjuncts."""
    return F.expr(
        f"concat(filter(sequence(0, size({col}) - 1),"
        f"              i -> i = 0 OR {col}[i] != try_element_at({col}, i)),"
        f"       array(size({col})))"
    )


def adjacent_pairs(col: str, combine: str) -> Column:
    """One element per ADJACENT pair of the array column (by name):
    zip_with of the array against its shift-by-one self, combined by the
    SQL lambda body ``combine`` over (x, y). Entirely map-side — the
    explode+self-join form shuffles one row per token. Shared by
    text_repetition (bigram strings) and text_pmi_collocations
    (bigram structs)."""
    return F.expr(
        f"zip_with(slice({col}, 1, size({col}) - 1),"
        f"         slice({col}, 2, size({col}) - 1),"
        f"         (x, y) -> {combine})"
    )
