"""Vector math over ArrayType embedding columns — higher-order functions
only (zip_with / aggregate), i.e. JVM-side whole-stage codegen; no Python
in the hot path.

Floats are cast to double BEFORE any arithmetic so both engines accumulate
in double precision; cosine outputs are rounded to 4dp wherever they feed
thresholds or rankings, absorbing last-ulp accumulation-order differences
between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product over ``array<long>`` columns — the
    bit-deterministic twin of ``dot`` for milli-unit embeddings (every
    engine sums the same integers; no accumulation-order ulps)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    return F.round(cosine(a, b), digits).cast("double")


# --- SQL-text twins (round-15): building one dot via the Column API costs
# ~20 py4j round-trips (zip_with + aggregate + two lambdas), and a cosine
# three dots — measured as the dominant slice of plan-build time for the
# similarity family (cProfile: 7.4k gateway round-trips per
# ann_rebuild_policy build, dot/cosine_rounded >50% of it). These render
# the IDENTICAL expression as one SQL string parsed JVM-side in a single
# round-trip. Operands are column names / SQL fragments; the generated
# text mirrors the Column form token for token (same lambda shapes, same
# literal types, same fold order), so results are bit-identical.

def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def cosine_rounded_sql(a: str, b: str, digits: int = 4) -> str:
    return (
        f"CAST(round({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * "
        f"sqrt({dot_sql(b, b)})), {digits}) AS DOUBLE)"
    )


def neg_round_dot_sql(a: str, b: str, digits: int = 4) -> str:
    """-round(dot(a, b), digits) — the descending-dot sort key the IVF
    probe/assignment argmins order by."""
    return f"-round({dot_sql(a, b)}, {digits})"
